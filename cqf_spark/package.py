"""Build the ``--py-files`` archive for cluster submission.

The north-star deployment path is::

    python -m cqf_spark.package /tmp/cqf_spark.zip
    spark-submit --py-files /tmp/cqf_spark.zip your_job.py

The archive contains only the package sources (no tests, no caches), is
built deterministically (fixed timestamps, sorted member order) so two
builds of the same tree are byte-identical — convenient for content-
addressed artifact stores — and is importable directly from the zip by
executors (pure Python + numpy/pandas, which clusters already ship).
"""

from __future__ import annotations

import os
import sys
import zipfile

# fixed DOS timestamp (2020-01-01) => reproducible archives
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_archive(out_path: str, package_dir: str | None = None) -> str:
    """Zip the ``cqf_spark`` package for ``spark-submit --py-files``."""
    pkg = package_dir or os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg)
    members: list[str] = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                members.append(os.path.join(dirpath, f))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in members:
            arcname = os.path.relpath(path, root)
            with open(path, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main(argv: list[str]) -> int:
    out = argv[1] if len(argv) > 1 else "cqf_spark.zip"
    path = build_archive(out)
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
