"""Resumable sketch builds: per-partition checkpoint + lineage manifest.

The reference persists one filter per file with a magic/version header
(qf_serialize / qf_usefile, src/gqf_file.c:88-168, 264-349); a distributed
build generalizes that to one *directory* of per-partition sketch files
plus a manifest recording lineage — which partition produced which blob,
from how many input rows, with what metadata counters, validated by a
murmur of the blob (the analog of the reference's magic+endianness check,
src/gqf_file.c:157-160).

Layout::

    {dir}/partials/part_id=N/*.parquet   # one sketch row per partition
    {dir}/manifest.json                  # config + per-partition lineage

Resume contract: partitions whose manifest row validates against the
stored blob are **skipped**; only missing/corrupt partitions are rebuilt
(input re-filtered by ``spark_partition_id``).  Determinism caveat: resume
assumes the same input files and session parallelism, so partition ids map
to the same input splits — the manifest records both and refuses to resume
a mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict
from typing import Any

import numpy as np

from .aggregator import build_sketches, tree_merge
from .config import CqfConfig
from .core import Cqf
from .functions.hashing import fingerprint_bytes


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


def _partials_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "partials")


def _blob_hash(blob: bytes) -> int:
    return fingerprint_bytes(blob)


class CheckpointedBuild:
    """Orchestrates a resumable distributed CQF build."""

    def __init__(self, spark: Any, ckpt_dir: str):
        self.spark = spark
        self.ckpt_dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    # -- lineage -----------------------------------------------------------
    def _load_manifest(self) -> dict[str, Any] | None:
        try:
            with open(_manifest_path(self.ckpt_dir)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _write_manifest(self, manifest: dict[str, Any]) -> None:
        tmp = _manifest_path(self.ckpt_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, _manifest_path(self.ckpt_dir))

    def _validated_partials(self, manifest: dict[str, Any]) -> dict[int, bytes]:
        """Read stored partials and keep only the ones whose blob murmur
        matches the manifest lineage row (corrupt/missing ones rebuild)."""
        path = _partials_path(self.ckpt_dir)
        if not os.path.isdir(path):
            return {}
        want = {int(r["part_id"]): r["blob_hash"] for r in manifest["partitions"]}
        rows = self.spark.read.parquet(path).select("part_id", "sketch").collect()
        out: dict[int, bytes] = {}
        for r in rows:
            blob = bytes(r["sketch"])
            if want.get(r["part_id"]) == _blob_hash(blob):
                out[r["part_id"]] = blob
        return out

    def metrics_df(self) -> Any:
        """Per-partition lineage/metrics as a DataFrame (the cluster-scale
        analog of qf_get_num_occupied_slots & friends, src/gqf.c:2134-2186)."""
        manifest = self._load_manifest()
        if manifest is None:
            raise FileNotFoundError("no manifest yet")
        return self.spark.createDataFrame(manifest["partitions"])

    # -- build -------------------------------------------------------------
    def aggregate(
        self,
        df: Any,
        key_col: str,
        config: CqfConfig,
        count_col: str | None = None,
        value_col: str | None = None,
    ) -> Cqf:
        """Build (or resume) the distributed sketch.

        1. If a manifest exists with the same config + input signature,
           validate stored partials and rebuild only missing partitions.
        2. Write new/updated partials + manifest atomically.
        3. Merge all partials (qf_multi_merge semantics) and return.
        """
        sig = {
            "config": asdict(config),
            "key_col": key_col,
            "count_col": count_col,
            "value_col": value_col,
        }
        manifest = self._load_manifest()
        have: dict[int, bytes] = {}
        if manifest is not None and manifest.get("signature") == sig:
            have = self._validated_partials(manifest)

        built = build_sketches(df, key_col, config, count_col=count_col,
                               value_col=value_col)
        rdd = built.rdd
        n_parts = rdd.getNumPartitions()
        if manifest is not None and manifest.get("n_partitions") != n_parts:
            have = {}  # input shape changed: resume unsafe, rebuild all

        partial_rows: list[dict[str, Any]] = [
            r
            for r in (manifest or {}).get("partitions", [])
            if r["part_id"] in have
        ]

        missing = sorted(set(range(n_parts)) - set(have))
        t0 = time.time()
        if missing:
            if len(missing) == n_parts:
                new_rows = built.collect()
            else:
                # genuine per-partition resume: run ONLY the missing
                # partitions (narrow mapInPandas chain -> partition ids map
                # 1:1 to input splits)
                sc = self.spark.sparkContext
                chunks = sc.runJob(rdd, lambda it: list(it), missing)
                new_rows = list(chunks)
            for r in new_rows:
                d = r.asDict()
                d["sketch"] = bytes(d["sketch"])
                partial_rows.append(
                    {k: v for k, v in d.items() if k != "sketch"}
                )
                have[d["part_id"]] = d["sketch"]
            fresh_path = _partials_path(self.ckpt_dir) + ".tmp"
            shutil.rmtree(fresh_path, ignore_errors=True)
            # persist ALL partials (kept + new) in one atomic swap
            all_rows = [
                {"part_id": pid, "sketch": blob} for pid, blob in have.items()
            ]
            self.spark.createDataFrame(
                all_rows, "part_id int, sketch binary"
            ).write.mode("overwrite").parquet(fresh_path)
            final_path = _partials_path(self.ckpt_dir)
            shutil.rmtree(final_path, ignore_errors=True)
            os.replace(fresh_path, final_path)
            self._write_manifest(
                {
                    "signature": sig,
                    "n_partitions": n_parts,
                    "built_rows": sum(r["n_rows"] for r in partial_rows),
                    "resumed_partitions": n_parts - len(missing),
                    "rebuilt_partitions": len(missing),
                    "build_wall_s": time.time() - t0,
                    "partitions": sorted(
                        partial_rows, key=lambda r: r["part_id"]
                    ),
                }
            )

        sketches = [Cqf.from_bytes(have[p]) for p in sorted(have)]
        return Cqf.merge_many(sketches)
