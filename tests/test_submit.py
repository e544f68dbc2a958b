"""Execute the north-star deployment path for real: build the
``--py-files`` archive with cqf_spark.package and run an actual
``spark-submit --py-files cqf_spark.zip job.py`` as a subprocess, with
the repo deliberately OFF the job's import path — the driver and
executors must import the package from the shipped zip alone.

This is the literal submission mechanism the north rule names
("submitted with spark-submit --py-files"); the packaging unit test
(test_round4.py) proves the zip is reproducible and importable, this one
proves the end-to-end submit works.
"""

import os
import shutil
import subprocess
import sys

from cqf_spark.package import build_archive

_JOB = """
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = SparkSession.builder.getOrCreate()

# cqf_spark must resolve from the --py-files zip (cwd is an empty dir)
import cqf_spark
from cqf_spark.aggregator import cqf_aggregate
from cqf_spark.config import CqfConfig

assert "cqf_spark.zip" in cqf_spark.__file__, cqf_spark.__file__

docs = spark.read.parquet(sys.argv[1] + "/documents.parquet")
toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
sketch = cqf_aggregate(toks, "tok", CqfConfig(key_bits=48, seed=11))
n = toks.count()
# the CQF counts exactly within the FP bound: total mass == insertions
assert sketch.sum_of_counts == n, (sketch.sum_of_counts, n)
assert 0 < sketch.num_distinct <= n
print("PYFILES_OK", n, sketch.num_distinct)
spark.stop()
"""


def test_spark_submit_py_files_end_to_end(tmp_path, sf_dir):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    zip_path = str(tmp_path / "cqf_spark.zip")
    build_archive(zip_path)
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    env = dict(os.environ)
    # make sure the repo itself is NOT importable inside the job
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(job),
            sf_dir,
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PYFILES_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
