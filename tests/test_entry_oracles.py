"""Mirror of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables; compare
row count + order-insensitive values."""

import os

import duckdb
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _pairs():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    got = fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check (driver's weaker gate)
        return
    want = _duck(sf_dir).execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _normalize(got), _normalize(want.astype(got.dtypes.to_dict()))
    pd.testing.assert_frame_equal(g, w, check_dtype=False), name


def _extra_pairs():
    from cqf_spark.operators.registry import EXTRA_ORACLES, EXTRA_QUERIES

    return [
        (name, EXTRA_QUERIES[name], EXTRA_ORACLES.get(name))
        for name in sorted(EXTRA_QUERIES)
    ]


@pytest.mark.parametrize(
    "name,fn,sql", _extra_pairs(), ids=[p[0] for p in _extra_pairs()]
)
def test_extra_query_matches_oracle(spark, sf_dir, name, fn, sql):
    """EXTRA_QUERIES (beyond the driver gate's 50-row cap) pass the SAME
    mirror check as the registered set."""
    test_query_matches_oracle(spark, sf_dir, name, fn, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["token", "approx_count"]
    assert len(rows) >= 0
