"""Replicates the driver's correctness gate locally: run each queries() entry
at sf0.001 and compare row count + sorted-column value sets against the
oracle SQL via DuckDB."""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_rows(result):
    import pandas as pd
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = result
    df = df[sorted(df.columns)]
    rows = set()
    for tup in df.itertuples(index=False):
        norm = []
        for v in tup:
            if isinstance(v, float):
                norm.append(("f", None if math.isnan(v) else v))
            else:
                norm.append(("v", str(v)))
        rows.add(tuple(norm))
    return set(map(str, rows)), list(df.columns)


def test_all_oracle_queries_match(entry_mod, con):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        got = qs[name](SF_DIR)
        want_df = con.execute(sql).fetchdf()
        got_rows, got_cols = _to_rows(got)
        want_rows, want_cols = _to_rows(want_df)
        if sorted(got_cols) != sorted(want_cols):
            failures.append(f"{name}: columns {got_cols} != {want_cols}")
            continue
        if got_rows != want_rows:
            extra = list(got_rows - want_rows)[:2]
            missing = list(want_rows - got_rows)[:2]
            failures.append(
                f"{name}: {len(got_rows)} vs {len(want_rows)} rows; "
                f"extra={extra} missing={missing}"
            )
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(entry_mod):
    import pyarrow as pa
    from ray.data import Dataset

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        result = qs[name](SF_DIR)
        if isinstance(result, Dataset):
            n = result.count()
            assert result.schema() is not None
        elif isinstance(result, pa.Table):
            n = result.num_rows
        else:
            n = len(result)
        assert n >= 0, name


def test_entry_smoke(entry_mod):
    result = entry_mod.entry()
    from ray.data import Dataset

    assert isinstance(result, Dataset)
    assert result.count() >= 0
    assert result.schema() is not None


def test_df_spectrum_band_pinned(entry_mod):
    """The spectrum-fit band is deterministic (grid LSQ over the sf0.001 DF
    histogram) — pin the exact values so a silent fit regression shows up
    even though the query has no SQL oracle."""
    t = entry_mod.queries()["df_spectrum_band"](SF_DIR)
    assert t.to_pydict() == {"dup_lower": [20], "dup_upper": [106]}
