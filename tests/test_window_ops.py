"""Multi-block brute-force parity for the sorted/boundary-heal window
operators (events_latest, events_rank, events_user_counts).

sf0.001's events table can land in ONE Ray block, which never exercises the
block-edge heal; here a synthetic events table is written as 16 parquet
files (>=16 blocks) with few users and interleaved timestamps, so after the
range sort nearly every block edge splits a user."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def many_block_events(tmp_path_factory):
    d = tmp_path_factory.mktemp("winops")
    rng = np.random.default_rng(11)
    n, files = 48_000, 16
    user = rng.integers(0, 7, size=n)          # few users => every edge splits
    ts = rng.integers(0, 500_000, size=n)      # many ties at us resolution
    eid = rng.permutation(n)
    df = pd.DataFrame(
        {
            "event_id": eid.astype(np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": user.astype(np.int64),
            "event_type": np.array(["a", "b", "c"], dtype=object)[
                rng.integers(0, 3, size=n)
            ],
            "value": rng.random(n),
            "props": np.array([""] * n, dtype=object),
        }
    )
    for i, part in enumerate(np.array_split(df, files)):
        t = pa.Table.from_pandas(part, preserve_index=False)
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         t.column("ts").cast(pa.timestamp("us")))
        pq.write_table(t, d / f"part{i}.parquet")
    # the queries read "{sf_dir}/events.parquet": point a dir symlink at it
    sf = tmp_path_factory.mktemp("winops_sf")
    import os
    os.symlink(d, sf / "events.parquet")
    return str(sf), df


def test_events_latest_multiblock(ray_session, many_block_events):
    from dedup_ray.pipelines.queries import q_events_latest

    sf, df = many_block_events
    got = (
        q_events_latest(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id", as_index=False)
        .last()
        .rename(columns={"ts": "last_ts", "event_id": "last_event_id"})
        [["user_id", "last_ts", "last_event_id"]]
    )
    got = got[["user_id", "last_ts", "last_event_id"]].astype(
        {"last_ts": "datetime64[ns]"}
    )
    want = want.astype({"last_ts": "datetime64[ns]"}).reset_index(drop=True)
    assert got.equals(want)


def test_events_rank_multiblock(ray_session, many_block_events):
    from dedup_ray.pipelines.queries import q_events_rank

    sf, df = many_block_events
    got = (
        q_events_rank(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    w = df.sort_values(["user_id", "ts", "event_id"]).copy()
    w["rnk"] = w.groupby("user_id").cumcount() + 1
    want = (
        w[["event_id", "user_id", "rnk"]]
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype({"rnk": "int64"})
    )
    assert got.equals(want)


def test_events_user_counts_multiblock(ray_session, many_block_events):
    from dedup_ray.pipelines.queries import q_events_user_counts

    sf, df = many_block_events
    got = (
        q_events_user_counts(sf)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("event_type", as_index=False)
        .agg(n_users=("user_id", "nunique"), n_events=("event_id", "size"))
        .astype({"n_users": "int64", "n_events": "int64"})
    )
    assert got.equals(want)
