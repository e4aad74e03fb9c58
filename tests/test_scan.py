"""Distributed ordered prefix-scan (stages/scan.py) parity tests."""

import numpy as np
import pyarrow as pa


def _local_scan(tbl, keys, value_col, desc):
    cols = [
        (-tbl.column(k).to_numpy(zero_copy_only=False).astype(np.float64)
         if d else tbl.column(k).to_numpy(zero_copy_only=False).astype(np.float64))
        for k, d in zip(keys, desc)
    ]
    order = np.lexsort(tuple(reversed(cols)))
    v = tbl.column(value_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
    ids = tbl.column("id").to_numpy(zero_copy_only=False)[order]
    return ids, np.cumsum(v)


def test_prefix_scan_matches_local(ray_session):
    import ray.data as rd

    from dedup_ray.stages.scan import ordered_prefix_scan

    rng = np.random.default_rng(3)
    n = 5000
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            # heavy ties in the primary key to exercise tie routing
            "score": pa.array(rng.integers(0, 40, size=n).astype(np.float64)),
            "v": pa.array(rng.integers(1, 100, size=n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(13)
    scanned, total = ordered_prefix_scan(
        ds, ["score", "id"], "v", descending=[True, False], cum_col="cum"
    )
    assert total == int(tbl.column("v").to_numpy(zero_copy_only=False).sum())
    got = scanned.to_pandas().sort_values("cum").reset_index(drop=True)
    ids, cum = _local_scan(tbl, ["score", "id"], "v", [True, False])
    assert got["id"].to_numpy().tolist() == ids.tolist()
    assert got["cum"].to_numpy().tolist() == cum.tolist()


def test_prefix_scan_empty_and_single(ray_session):
    import ray.data as rd

    from dedup_ray.stages.scan import ordered_prefix_scan

    empty = pa.table(
        {"id": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
    )
    ds, total = ordered_prefix_scan(
        rd.from_arrow(empty), ["id"], "v", cum_col="cum"
    )
    assert total == 0 and ds.count() == 0

    one = pa.table({"id": pa.array([7], type=pa.int64()), "v": pa.array([5], type=pa.int64())})
    ds, total = ordered_prefix_scan(rd.from_arrow(one), ["id"], "v", cum_col="cum")
    assert total == 5
    assert ds.take_all() == [{"id": 7, "v": 5, "cum": 5}]
