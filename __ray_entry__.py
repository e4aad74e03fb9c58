"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the dedup_ray library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-dedup pipeline over /root/testdata/sf0.001 documents;
    returns the verified duplicate-pair Dataset (stable schema)."""
    from dedup_ray.pipelines.queries import q_near_dup_pairs

    return q_near_dup_pairs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from dedup_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query (same column
    names/aliases as the Ray results)."""
    from dedup_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
