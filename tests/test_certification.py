"""Guards the committed full-registry certification artifact
(CORRECTNESS_SELF_r5.json, produced by scripts/certify.py at sf0.01): it must
cover every registry query, record zero failures, and stay in sync with the
live registry so a new query can't ship uncertified."""

import json
import os

import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "..",
                        "CORRECTNESS_SELF_r5.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ARTIFACT):
        pytest.fail(
            "CORRECTNESS_SELF_r5.json missing — run "
            "`python scripts/certify.py` and commit the output"
        )
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_covers_full_registry(artifact):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __ray_entry__ as e

    qs = set(e.queries())
    rows = set(artifact) - {"_meta"}
    assert qs == rows, (
        f"registry/artifact drift: only-in-registry={sorted(qs - rows)} "
        f"only-in-artifact={sorted(rows - qs)}"
    )


def test_artifact_zero_failures(artifact):
    meta = artifact["_meta"]
    assert meta["n_fail"] == 0
    failures = {
        k: v for k, v in artifact.items()
        if k != "_meta"
        and (v["hash_match"] is False
             or v["err"] not in (None, "no_oracle"))
    }
    assert not failures, failures


def test_artifact_oracle_coverage_matches(artifact):
    """Every oracle-faced query has a hash-green row; every no-oracle query
    is explicitly marked so (and really has no SQL face)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __ray_entry__ as e

    oracles = set(e.oracle_sql())
    for name, row in artifact.items():
        if name == "_meta":
            continue
        if name in oracles:
            assert row["hash_match"] is True, (name, row)
        else:
            assert row["err"] == "no_oracle", (name, row)
            assert row["spark_rows"] is not None and row["spark_rows"] >= 0
