"""Golden-snapshot regression gate (SURVEY.md §5.4 layer 2).

Pins every query's sf0.001 result (count + schema + canonical hash)
against the checked-in snapshot.  Catches simultaneous engine+oracle
drift that the DuckDB comparison cannot.  After an INTENTIONAL result
change: `python tests/update_golden.py` and commit the diff.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from powertrainstreaming_spark.plans.registry import all_defs
from powertrainstreaming_spark.testing import canonical_hash

GOLDEN_PATH = Path(__file__).resolve().parent / "golden" / "snapshots.json"
SF = "/root/testdata/sf0.001"

_SNAPS = json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists() else {}
_DEFS = all_defs()


def test_every_query_has_a_snapshot():
    assert set(_SNAPS) == set(_DEFS), (
        "snapshot set out of date — run python tests/update_golden.py"
    )


@pytest.mark.parametrize("name", sorted(_SNAPS))
def test_matches_golden(spark, name):
    df = _DEFS[name].fn(spark, SF)
    rows = [tuple(r) for r in df.collect()]
    snap = _SNAPS[name]
    assert len(rows) == snap["rows"], f"{name}: row count drifted"
    assert sorted(df.columns) == snap["cols"], f"{name}: schema drifted"
    assert canonical_hash(rows, list(df.columns)) == snap["hash"], (
        f"{name}: value hash drifted from golden snapshot"
    )
