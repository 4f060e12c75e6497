"""Collapsed ≡ uncollapsed dedup_near_minhash oracle (round 12, task #1).

Round 12 moved dedup_near_minhash's DuckDB oracle from the per-doc
UNCOLLAPSED replay to a COLLAPSED one (group by exact token-set,
band-join + verify over representatives, expand members at the end) —
the uncollapsed `cand` stage emitted 7.58 M candidate pairs at sf0.1
and was 263.8 s of the sweep's 279.7 s minhash row; the collapsed
oracle measures 12.1 s (13.6× on the same host window).

The sibling directional ops were measured and deliberately NOT
collapsed: dedup_incremental_minhash's new×ref and
corpus_decontam_minhash's train×eval band joins already keep their
candidate streams tiny, and the collapsed replay (which must run the
full group/representative machinery over every doc) LOSES at sf0.1 —
6.3 s vs 3.9 s and 5.4 s vs 1.3 s respectively.

This test preserves the output-invariance proof the uncollapsed
oracle used to embody: both forms are executed INSIDE DUCKDB (no
Spark) at sf0.001 AND sf0.01 and must agree on row count, column set
and canonical hash.  If a future edit to the collapsed CTEs (e.g. the
size-ratio prune) ever drops or duplicates a pair, this catches it —
at ~1 s per SF, not at the uncollapsed oracle's sweep price.
"""

from __future__ import annotations

import pytest

from powertrainstreaming_spark.operators.dedup import (
    _MINHASH_ORACLE,
    _MINHASH_ORACLE_UNCOLLAPSED,
)
from powertrainstreaming_spark.testing import canonical_hash, oracle_connection

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _run(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=["sf0.001", "sf0.01"])
def test_collapsed_minhash_oracle_equals_uncollapsed(sf_dir):
    con = oracle_connection(sf_dir)
    try:
        o_rows, o_cols = _run(con, _MINHASH_ORACLE_UNCOLLAPSED)
        n_rows, n_cols = _run(con, _MINHASH_ORACLE)
    finally:
        con.close()
    assert sorted(o_cols) == sorted(n_cols), "column mismatch"
    assert len(o_rows) == len(n_rows), (
        f"{len(o_rows)} uncollapsed vs {len(n_rows)} collapsed rows"
    )
    assert canonical_hash(o_rows, o_cols) == canonical_hash(n_rows, n_cols), (
        "canonical hash mismatch between oracle forms"
    )
