"""Local replica of the driver's t2 gate (SURVEY.md §5.4 layer 1).

Every query in the registry is checked against its DuckDB oracle at
sf0.001 AND sf0.01 — row count, sorted column names, order-insensitive
value hash.  A query without an oracle gets a rows-only sanity check.
"""

from __future__ import annotations

import difflib

import pytest

from powertrainstreaming_spark.plans.registry import all_defs
from powertrainstreaming_spark.testing import compare, oracle_connection

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_DEFS = all_defs()


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.001", "sf0.01"])
def oracle(request):
    con = oracle_connection(request.param)
    yield request.param, con
    con.close()


@pytest.mark.parametrize("name", sorted(_DEFS))
def test_query_matches_oracle(spark, oracle, name):
    sf_dir, con = oracle
    qd = _DEFS[name]
    df = qd.fn(spark, sf_dir)
    if qd.oracle is None:
        n = df.count()
        assert n >= 0
        return
    res, s_lines, o_lines = compare(name, df, con, qd.oracle)
    if not res.ok:
        diff = "\n".join(
            list(difflib.unified_diff(o_lines, s_lines, "oracle", "spark", lineterm=""))[:40]
        )
        pytest.fail(
            f"{name} @ {sf_dir}: rows {res.rows_spark} vs {res.rows_oracle}, "
            f"cols {sorted(res.cols_spark)} vs {sorted(res.cols_oracle)}, "
            f"hash {res.hash_spark[:8]} vs {res.hash_oracle[:8]}\n{diff}"
        )
