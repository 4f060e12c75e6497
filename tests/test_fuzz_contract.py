"""Hypothesis fuzz of the cross-engine determinism contract
(functions/exprs.py).

The oracle suite verifies the contract on FIXTURE values; these tests
verify it on adversarial ones — hypothesis shrinks any divergence to a
minimal counterexample.  Scope matches the contract's stated domain:
poly_hash is defined over ASCII text (fixture corpus is ASCII), and
money arithmetic over 2-decimal money values (what the fixtures carry),
where DECIMAL(18,6) casts are exact on both engines.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from powertrainstreaming_spark.functions import exprs
from pyspark.sql import functions as F

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=80,
)


def _duck():
    con = duckdb.connect()
    return con


@settings(max_examples=12, deadline=None)
@given(st.lists(_ASCII, min_size=1, max_size=40))
def test_poly_hash_cross_engine(spark, strings):
    """Spark's fold-over-codepoints hash equals DuckDB's for arbitrary
    ASCII strings — including '', single chars, and space runs."""
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = [
        r.h
        for r in df.select(exprs.poly_hash("s").alias("h")).collect()
    ]
    con = _duck()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(strings))
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {exprs.o_poly_hash('s')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group key
            st.integers(min_value=-10**7, max_value=10**7),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_money_sum_cross_engine(spark, rows):
    """Decimal-accumulated sums of 2-decimal money values agree exactly
    between engines for any grouping and sign mix (the order-
    insensitivity the contract buys)."""
    data = [(g, cents / 100.0) for g, cents in rows]
    df = spark.createDataFrame(data, "g INT, v DOUBLE")
    got = {
        r.g: r.s
        for r in df.groupBy("g")
        .agg(exprs.money_sum("v").alias("s"))
        .collect()
    }
    con = _duck()
    con.execute("CREATE TABLE t(g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    want = {
        g: s
        for g, s in con.execute(
            "SELECT g, CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)"
            " FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_morton_interleave_cross_engine(spark, pairs):
    """The unrolled Z-order interleave (maintenance._Z_SPARK /
    _Z_DUCK) equals the reference bit-interleave in Python, in Spark,
    and in DuckDB, for arbitrary 8-bit inputs — including 0, 255, and
    single-bit patterns hypothesis converges on."""
    from powertrainstreaming_spark.operators.maintenance import _Z_DUCK, _Z_SPARK

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    expected = [ref(x, y) for x, y in pairs]
    df = spark.createDataFrame(pairs, "xb BIGINT, yb BIGINT")
    got_spark = [r.z for r in df.selectExpr(f"({_Z_SPARK}) AS z").collect()]
    assert got_spark == expected
    con = _duck()
    con.sql("CREATE TABLE t(i BIGINT, xb BIGINT, yb BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, x, y) for i, (x, y) in enumerate(pairs)],
    )
    got_duck = [
        r[0] for r in con.sql(f"SELECT {_Z_DUCK} FROM t ORDER BY i").fetchall()
    ]
    assert got_duck == expected
