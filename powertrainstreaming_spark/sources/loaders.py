"""Schema-asserted batch loaders for the fixture tables.

Schemas are *declared*, never inferred (FIXTURES.md "Spark DDL"
section): inference can drift from the DuckDB oracle's view of the
same parquet, and the reference's data model is declared schemas too
(typed telemetry records — SURVEY.md §1.1).

100 TB note: loaders return plain `spark.read.parquet` scans so
Catalyst keeps predicate pushdown / column pruning / partition pruning;
nothing is cached or collected here. At cluster scale the same loaders
point at partitioned table roots instead of single files.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.session import ensure_session_confs

# Explicit read schemas (FIXTURES.md "Spark DDL").  events.ts has shipped
# in two parquet encodings across fixture generations: TIMESTAMP(NANOS)
# (round 1) and TIMESTAMP(MICROS) (round 2+).  ``events_ddl`` /
# ``shim_events_ts`` below probe the parquet footer and adapt, so the
# engine reads both without code changes (SURVEY.md §7.5 gotcha #1).
TABLE_DDL: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP"
    ),
    "events": (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}

TABLES = tuple(TABLE_DDL)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@functools.lru_cache(maxsize=256)
def events_ts_is_nanos(path: str) -> bool:
    """True when the events parquet at ``path`` stores ``ts`` as
    TIMESTAMP(NANOS).  ``path`` may be the parquet file itself or a
    directory of staged copies (streaming scratch dirs); only footers
    are read, and the result is cached — fixtures are immutable
    in-session.  A directory mixing nanos and micros files is an error:
    one shim cannot be correct for both halves, so refuse loudly rather
    than silently corrupting half the rows.
    """
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        candidates = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not candidates:
            raise FileNotFoundError(f"no parquet files under {path!r}")
    else:
        candidates = [path]
    verdicts = {
        f: str(pq.read_schema(f).field("ts").type).startswith("timestamp[ns")
        for f in candidates
    }
    if len(set(verdicts.values())) > 1:
        raise ValueError(
            f"mixed ts encodings under {path!r}: {verdicts} — stage dirs "
            "must be encoding-homogeneous"
        )
    return next(iter(verdicts.values()))


def events_ddl(path: str) -> str:
    """Read schema for the events table at ``path``: nanos-encoded files
    surface ``ts`` as BIGINT (via spark.sql.legacy.parquet.nanosAsLong)
    for the explicit div-1000 shim; micros-encoded files read natively.
    """
    ts_type = "BIGINT" if events_ts_is_nanos(path) else "TIMESTAMP"
    return (
        f"event_id BIGINT, ts {ts_type}, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )


def shim_events_ts(df: DataFrame, path: str) -> DataFrame:
    """Normalize ``ts`` to a microsecond TIMESTAMP.

    Nanos files: int64 nanos → truncating integer `div 1000` →
    timestamp_micros.  Truncation (not rounding) matches DuckDB's ns→µs
    read path; nanos fixtures carry sub-µs remainders up to 999 ns, so
    rounding would diverge (SURVEY §7.5 #1).  Micros files are already
    microsecond timestamps — no-op.
    """
    if events_ts_is_nanos(path):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its asserted schema."""
    if name not in TABLE_DDL:
        raise KeyError(f"unknown table {name!r}; know {sorted(TABLE_DDL)}")
    ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    if name == "events":
        df = spark.read.schema(events_ddl(path)).parquet(path)
        return shim_events_ts(df, path)
    return spark.read.schema(TABLE_DDL[name]).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
