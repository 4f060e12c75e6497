from powertrainstreaming_spark.plans.registry import (  # noqa: F401
    QueryDef,
    all_oracles,
    all_queries,
    get_query,
    query,
)
