from powertrainstreaming_spark.sources.loaders import (  # noqa: F401
    TABLE_DDL,
    TABLES,
    load,
    load_all,
)
