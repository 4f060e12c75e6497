"""Operator implementations, one module per SURVEY.md §2 section.

Importing this package registers every declared query in
``plans.registry``.
"""

from powertrainstreaming_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    binary_media,
    corpus,
    dedup,
    filters,
    graph,
    joins,
    maintenance,
    multimodal,
    scalar_fns,
    scans,
    setops,
    similarity,
    sampling,
    sinks,
    streaming,
    text,
    timeseries,
    udfs,
    windows,
)
