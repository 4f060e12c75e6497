from powertrainstreaming_spark.streaming.harness import (  # noqa: F401
    events_stream,
    run_bounded,
)
