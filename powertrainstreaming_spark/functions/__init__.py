from powertrainstreaming_spark.functions.exprs import (  # noqa: F401
    dot_f,
    money_avg,
    money_sum,
    sim_round,
)
