from distributed_causal_stream_processing_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    all_oracle_sql,
    all_queries,
    query,
)
