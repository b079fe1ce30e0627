"""distributed_causal_stream_processing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query / data-processing
capabilities of ``zapletal-martin/distributed-causal-stream-processing``
(a causal, effectively-once stream-processing PoC), re-expressed on the
Spark DataFrame / SQL / Structured Streaming stack, plus the relational
and LLM-data-pipeline operator surface described in SURVEY.md §2.

Note on citations: the reference checkout at /root/reference is empty in
this environment (see SURVEY.md §0), so reference parity is documented
conceptually (per-key causal order, views, effectively-once sinks)
rather than via file:line citations.

Layout
------
- ``session``    SparkSession builder tuned for local[32] testing but
                 configured the way a 1000-executor cluster job would be
                 (AQE, adaptive skew join, explicit shuffle partitions).
- ``io``         fixture loaders + temp-view registration.
- ``plans``      the query registry: every operator from SURVEY.md §2 is
                 a named query with an optional DuckDB oracle SQL.
- ``operators``  relational operators (scans, joins, aggregates, windows,
                 sorts, sets) and LLM-pipeline operators (dedup,
                 similarity, text analysis, multimodal).
- ``functions``  scalar function families + UDF/UDAF/UDTF surface.
- ``streaming``  causal sequencing, event-time windows, dedup,
                 effectively-once sinks — the reference's home turf.
"""

from distributed_causal_stream_processing_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    all_oracle_sql,
    all_queries,
)

__all__ = ["REGISTRY", "all_queries", "all_oracle_sql"]
__version__ = "0.1.0"
