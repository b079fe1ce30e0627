"""UDF / UDAF / UDTF surface (SURVEY §2.11).

These queries deliberately cross the Python↔JVM boundary — they exist
to prove the extension surface, not for the hot path. The ladder:
Arrow-batched pandas_udf ≫ arrow-optimized scalar udf ≫ pickled
row-at-a-time udf. At 100 TB only the pandas variants are acceptable,
and only where no built-in expression composition works.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) / 100
               AS charged
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-scalar Python UDF (arrow-optimized) computing the charge
    expr, truncated to cents by FLOOR-SCALING rather than round(x, 2):
    the raw double product lands exactly on a half-cent boundary for
    some sf0.1 rows, where Spark's HALF_UP and DuckDB's rint disagree
    systematically (the SURVEY §7.4 tie class) — floor of the identical
    product has no tie."""

    @F.udf(returnType=DoubleType(), useArrow=True)
    def charge(price: float, disc: float, tax: float) -> float:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(charge("l_extendedprice", "l_discount", "l_tax") * 100) / 100
        ).alias("charged"),
    )


@query(
    "q_udf_pandas",
    oracle="""
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas_udf: cosine similarity of every vector vs vec 0.

    Arrow-batched; numpy does the 64-dim dot products per batch. The
    probe vector ships with the serialized UDF (a scalar broadcast).
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    probe_arr = np.asarray(probe, dtype=np.float64)
    probe_norm = float(np.sqrt((probe_arr * probe_arr).sum()))

    @F.pandas_udf(DoubleType())
    def cos_sim(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        dots = mat @ probe_arr
        norms = np.sqrt((mat * mat).sum(axis=1))
        return pd.Series(dots / (norms * probe_norm))

    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos_sim("embedding"), 4).alias("cos_sim"))
    )


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_quantity))), 4) AS geo_mean_qty
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf: geometric mean of quantity per return flag."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return li.groupBy("l_returnflag").agg(
        F.round(geo_mean("l_quantity"), 4).alias("geo_mean_qty")
    )


@query(
    "q_udtf",
    oracle="""
    SELECT d.doc_id, t.token
    FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    WHERE d.doc_id < 10
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 @udtf): tokenize a document into rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=StructType([StructField("token", StringType())]))
    class Tokenize:
        def eval(self, text: str):
            if text:
                for tok in text.split(" "):
                    yield (tok,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.token
        FROM documents d,
             LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 10
        """
    )



@query(
    "q_udf_cogroup",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id AS c_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, event_id AS p_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT c.user_id, c.c_id, p.p_id,
               row_number() OVER (
                   PARTITION BY c.c_id
                   ORDER BY p.p_ts DESC, p.p_id DESC) AS rn
        FROM clicks c
        JOIN purchases p
          ON p.user_id = c.user_id AND p.p_ts <= c.c_ts
    )
    SELECT c.user_id, c.c_id,
           m.p_id AS last_purchase_id
    FROM clicks c
    LEFT JOIN matched m ON m.c_id = c.c_id AND m.rn = 1
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-pandas surface (``groupBy().cogroup().applyInPandas``):
    per-user as-of alignment of two event streams in one Python
    callback — each click matched to the user's latest purchase at or
    before it, via numpy searchsorted over the sorted purchase side.

    The API completes the Python-boundary ladder (scalar UDF → pandas
    UDF → grouped agg → grouped map → UDTF → cogrouped map): cogroup
    ships BOTH sides of a key to one Arrow batch, the shape custom
    cross-stream logic (sessionized attribution, trajectory stitching)
    needs when no built-in join expresses it. The oracle is the plain
    SQL as-of join — the pandas kernel must reproduce relational
    semantics exactly, ties included (latest (ts, event_id) wins;
    clicks with no prior purchase keep NULL). Scale: one shuffle per
    side on user_id, Arrow-batched per key group, state none. The
    dominant cost is the API itself — one Arrow batch pair flushed per
    KEY (~3 ms × 1.5k keys at sf0.1, invariant to partition count and
    to kernel micro-opts) — which is precisely the boundary tax this
    query exists to demonstrate; q_join_asof is the built-in-plan form."""
    import numpy as np

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )

    def asof_match(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # This callback runs once per KEY (≈1.5k calls at sf0.1), so
        # per-call constants dominate the query — everything below is
        # numpy (lexsort, masked IntegerArray) rather than the pandas
        # sort_values/astype forms, which measured ~2x slower per call.
        if left.empty:
            return pd.DataFrame(
                {"user_id": [], "c_id": [], "last_purchase_id": []}
            ).astype({"user_id": "int64", "c_id": "int64", "last_purchase_id": "Int64"})
        c_ts = left["c_ts"].to_numpy()
        n = len(left)
        if right.empty:
            # a key can arrive with clicks but NO purchases — the right
            # cogroup side is then a 0-row frame, and any gather from it
            # (even inside np.where's eagerly-evaluated branch) raises
            matched = np.zeros(n, dtype=np.int64)
            miss = np.ones(n, dtype=bool)
        else:
            # sort purchases by (ts, event_id) so the last index with
            # p_ts <= c_ts is the as-of winner, event_id-tie included
            p_ts = right["p_ts"].to_numpy()
            p_id = right["p_id"].to_numpy()
            order = np.lexsort((p_id, p_ts))
            p_ts, p_id = p_ts[order], p_id[order]
            pos = np.searchsorted(p_ts, c_ts, side="right") - 1
            miss = pos < 0
            matched = p_id[np.clip(pos, 0, None)]
        return pd.DataFrame(
            {
                "user_id": left["user_id"].to_numpy(),
                "c_id": left["c_id"].to_numpy(),
                # nullable Int64 via mask: miss -> <NA> -> SQL NULL (an
                # ANSI-mode double->bigint cast of NaN would hard-error)
                "last_purchase_id": pd.arrays.IntegerArray(matched, miss),
            }
        )

    out_schema = "user_id long, c_id long, last_purchase_id long"
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(asof_match, out_schema)
    )
