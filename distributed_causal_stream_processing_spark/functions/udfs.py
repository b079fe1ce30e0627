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
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-scalar Python UDF (arrow-optimized) computing the charge expr."""

    @F.udf(returnType=DoubleType(), useArrow=True)
    def charge(price: float, disc: float, tax: float) -> float:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 2).alias("charged"),
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

