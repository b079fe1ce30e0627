"""Entry-point breadth (SURVEY §3.2): the same engine answers via the
DataFrame API, SQL strings over registered views, and extra source
formats (CSV/JSON with explicit schemas — no inference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_sql_form_matches_dataframe_form(spark):
    """The flagship pricing summary via spark.sql over registered views
    equals the DataFrame-API form row for row."""
    from distributed_causal_stream_processing_spark import all_queries
    from distributed_causal_stream_processing_spark.io import register_views

    register_views(spark, SF_SMOKE)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP'1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = (
        all_queries()["q_agg_group"](spark, SF_SMOKE)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .collect()
    )
    assert len(sql_rows) > 0
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_csv_json_sources_roundtrip(spark, tmp_path):
    """Orders written as CSV and JSON read back (explicit schema, no
    inference) identical to the parquet source — source-format breadth
    without touching query code."""
    from distributed_causal_stream_processing_spark.io import load

    o = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    schema = o.schema
    want = sorted(map(tuple, o.collect()))

    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    o.write.mode("overwrite").option("header", True).csv(csv_dir)
    o.write.mode("overwrite").json(json_dir)

    back_csv = spark.read.schema(schema).option("header", True).csv(csv_dir)
    back_json = spark.read.schema(schema).json(json_dir)
    assert sorted(map(tuple, back_csv.collect())) == want
    assert sorted(map(tuple, back_json.collect())) == want
