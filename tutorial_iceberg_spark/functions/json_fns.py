"""JSON / VARIANT functions: SURVEY.md §2.8 F8-F10, §2.2 P5.

The testdata's ``events.props`` is a JSON *string* column (FIXTURES.md), so
the oracle-matchable path is ``get_json_object`` <-> DuckDB
``json_extract_string``. Spark 4's VARIANT path (``parse_json`` +
``variant_get``, README.md:1137-1145) is exercised too — it extracts typed
values, which DuckDB mirrors with a JSON cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_iceberg_spark.io import load_table
from tutorial_iceberg_spark.registry import register


@register(
    "f10_json_value",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str
        FROM events
    """,
    doc="F10 JSON_VALUE-style string extraction — README.md:1148-1152",
    tags=("json",),
)
def f10_json_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: per-row JSON parse straight off a single-split scan
    events = load_table(spark, sf_dir, "events", spread=True)
    return events.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_str")
    )


@register(
    "f8_f9_variant_get",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    doc="F8 PARSE_JSON + F9 variant path access, typed — README.md:1137-1145. "
    "Spark side goes through VariantType (parse_json -> variant_get).",
    tags=("json", "variant"),
)
def f8_f9_variant_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )


@register(
    "p5_json_predicate",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    doc="P5 predicate on JSON-extracted value — README.md:1148-1152",
    tags=("json", "filter"),
)
def p5_json_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .filter(F.col("k") > 50)
        .select("event_id", "event_type", "k")
    )
