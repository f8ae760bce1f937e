"""Broadcast-dimension enrichment (SURVEY.md §2.7, FIXTURES.md §3).

The reference hard-codes its lookups (the severity→ordinal match at
src/severity.rs:161-176 is an inlined dimension table); the north-star
requires them as broadcast lookup tables. All dims are tiny (≤ dozens of
rows) so every join below is an explicit ``F.broadcast`` hash join — no
shuffle of the fact side, safe at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgweasel_spark import grammar
from pgweasel_spark.gen import HOSTS

#: SQLSTATE class prefix → category (public PostgreSQL errcodes appendix)
SQLSTATE_CLASSES = {
    "00": "success",
    "01": "warning",
    "02": "no_data",
    "08": "connection_exception",
    "22": "data_exception",
    "23": "integrity_violation",
    "25": "invalid_transaction_state",
    "28": "invalid_authorization",
    "40": "transaction_rollback",
    "42": "syntax_or_access",
    "53": "insufficient_resources",
    "54": "program_limit_exceeded",
    "55": "object_not_in_prerequisite_state",
    "57": "operator_intervention",
    "58": "system_error",
    "HV": "fdw_error",
    "P0": "plpgsql_error",
    "XX": "internal_error",
}

LANG_FAMILIES = {
    "en": "germanic",
    "de": "germanic",
    "et": "uralic",
    "fr": "romance",
    "es": "romance",
}


def dim_severity(spark: SparkSession) -> DataFrame:
    """12-row severity dim: ordinal from src/severity.rs:161-176 (quirks
    preserved: LOG/INFO→5, DEBUG5/PANIC→0) + our class rollup."""
    rows = [
        (sev, grammar.SEVERITY_NUM[sev], grammar.SEVERITY_CLASS[sev])
        for sev in sorted(grammar.SEVERITY_NUM)
    ]
    return spark.createDataFrame(rows, "severity string, ordinal int, class string")


def dim_sqlstate(spark: SparkSession) -> DataFrame:
    rows = list(SQLSTATE_CLASSES.items())
    return spark.createDataFrame(rows, "state_class string, category string")


def dim_host(spark: SparkSession) -> DataFrame:
    """Generated host universe; the first two hosts carry ~80% of pages
    (gen.HOST_WEIGHTS) and are flagged for salting decisions."""
    rows = [(h, i < 2) for i, h in enumerate(HOSTS)]
    return spark.createDataFrame(rows, "host_name string, is_skewed boolean")


def dim_lang(spark: SparkSession) -> DataFrame:
    rows = list(LANG_FAMILIES.items())
    return spark.createDataFrame(rows, "lang_code string, lang_family string")


def enrich(events: DataFrame) -> DataFrame:
    """Left broadcast joins: severity→class, sqlstate→category, url-host
    dim, lang dim. Adds ``url_host`` (partition/salting key) first."""
    spark = events.sparkSession
    out = events.withColumn("url_host", F.parse_url(F.col("url"), F.lit("HOST")))
    out = out.join(
        F.broadcast(
            dim_severity(spark).select(
                F.col("severity").alias("_sev"), F.col("class").alias("severity_class")
            )
        ),
        on=[out["severity"] == F.col("_sev")],
        how="left",
    ).drop("_sev")
    out = out.withColumn(
        "sqlstate_class", F.substring(F.col("sqlstate"), 1, 2)
    ).join(
        F.broadcast(
            dim_sqlstate(spark).select(
                F.col("state_class").alias("sqlstate_class"),
                F.col("category").alias("sqlstate_category"),
            )
        ),
        on="sqlstate_class",
        how="left",
    ).drop("sqlstate_class")
    out = out.join(
        F.broadcast(dim_host(spark)),
        on=[out["url_host"] == F.col("host_name")],
        how="left",
    ).drop("host_name").withColumnRenamed("is_skewed", "host_is_skewed")
    out = out.join(
        F.broadcast(dim_lang(spark)),
        on=[out["lang"] == F.col("lang_code")],
        how="left",
    ).drop("lang_code")
    return out
