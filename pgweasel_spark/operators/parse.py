"""Record assembly + grok extraction: webtext pages → parsed event rows.

Stage 1 (record split — R1/R3 in SURVEY.md §2.2, the per-page equivalent
of /root/reference/src/output_results/mod.rs:95-121) has two byte-identical
implementations, locked to each other by test:

- ``split_pages_sql`` (pipeline default): pure JVM ``split`` on a
  zero-width record-start lookahead + ``posexplode`` — whole-stage
  codegen, no Python anywhere.
- ``split_pages``: Arrow-batched ``mapInPandas`` over the pure-Python
  kernel (grammar.split_records) — a single compiled-regex pass per page,
  no per-line Python.

Records never span pages so there is no cross-row state and the stage is
embarrassingly parallel — no shuffle either way.

Stage 2 (extract): all scalar extraction (severity, timestamp, message,
key=values, duration) is pure JVM Column expressions from
``pgweasel_spark.functions.extract`` — whole-stage codegen, no Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgweasel_spark import grammar
from pgweasel_spark.functions import extract as X

#: output schema of the split stage; ``raw`` preserves the record's exact
#: bytes (incl. trailing newline) so downstream extraction is byte-identical
#: to the reference per url.
SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("record_no", T.IntegerType(), False),
        T.StructField("raw", T.StringType(), False),
    ]
)


def _split_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls: list[str] = []
        tss: list = []
        langs: list = []
        nos: list[int] = []
        raws: list[str] = []
        for url, ts, lang, text in zip(
            pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["text"]
        ):
            recs = grammar.split_records(text or "")
            urls.extend([url] * len(recs))
            tss.extend([ts] * len(recs))
            langs.extend([lang] * len(recs))
            nos.extend(range(len(recs)))
            raws.extend(recs)
        yield pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(tss),
                "lang": pd.Series(langs, dtype="object"),
                "record_no": pd.Series(nos, dtype="int32"),
                "raw": pd.Series(raws, dtype="object"),
            }
        )


def split_pages(pages: DataFrame) -> DataFrame:
    """Explode pages into records. Column-prunes the input to the four
    needed columns so the parquet scan never reads ``html``."""
    slim = pages.select("url", "warc_ts", "lang", "text")
    return slim.mapInPandas(_split_batches, schema=SPLIT_SCHEMA)


#: zero-width lookahead at every record-start line. ``(?d)`` (UNIX_LINES)
#: pins Java's ``^``/``.`` to \n-only line semantics, matching the Python
#: kernel's RECORD_START_RE exactly; the positional body mirrors
#: is_record_start (src/output_results/mod.rs:221-230).
_RECORD_SPLIT_PAT = r"(?dm)(?=^.{4}-.{2}-.{2} .{2}:.{2}:.{2}[. ].{3})"


def split_pages_sql(pages: DataFrame) -> DataFrame:
    """JVM-native record splitter — byte-identical to ``split_pages`` (a
    dedicated test asserts equality on every fixture and generated page).

    ``split`` on a lookahead keeps all bytes (records retain their
    trailing newline); a zero-width match at offset 0 produces no leading
    empty element (Java 8+ split semantics), and text before the first
    record-start becomes its own leading record — both exactly the
    kernel's slice arithmetic (grammar.split_records). Unlike the
    mapInPandas path, the corpus never crosses the JVM↔Python Arrow
    boundary, so the split stays inside whole-stage codegen and costs one
    regex pass + explode. Empty/null text yields no records ([]), like
    the kernel."""
    slim = pages.select("url", "warc_ts", "lang", "text")
    recs = F.split(F.col("text"), _RECORD_SPLIT_PAT, -1)
    return slim.where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select(
        "url",
        "warc_ts",
        "lang",
        F.posexplode(recs).alias("record_no", "raw"),
    )


def with_extracted(events: DataFrame) -> DataFrame:
    """Append the implicit-schema columns (SURVEY.md §1.2) as JVM
    expressions. ``format`` mirrors Format::from_file_extension
    (src/format/mod.rs:12-21): a url path ending ``.csv`` (case-insensitive)
    selects the csvlog grammar."""
    raw = F.col("raw")
    fmt = F.when(F.lower(F.col("url")).endswith(".csv"), "csv").otherwise(
        "plain"
    )
    sev = X.severity(raw, F.col("format"))
    return (
        events.withColumn("format", fmt)
        .withColumn("severity", sev)
        .withColumn("severity_num", X.severity_num(F.col("severity")))
        .withColumn("event_ts", X.event_ts(raw))
        .withColumn("message", X.message(raw, F.col("format")))
        .withColumn("sqlstate", X.sqlstate(raw, F.col("format")))
        .withColumn("duration_ms", X.duration_ms(raw))
        .withColumn("host", X.host(raw))
        .withColumn("user", X.user(raw))
        .withColumn("db", X.db(raw))
        .withColumn("appname", X.appname(raw))
    )


def parse_events(pages: DataFrame, splitter: str = "sql") -> DataFrame:
    """webtext pages → fully parsed events (the pipeline spine's map side:
    scan → split → extract, zero shuffles).

    ``splitter='sql'`` (default) keeps the record split inside whole-stage
    codegen — measured ~3.5x faster than the mapInPandas path at local[32]
    because the corpus never crosses the JVM↔Python Arrow boundary.
    ``splitter='pandas'`` selects the vectorized-kernel path; a test pins
    the two byte-identical on every fixture."""
    split = split_pages_sql if splitter == "sql" else split_pages
    return with_extracted(split(pages))


def url_host(url: F.Column) -> F.Column:
    """Host component of the url — partition/salting key
    (north-rule: url-host hash + warc_ts day buckets)."""
    return F.parse_url(url, F.lit("HOST"))
