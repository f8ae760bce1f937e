"""End-to-end golden tests: the reference's own CLI test assertions
(BASELINE.md "golden correctness numbers") reproduced through the full
Spark spine: read webtext → split → extract → route → aggregate.

Each fixture file is embedded verbatim as one page of the webtext table
(gen.load_fixture_pages), so filtering events to that page's url is the
exact analog of running the pgweasel CLI on that file.
"""

import pytest
from pyspark.sql import functions as F

from pgweasel_spark.operators import aggregates as agg
from pgweasel_spark.operators import route
from pgweasel_spark.operators.parse import parse_events

FIX = "https://fixtures.pgweasel.example/files/"


@pytest.fixture(scope="module")
def events(spark, webtext_dir):
    pages = spark.read.parquet(webtext_dir)
    ev = route.sink_flags(parse_events(pages))
    ev.cache()
    ev.count()
    yield ev
    ev.unpersist()


def _page(events, name):
    return events.where(F.col("url") == FIX + name)


def test_no_quarantine_on_fixture_corpus(events):
    # every fixture record must parse a timestamp (the reference would
    # abort otherwise); quarantine must be empty for fixture pages
    bad = events.where(
        F.col("url").startswith(FIX) & F.col("is_quarantined")
    ).count()
    assert bad == 0


def test_errors_list_csv(events):
    # tests/errors.rs:9-18 — csvlog1.csv errors list routes the
    # 2025-05-08 12:24:37.731 ERROR record
    rows = (
        _page(events, "csvlog1.csv")
        .where(F.col("sink_errors"))
        .select("event_ts", "severity", "sqlstate")
        .collect()
    )
    assert any(
        str(r["event_ts"]) == "2025-05-08 12:24:37.731000" for r in rows
    )
    assert all(r["severity"] in ("error", "fatal") for r in rows)
    # sqlstate surfaced for the enrichment dim (csvlog field 13)
    assert any(r["sqlstate"] == "23503" for r in rows)


def test_errors_top_count_8(events):
    # tests/errors.rs:128-170 — top message with exact count 8
    top = agg.errors_top(
        _page(events, "debian_default2.log").where(F.col("sink_errors")),
        max_n=2,
    ).collect()
    assert top[0]["message"] == (
        'new row for relation "pgbench_accounts" violates check '
        'constraint "posbal"'
    )
    assert top[0]["cnt"] == 8


def test_errors_hist_bucket_11(events):
    # tests/errors.rs:172-192 — hist -b 1s -l debug5: bucket
    # 2025-05-22 15:18:10 has 11 records; max bucket count is 16
    df = _page(events, "debian_default2.log").where(
        F.col("severity_num") >= 0
    )
    hist = {
        str(r["bucket_ts"]): r["cnt"]
        for r in agg.errors_hist(df, bucket_s=1).collect()
    }
    assert hist["2025-05-22 15:18:10"] == 11
    assert max(hist.values()) == 16


def test_slow_threshold_1s(events):
    # tests/slow.rs:7-16 — csvlog_pg14.csv slow 1s keeps the
    # 2722.543 ms record
    rows = (
        _page(events, "csvlog_pg14.csv")
        .where(
            (F.col("severity_num") >= route.MIN_SEV_LOG)
            & (F.col("duration_ms") > 1000.0)
        )
        .select("raw", "duration_ms")
        .collect()
    )
    assert any("duration: 2722.543 ms" in r["raw"] for r in rows)


def test_slow_threshold_25ms_plain(events):
    # tests/slow.rs:18-28 — duration.log slow 25ms keeps the
    # WITH RECURSIVE statement
    rows = (
        _page(events, "duration.log")
        .where(
            (F.col("severity_num") >= route.MIN_SEV_LOG)
            & (F.col("duration_ms") > 25.0)
        )
        .select("raw")
        .collect()
    )
    assert any("statement: WITH RECURSIVE" in r["raw"] for r in rows)


def test_slow_top_25_761(events):
    # tests/slow.rs:30-40 — slowest record in duration.log is 25.761 ms
    top = agg.slow_top(_page(events, "duration.log"), limit=10).collect()
    assert top[0]["duration_ms"] == pytest.approx(25.761)
    assert len(top) == 10
    # descending
    durs = [r["duration_ms"] for r in top]
    assert durs == sorted(durs, reverse=True)


def test_locks_routed(events):
    # tests/locks.rs:6-15 — locking.log routes the 12:46:07.925 record
    rows = (
        _page(events, "locking.log")
        .where(F.col("sink_locks"))
        .select("event_ts")
        .collect()
    )
    assert any(
        str(r["event_ts"]) == "2025-06-03 12:46:07.925000" for r in rows
    )


def test_connections_bucket_5(events):
    # tests/connections.rs:6-15 — azure log: 5 connection attempts in the
    # 2025-05-21 11:00 10-minute bucket
    df = _page(events, "azure_connections.log").where(F.col("sink_stats"))
    buckets = {
        str(r["bucket_ts"]): r["cnt"]
        for r in agg.connections_buckets(df).collect()
    }
    assert buckets == {"2025-05-21 11:00:00": 5}

    totals = agg.connections_totals(df).collect()[0]
    assert totals["connection_attempts"] == 5
    assert totals["authenticated"] == 4
    assert totals["authenticated_ssl"] == 4
    assert totals["failures"] == 0

    by_dim = {
        (r["dim"], r["value"]): r["cnt"]
        for r in agg.connections_by_dim(df).collect()
    }
    assert by_dim[("host", "127.0.0.1")] == 5
    assert by_dim[("user", "azuresu")] == 4
    assert by_dim[("database", "postgres")] == 2
    assert by_dim[("appname", "unknown")] == 4


def test_system_routed(events):
    # tests/system.rs:7-17 — system_test.log routes listening/shut-down
    rows = (
        _page(events, "system_test.log")
        .where(F.col("sink_system"))
        .select("raw")
        .collect()
    )
    joined = "\n".join(r["raw"] for r in rows)
    assert "listening" in joined
    assert "was shut down" in joined


def test_mask_filter(events):
    # tests/errors.rs:85-100 — mask restricts to matching records
    df = route.mask_filter(
        _page(events, "debian_default2.log"), "2025-05-22 15:19"
    )
    rows = df.where(F.col("sink_errors")).select("raw").collect()
    assert len(rows) == 2  # the 15:19:11 ERROR and 15:19:19 FATAL
    assert all("2025-05-22 15:19" in r["raw"] for r in rows)


def test_time_range_filter(events):
    # begin/end inclusive bounds (src/output_results/mod.rs:180-185)
    from datetime import datetime

    df = route.time_range_filter(
        _page(events, "debian_default2.log"),
        begin=datetime(2025, 5, 22, 15, 19, 11),
        end=datetime(2025, 5, 22, 15, 19, 19, 513000),
    )
    got = sorted(str(r["event_ts"]) for r in df.select("event_ts").collect())
    assert got[0] >= "2025-05-22 15:19:11"
    assert got[-1] <= "2025-05-22 15:19:19.513000"
    assert len(got) == 4  # ERROR+STATEMENT at :11.345, FATAL+STATEMENT at :19.513


def test_byte_identity_roundtrip(events, spark, webtext_dir):
    # north-rule invariant: per url, concatenated raw records reproduce
    # the page text byte-for-byte
    pages = {
        r["url"]: r["text"]
        for r in spark.read.parquet(webtext_dir)
        .where(F.col("url").startswith(FIX))
        .collect()
    }
    recs = (
        events.where(F.col("url").startswith(FIX))
        .select("url", "record_no", "raw")
        .collect()
    )
    by_url: dict[str, list] = {}
    for r in recs:
        by_url.setdefault(r["url"], []).append((r["record_no"], r["raw"]))
    for url, parts in by_url.items():
        rebuilt = "".join(raw for _, raw in sorted(parts))
        assert rebuilt == pages[url], url


def test_explode_sinks_and_partition_cols(events):
    routed = route.with_partition_cols(route.explode_sinks(events))
    sinks = {r["sink"] for r in routed.select("sink").distinct().collect()}
    assert {"errors", "slow", "locks", "system"} <= sinks
    assert routed.where(F.col("warc_day").isNull()).count() == 0
    n_buckets = routed.select("host_bucket").distinct().count()
    assert 1 < n_buckets <= 16
