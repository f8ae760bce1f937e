"""Pipeline write + checkpoint manifest + kill/resume semantics."""

import os

from pyspark.sql import functions as F

from pgweasel_spark.plans import pipeline
from pgweasel_spark.plans.manifest import Manifest


def test_run_all_then_resume_noop(spark, webtext_dir, tmp_path):
    out = str(tmp_path / "out")
    res1 = pipeline.run(spark, webtext_dir, out, with_stats=True)
    assert res1.days_processed  # 7 synthetic days + fixture day
    assert res1.sink_counts.get("errors", 0) > 0
    assert res1.sink_counts.get("stats", 0) > 0

    # resume on a complete manifest is a no-op
    res2 = pipeline.run(spark, webtext_dir, out, with_stats=False)
    assert res2.days_processed == []
    assert set(res2.days_skipped) == set(res1.days_processed)

    # manifest carries per-day per-sink AND per-physical-partition
    # lineage (sink/host_bucket granularity — the table's partition
    # spec), with sink totals equal to the partition sums
    m = Manifest.load(os.path.join(out, "manifest.json"))
    assert m.completed_days() == set(res1.days_processed)
    for day, entry in m.days.items():
        assert entry["input_rows"] > 0, day
        assert entry["sink_counts"], day
        parts = entry["partition_counts"]
        assert parts, day
        by_sink: dict[str, int] = {}
        for key, cnt in parts.items():
            sink, bucket = key.rsplit("/", 1)
            assert 0 <= int(bucket) < 16
            by_sink[sink] = by_sink.get(sink, 0) + cnt
        assert by_sink == entry["sink_counts"], day


def test_incremental_day_batches_match_full_run(spark, webtext_dir, tmp_path):
    """Simulated kill/resume: processing one day per run converges to the
    same routed table as a single full run (idempotent dynamic
    partition overwrite + manifest skip)."""
    out_full = str(tmp_path / "full")
    out_inc = str(tmp_path / "inc")
    pipeline.run(spark, webtext_dir, out_full, with_stats=False)

    # process one day at a time until nothing is pending
    for _ in range(20):
        res = pipeline.run(
            spark, webtext_dir, out_inc, day_batch=1, with_stats=False
        )
        if not res.days_processed:
            break

    full = spark.read.parquet(os.path.join(out_full, "routed"))
    inc = spark.read.parquet(os.path.join(out_inc, "routed"))
    assert full.count() == inc.count()
    key = ["sink", "url", "record_no"]
    assert full.select(*key).exceptAll(inc.select(*key)).count() == 0
    assert inc.select(*key).exceptAll(full.select(*key)).count() == 0

    # re-processing a day (idempotency): force one day back to pending
    m = Manifest.load(os.path.join(out_inc, "manifest.json"))
    some_day = sorted(m.completed_days())[0]
    del m.days[some_day]
    m.save()
    res = pipeline.run(spark, webtext_dir, out_inc, with_stats=False)
    assert res.days_processed == [some_day]
    inc2 = spark.read.parquet(os.path.join(out_inc, "routed"))
    assert inc2.count() == full.count()  # no duplicates


def test_jsonlog_batch_pipeline_resume_matches_stderr_twin(
    spark, tmp_path
):
    """A raw jsonlog directory routes through the batch pipeline
    (input_format='jsonlog') without the CLI: day-batched kill/resume
    works off the events' own timestamps, and per-sink routed counts
    equal the stderr-twin corpus run through the parquet-pages path.
    Malformed lines batch under the 1970-01-01 sentinel day instead of
    being dropped."""
    import json
    from datetime import datetime

    events, stderr_lines = [], []
    for day in (3, 4):  # two warc days → two resume batches
        for i in range(5):
            ts = f"2025-06-{day:02d} 12:00:{i:02d}.000 UTC"
            events.append(
                {
                    "timestamp": ts,
                    "error_severity": "ERROR",
                    "message": "division by zero",
                    "state_code": "22012",
                    "user": "u",
                    "dbname": "d",
                    "application_name": "a",
                    "remote_host": "h",
                    "process_id": i,
                }
            )
            stderr_lines.append(
                (day, f"{ts} [123] u@d ERROR:  division by zero")
            )
            events.append(
                {
                    "timestamp": ts,
                    "error_severity": "LOG",
                    "message": f"duration: 5025.{i} ms  statement: select {i}",
                    "state_code": "00000",
                    "user": "u",
                    "dbname": "d",
                    "application_name": "a",
                    "remote_host": "h",
                    "process_id": i,
                }
            )
            stderr_lines.append(
                (
                    day,
                    f"{ts} [124] u@d LOG:  duration: 5025.{i} ms "
                    f" statement: select {i}",
                )
            )
    jdir = tmp_path / "jl"
    jdir.mkdir()
    (jdir / "pg.json").write_text(
        "\n".join(json.dumps(e) for e in events) + "\nnot json\n"
    )

    # stderr twin: one page per day, page warc_ts on the same day the
    # events carry (so both pipelines batch identically)
    pages = spark.createDataFrame(
        [
            (
                f"http://twin/{day}.log",
                datetime(2025, 6, day, 12, 0, 0),
                "\n".join(l for d, l in stderr_lines if d == day),
                None,
            )
            for day in (3, 4)
        ],
        "url string, warc_ts timestamp, text string, lang string",
    )
    pdir = str(tmp_path / "pages")
    pages.write.parquet(pdir)

    out_twin = str(tmp_path / "out_twin")
    res_twin = pipeline.run(spark, pdir, out_twin, with_stats=False)

    # jsonlog path, one day per run (kill/resume) — 3 pending days:
    # 2025-06-03, 2025-06-04 and the 1970-01-01 malformed sentinel
    out_jl = str(tmp_path / "out_jl")
    batches = []
    for _ in range(10):
        res = pipeline.run(
            spark,
            str(jdir),
            out_jl,
            day_batch=1,
            with_stats=False,
            input_format="jsonlog",
        )
        if not res.days_processed:
            break
        batches.extend(res.days_processed)
    assert batches == ["1970-01-01", "2025-06-03", "2025-06-04"]

    jl = spark.read.parquet(os.path.join(out_jl, "routed"))
    twin = spark.read.parquet(os.path.join(out_twin, "routed"))
    sentinel = jl.where(F.col("warc_day") == "1970-01-01")
    assert sentinel.count() == 1  # the malformed line, quarantined
    assert sentinel.first()["sink"] == "quarantine"

    def sink_counts(df):
        return {
            r["sink"]: r["cnt"]
            for r in df.groupBy("sink")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
    jl_counts = sink_counts(jl.where(F.col("warc_day") != "1970-01-01"))
    twin_counts = sink_counts(twin)
    assert jl_counts == twin_counts
    assert res_twin.sink_counts["errors"] == jl_counts["errors"] == 10

    # resume on the complete jsonlog manifest is a no-op
    res = pipeline.run(
        spark, str(jdir), out_jl, with_stats=False,
        input_format="jsonlog",
    )
    assert res.days_processed == []


def test_stats_tables_written(spark, webtext_dir, tmp_path):
    out = str(tmp_path / "stats_out")
    pipeline.run(spark, webtext_dir, out, with_stats=True)
    for t in [
        "errors_top",
        "errors_hist",
        "slow_top",
        "connections_totals",
        "connections_by_dim",
        "connections_buckets",
    ]:
        df = spark.read.parquet(os.path.join(out, "stats", t))
        assert df.count() > 0, t
    top = spark.read.parquet(os.path.join(out, "stats", "errors_top"))
    assert top.count() <= 20
    slow = spark.read.parquet(os.path.join(out, "stats", "slow_top"))
    assert slow.count() == 10
    durs = [r["duration_ms"] for r in slow.collect()]
    assert durs == sorted(durs, reverse=True)


def test_read_sink(spark, webtext_dir, tmp_path):
    out = str(tmp_path / "rs")
    pipeline.run(spark, webtext_dir, out, with_stats=False)
    errors = pipeline.read_sink(spark, out, "errors")
    assert errors.count() > 0
    assert errors.where(F.col("severity_num") < 8).count() == 0
