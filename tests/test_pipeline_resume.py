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

    # manifest carries per-day per-sink lineage
    m = Manifest.load(os.path.join(out, "manifest.json"))
    assert m.completed_days() == set(res1.days_processed)
    for day, entry in m.days.items():
        assert entry["input_rows"] > 0, day
        assert entry["sink_counts"], day


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
