"""Benchmark harness (driver contract).

Measures two things and prints ONE JSON line:

1. **Headline** — parsed-events/sec end-to-end through the webtext
   pipeline (parse → enrich → route → write sinks → aggregate stats) on a
   deterministic synthetic webtext table sized by the scale factor
   (generated once and cached under data/). This is the BASELINE.md
   target metric.
2. **queries** — per-query wall seconds for every __spark_entry__
   operator query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_SKIP_QUERIES=1 to benchmark only the pipeline (used by the scaling
harness, tools/bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))

#: webtext pages per unit scale factor (sf0.1 → 36,000 pages ≈ 950k
#: events — big enough that steady-state compute dominates fixed overhead
#: at local[32], so the two-parallelism scaling measurement is meaningful)
PAGES_PER_SF = 360_000


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_webtext(sf: float) -> str:
    from pgweasel_spark.gen import write_webtext

    n_pages = max(200, int(PAGES_PER_SF * sf))
    out = os.path.join(REPO, "data", f"webtext_bench_{n_pages}")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        if os.path.exists(out):
            shutil.rmtree(out)
        write_webtext(out, n_pages=n_pages, seed=42)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def bench_pipeline(spark, webtext_path: str, out_root: str) -> dict:
    """Time the full spine and return events/sec."""
    from pyspark.sql import functions as F

    from pgweasel_spark.operators import route
    from pgweasel_spark.operators.enrich import enrich
    from pgweasel_spark.operators.parse import parse_events
    from pgweasel_spark.plans import pipeline as P

    # warm-up: the measurement window should reflect steady-state pipeline
    # compute, not one-time startup (which amortizes to zero at scale).
    # (a) touch all input bytes (OS page cache); (b) spawn + import the
    # FULL python worker pool — one daemon worker per core; a limit(200)
    # warm-up only spawns 1-2 workers and the remaining ~30 cold imports
    # (~0.5s each) then land inside the measured window, anti-scaling;
    # (c) run a small slice through the whole spine incl. a parquet write
    # so JVM classes / codegen for every stage are JIT-compiled.
    n_cores = spark.sparkContext.defaultParallelism
    spark.read.parquet(webtext_path).select(
        F.sum(F.length("text"))
    ).collect()
    parse_events(
        spark.read.parquet(webtext_path).limit(64 * n_cores).repartition(
            2 * n_cores
        )
    ).count()
    warm_out = os.path.join(out_root, "_warm")
    warm = enrich(parse_events(spark.read.parquet(webtext_path).limit(500)))
    route.with_partition_cols(route.explode_sinks(route.sink_flags(warm))).select(
        *P.ROUTED_COLS
    ).write.mode("overwrite").partitionBy("sink", "warc_day").parquet(warm_out)
    shutil.rmtree(warm_out, ignore_errors=True)

    from pyspark.sql import Observation

    t0 = time.time()
    pages = spark.read.parquet(webtext_path)
    events = enrich(parse_events(pages))
    # parsed-event count observed during the write job (the routed table
    # no longer contains no-sink records, so it can't be the denominator)
    obs = Observation("parsed")
    events = events.observe(obs, F.count(F.lit(1)).alias("n"))
    flagged = route.sink_flags(events)
    routed = route.with_partition_cols(route.explode_sinks(flagged)).select(
        *P.ROUTED_COLS
    )
    (
        routed.hint("rebalance", "sink", "warc_day")
        .write.mode("overwrite")
        .partitionBy("sink", "warc_day")
        .parquet(os.path.join(out_root, "routed"))
    )
    t_write = time.time()
    n_parsed = obs.get["n"]
    written = spark.read.parquet(os.path.join(out_root, "routed"))
    P.write_stats(written, out_root)
    elapsed = time.time() - t0
    n_routed = written.count()
    return {
        "elapsed_s": round(elapsed, 3),
        "parse_route_write_s": round(t_write - t0, 3),
        "stats_s": round(elapsed - (t_write - t0), 3),
        "parsed_events": n_parsed,
        "routed_rows": n_routed,
        "events_per_sec": round(n_parsed / elapsed, 1),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_from_dir(sf_dir)
    # the scaling harness (tools/bench_scaling.py) runs the pipeline on a
    # larger input than the per-round query bench so that fixed driver
    # latency (job scheduling, parquet commit) amortizes and the N-vs-4N
    # comparison measures steady-state compute
    sf_bench = float(os.environ.get("SPARK_GRAFT_BENCH_SF", sf))
    skip_queries = os.environ.get("BENCH_SKIP_QUERIES") == "1"

    from pgweasel_spark.session import get_spark

    spark = get_spark(
        "pgweasel-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(8, int(cpus))),
    )
    spark.sparkContext.setLogLevel("ERROR")

    webtext = ensure_webtext(sf_bench)
    out_root = os.path.join(REPO, "data", f"bench_out_{cpus}")
    if os.path.exists(out_root):
        shutil.rmtree(out_root)
    pipe = bench_pipeline(spark, webtext, out_root)

    query_times: dict[str, float] = {}
    if not skip_queries:
        import __spark_entry__ as entrymod

        for name, fn in entrymod.queries().items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            query_times[name] = round(time.time() - t0, 3)
            _ = n
            # queries that persist intermediates (d5b/d9 signature
            # frames, minhash shingles) cannot unpersist before
            # returning their plan; drop the cache here so repeated
            # query runs in one session don't accumulate cached RDDs
            spark.catalog.clearCache()

    result = {
        "metric": "parsed-events/sec end-to-end (parse→enrich→route→aggregate)",
        "value": pipe["events_per_sec"],
        "unit": "events/sec",
        "queries": query_times,
        "sf": sf,
        "bench_sf": sf_bench,
        "cpus": int(cpus),
        "pipeline": pipe,
    }
    print(json.dumps(result, ensure_ascii=False))


if __name__ == "__main__":
    main()
