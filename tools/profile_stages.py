"""Ad-hoc stage-level profiler for the bench pipeline (dev tool).

Times each stage of the spine separately on the cached bench webtext input
so we can see which stage fails to scale 8->32. Usage:
    taskset -c 0-31 python tools/profile_stages.py 32
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    from pyspark.sql import functions as F

    from bench import ensure_webtext
    from pgweasel_spark.operators import route
    from pgweasel_spark.operators.enrich import enrich
    from pgweasel_spark.operators.parse import parse_events, split_pages
    from pgweasel_spark.plans import pipeline as P
    from pgweasel_spark.session import get_spark

    spark = get_spark(
        "profile",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(8, int(cpus))),
    )
    spark.sparkContext.setLogLevel("ERROR")
    webtext = ensure_webtext(0.1)
    out_root = os.path.join(REPO, "data", f"profile_out_{cpus}")
    if os.path.exists(out_root):
        shutil.rmtree(out_root)

    pages = spark.read.parquet(webtext)
    # warm: page cache + python workers
    pages.select(F.sum(F.length("text"))).collect()
    parse_events(pages.limit(200)).count()

    t = {}

    def step(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"{name:28s} {t[name]:8.2f}s  -> {r}")
        return r

    step("1_split_count", lambda: split_pages(pages).count())
    step("2_parse_count", lambda: parse_events(pages).count())
    ev = enrich(parse_events(pages))
    step(
        "3_enrich_agg",
        lambda: ev.agg(
            F.sum("severity_num"), F.count("duration_ms")
        ).collect(),
    )
    routed = route.with_partition_cols(
        route.explode_sinks(route.sink_flags(ev))
    ).select(*P.ROUTED_COLS)
    step("4_routed_count", lambda: routed.count())
    step(
        "5_write_routed",
        lambda: routed.hint("rebalance", "sink", "warc_day", "host_bucket")
        .write.mode("overwrite")
        .partitionBy("sink", "warc_day", "host_bucket")
        .parquet(os.path.join(out_root, "routed")),
    )
    written = spark.read.parquet(os.path.join(out_root, "routed"))
    step("6_stats", lambda: P.write_stats(written, out_root))
    print(f"cpus={cpus} breakdown={t}")


if __name__ == "__main__":
    main()
