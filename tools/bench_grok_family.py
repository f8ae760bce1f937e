"""Interleaved best-of-N re-measure of the grok micro-query family
(VERDICT r2 task #5: p1/p5/p7/p9 showed +20-59% r1->r2 — real regression
or the documented >2x host variance?).

One Spark session, N rounds, queries interleaved within each round (so a
steal-time burst hits all queries equally, not one), first round dropped
as warm-up. Prints one JSON line: per-query min/median/all-samples.

Usage: taskset -c 0-15 python tools/bench_grok_family.py [rounds] [sf_dir]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "p1_severity_grok",
    "p5_message_grok",
    "p7_timestamp_grok",
    "p8_kv_grok",
    "p9_duration_grok",
    "t1_token_stats",  # control: stable r1->r2 (0.16 -> 0.147)
]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from pgweasel_spark.session import get_spark

    spark = get_spark("bench-grok-family")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {k: v for k, v in entry.queries().items() if k in QUERIES}

    samples = {k: [] for k in qs}
    for r in range(rounds + 1):  # +1 warm-up round, dropped
        for name, fn in qs.items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            if r > 0:
                samples[name].append(dt)
    out = {
        name: {
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "samples": v,
        }
        for name, v in samples.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "queries": out}))


if __name__ == "__main__":
    main()
