"""Round-6 optimization measurement harness (bench.py stays frozen).

Times a SUBSET of __spark_entry__ queries with the same methodology as
bench.py (fn(spark, sf_dir).count(), clearCache between queries), with N
repeats per query, and can dump .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py [--sf-dir DIR] [--repeats N] [--explain OUTDIR]
                        [--pipeline] [query1,query2,...]

With --pipeline, also times the bench.py pipeline spine (same code path:
bench.bench_pipeline) instead of/in addition to queries.

Env: SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="?", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--bench-sf", type=float, default=1.0)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pgweasel_spark.session import get_spark

    spark = get_spark(
        "pgweasel-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(8, int(cpus))),
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": args.sf_dir, "cpus": int(cpus)}

    if args.pipeline:
        import bench as benchmod

        webtext = benchmod.ensure_webtext(args.bench_sf)
        out_root = os.path.join(REPO, "data", f"bench_extra_out_{cpus}")
        pipes = []
        for _ in range(args.repeats):
            if os.path.exists(out_root):
                shutil.rmtree(out_root)
            pipes.append(
                benchmod.bench_pipeline(spark, webtext, out_root)
            )
        out["pipeline"] = pipes

    if args.names:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        names = (
            list(qs) if args.names == "all" else args.names.split(",")
        )
        times: dict[str, list[float]] = {}
        for name in names:
            fn = qs[name]
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                df = fn(spark, args.sf_dir)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(args.explain, f"{name}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
                spark.catalog.clearCache()
            samples = []
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                df = fn(spark, args.sf_dir)
                df.count()
                samples.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
            times[name] = samples
            print(f"{name}: {samples}", file=sys.stderr)
        out["queries"] = times
        out["queries_min"] = {n: min(s) for n, s in times.items()}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
