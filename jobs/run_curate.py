"""spark-submit entry point for the full training-data CURATION pass —
the composition a real corpus run executes end-to-end: quality gates →
per-source quantile normalization → exact dedup → deterministic
train/val/test split → one curated output table.

Package + submit (same ship path as jobs/run_pipeline.py):

    python tools/package_pyfiles.py
    spark-submit --master <cluster-master> \
        --py-files dist/pgweasel_spark.zip \
        jobs/run_curate.py \
        --input <documents.parquet dir> --out <out root> \
        [--min-tokens 20] [--quality-q 0.25] [--train 0.9] [--val 0.05]

Stage outputs under --out:
    gate/     per-doc Gopher keep/drop verdict (absolute thresholds)
    quality/  per-source quantile gate (each domain's own bottom tail)
    exact/    content-hash groups (hash, cnt, keeper)
    curated/  final table: docs passing BOTH gates, exact-dup keepers
              only, with the deterministic split column attached

Scale shape: the gates are map-only + one bounded agg each; dedup is
one uniform-hash shuffle; the split is a pure projection; the final
assembly joins the (small) drop/keeper sets back broadcast-style.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="pgweasel_spark curation pass")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--group-col", default="source")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-top-gram-frac", type=float, default=0.1)
    p.add_argument("--max-dup-gram-frac", type=float, default=0.2)
    p.add_argument("--quality-q", type=float, default=0.25)
    p.add_argument(
        "--quality-metric",
        choices=("stopword", "unigram_nll"),
        default="stopword",
        help="per-source quantile gate score: English stopword ratio "
        "(higher=better) or corpus unigram mean NLL (lower=better; "
        "negated so the gate keeps the fluent tail)",
    )
    p.add_argument("--train", type=float, default=0.9)
    p.add_argument("--val", type=float, default=0.05)
    # line-level Gopher/Dolma signals (r5): None = arm disabled, the
    # legacy gate schema/verdicts are then byte-identical
    p.add_argument("--max-symbol-word-ratio", type=float, default=None)
    p.add_argument("--max-bullet-line-frac", type=float, default=None)
    p.add_argument("--max-ellipsis-line-frac", type=float, default=None)
    p.add_argument("--max-dup-line-frac", type=float, default=None)
    p.add_argument(
        "--word-len-range",
        type=float,
        nargs=2,
        default=None,
        metavar=("MIN", "MAX"),
    )
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from pgweasel_spark.operators.dedup import exact_dedup
    from pgweasel_spark.operators.sampling import hash_split
    from pgweasel_spark.operators.textstats import (
        gopher_gate,
        quantile_quality_gate,
        stopword_hits,
        words,
    )
    from pgweasel_spark.session import get_spark

    spark = get_spark("pgweasel-curate")
    t0 = time.time()
    # operator-persisted frames (r6: unigram tf) — unpersisted after the
    # consuming writes complete, the jobs/run_dedup.py contract
    caches: list = []
    docs = spark.read.parquet(args.input)

    gate = gopher_gate(
        docs,
        text_col=args.text_col,
        key_col=args.id_col,
        min_tokens=args.min_tokens,
        max_top_gram_frac=args.max_top_gram_frac,
        max_dup_gram_frac=args.max_dup_gram_frac,
        max_symbol_word_ratio=args.max_symbol_word_ratio,
        max_bullet_line_frac=args.max_bullet_line_frac,
        max_ellipsis_line_frac=args.max_ellipsis_line_frac,
        max_dup_line_frac=args.max_dup_line_frac,
        word_len_range=(
            tuple(args.word_len_range) if args.word_len_range else None
        ),
    )
    gate.write.mode("overwrite").parquet(os.path.join(args.out, "gate"))

    if args.quality_metric == "unigram_nll":
        from pgweasel_spark.operators.textstats import (
            unigram_logprob_score,
        )

        # negate so "keep at/above the q-th percentile" keeps the
        # FLUENT (low-NLL) tail, matching the stopword gate's polarity
        nll = unigram_logprob_score(
            docs,
            text_col=args.text_col,
            key_col=args.id_col,
            cache_registry=caches,
        )
        scored = docs.select(args.id_col, args.group_col).join(
            nll.select(
                args.id_col, (-F.col("mean_nll")).alias("score")
            ),
            args.id_col,
        )
    else:
        w = words(F.col(args.text_col))
        scored = docs.select(
            args.id_col,
            args.group_col,
            F.round(
                stopword_hits(F.col(args.text_col), "en") / F.size(w), 4
            ).alias("score"),
        )
    quality = quantile_quality_gate(
        scored,
        score_col="score",
        group_col=args.group_col,
        q=args.quality_q,
        key_col=args.id_col,
    )
    quality.write.mode("overwrite").parquet(
        os.path.join(args.out, "quality")
    )
    for h in caches:
        h.unpersist()

    exact = exact_dedup(docs, text_col=args.text_col, key_col=args.id_col)
    exact.write.mode("overwrite").parquet(os.path.join(args.out, "exact"))

    # final assembly: both gates pass AND doc is its hash-group's keeper
    gate_keep = spark.read.parquet(os.path.join(args.out, "gate")).where(
        F.col("keep")
    ).select(args.id_col)
    qual_keep = spark.read.parquet(
        os.path.join(args.out, "quality")
    ).where(F.col("keep")).select(args.id_col)
    keepers = spark.read.parquet(os.path.join(args.out, "exact")).select(
        F.col("keeper").alias(args.id_col)
    )
    curated = hash_split(
        docs.join(gate_keep, args.id_col)
        .join(qual_keep, args.id_col)
        .join(keepers, args.id_col),
        key_col=args.id_col,
        train=args.train,
        val=args.val,
    )
    curated.write.mode("overwrite").parquet(
        os.path.join(args.out, "curated")
    )

    counts = {
        name: spark.read.parquet(os.path.join(args.out, name)).count()
        for name in ("gate", "quality", "exact", "curated")
    }
    splits = {
        r["split"]: r["cnt"]
        for r in spark.read.parquet(os.path.join(args.out, "curated"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    print(
        json.dumps(
            {
                "master": spark.conf.get("spark.master"),
                "rows": counts,
                "splits": splits,
                "elapsed_s": round(time.time() - t0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
