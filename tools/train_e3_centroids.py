"""Reproducibly train the e3 IVF coarse quantizer and print the frozen
centroid literals embedded in ``__spark_entry__.E3_CENTROIDS``.

The e3 oracle strategy (round-3, VERDICT r2 task #3) splits IVF into:

  1. TRAIN (iterative, not SQL-expressible): fixed-seed k-means on the
     deterministic 1/4 hash sample of the sf0.01 embeddings — run ONCE by
     this script, output frozen as literals. This mirrors production IVF,
     where the quantizer is trained on a sample and reused unchanged.
  2. PROBE (pure relational): centroid argmin assignment + 2-list probe +
     within-list brute-force top-k — restated verbatim in DuckDB SQL, so
     the driver gets a full value-hash check instead of rows-only.

Usage: python tools/train_e3_centroids.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgweasel_spark.operators.similarity import ivf_train_centroids
from pgweasel_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = ivf_train_centroids(e, n_lists=8, seed=42, sample_mod=4)
    print("E3_CENTROIDS = [")
    for c in cents:
        print("    [" + ", ".join(repr(v) for v in c) + "],")
    print("]")


if __name__ == "__main__":
    main()
