"""Freeze BPE merges learned from the sf0.01 documents table into
pipeline/bpe_frozen.py — the ivf_frozen pattern: learning runs once
(distributed, deterministic: integer pair counts, lexicographic tie
break), application + the DuckDB oracle replay the frozen literals.

Usage: python tools/freeze_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from pyspark.sql import SparkSession

    from ocsf_validator_spark.pipeline import bpe

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.bpe_learn(docs, n_merges=n_merges)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ocsf_validator_spark",
        "pipeline",
        "bpe_frozen.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Frozen BPE merges: bpe_learn(n_merges=%d) over the\n'
            "sf0.01 documents table (integer pair counts, lexicographic\n"
            "tie break -> deterministic at any parallelism). Regenerate:\n"
            'python tools/freeze_bpe.py"""\n\nBPE_MERGES = [\n' % n_merges
        )
        for a, b in merges:
            f.write(f"    ({a!r}, {b!r}),\n")
        f.write("]\n")
    print(f"wrote {len(merges)} merges to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
