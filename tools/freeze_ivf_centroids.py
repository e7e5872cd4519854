"""Regenerate pipeline/ivf_frozen.py: run the deterministic IVF
centroid pipeline (md5-sampled seeds -> 2 Lloyd iterations over the
499 md5-smallest sample rows) ONCE over the sf0.01 embeddings and
freeze the result as float literals.

Freezing sidesteps the one thing a cross-engine oracle cannot replay —
iterated float MEANS (summation-order sensitive) — by making the
refined centroids index-build artifacts: literals in the Spark query
AND in the DuckDB oracle (the hyperplane-literal trick,
similarity.hyperplane_components). At deployment scale this mirrors
reality: an IVF index is trained once and shipped, not re-derived per
query.

Usage: python tools/freeze_ivf_centroids.py [sf_dir] > ocsf_validator_spark/pipeline/ivf_frozen.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from ocsf_validator_spark.pipeline import similarity  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.filter(F.col("vec_id") != 0)  # probe row excluded, like the query
    coarse = similarity.ivf_centroids(emb, n_centroids=8)
    refined = similarity.kmeans_refine(emb, coarse, iters=2, sample_n=499)
    print('"""Frozen IVF centroids: kmeans_refine(iters=2, sample_n=499)')
    print("over the sf0.01 embeddings (probe vec_id=0 excluded),")
    print("n_centroids=8. Literal floats round-trip exactly through")
    print("repr -> Spark lit / DuckDB decimal parse, so both engines")
    print("assign and probe with bit-identical centroid values.")
    print()
    print('Regenerate: python tools/freeze_ivf_centroids.py"""')
    print()
    print("IVF_REFINED_CENTROIDS = [")
    for c in refined:
        print("    [" + ", ".join(repr(x) for x in c) + "],")
    print("]")


if __name__ == "__main__":
    main()
