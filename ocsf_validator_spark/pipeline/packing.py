"""Sequence packing: assign documents to fixed-capacity token windows.

Pretraining consumes fixed-length sequences; the standard
concat-and-split packing lays the corpus out in a deterministic
document order and cuts it every ``max_tokens`` — each document's pack
assignment is a pure function of the GLOBAL prefix sum of token counts
in that order. The naive Spark spelling is a cumulative-sum window
over everything — ONE reducer sorting the whole corpus.

This operator computes the same global prefix sum with a distributed
two-phase scan (the classic parallel prefix):

1. ``repartitionByRange`` on the order key — the one exchange the
   semantics require (physical order IS the operator's meaning);
2. per-partition token totals (one tiny ``groupBy(pid)``, bounded by
   the partition count) are collected and prefix-summed on the driver;
3. each partition then computes its LOCAL running sum with a window
   partitioned by ``spark_partition_id()`` — no second exchange — and
   adds its broadcast partition offset.

The result is identical no matter where the range sampler happens to
place partition boundaries: boundaries only split the work, the prefix
sum is order-determined. (Pinned by a repartition-count equivalence
test.)

Docs longer than ``max_tokens`` are reported where they START; a doc
may straddle pack boundaries (``spans_packs`` > 1) — whether to split
or re-route oversized docs is a consumer decision, the layout is the
operator's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a (pack_id, pack_offset) under
    concat-and-split packing in ascending ``id_col`` order.

    Returns (id_col, n_tokens, pack_id, pack_offset, spans_packs)
    ordered by ``id_col``; rows with NULL or non-positive token counts
    are excluded (they occupy no window space).
    """
    spark = df.sparkSession
    vals = df.select(
        F.col(id_col), F.col(token_col).cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens").isNotNull() & (F.col("n_tokens") > 0))
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = vals.repartitionByRange(parts, F.col(id_col).asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    # cache so the partition layout seen by the totals collect is the
    # layout the local windows run over (repartitionByRange re-samples
    # boundaries per action otherwise)
    ranged = ranged.localCheckpoint(eager=False)
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    if not totals:
        return spark.createDataFrame(
            [],
            f"{id_col} long, n_tokens long, pack_id long, "
            "pack_offset long, spans_packs long",
        )
    offsets = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
    start = (
        F.col("_off") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).alias("_start")
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .select(id_col, "n_tokens", start)
        .select(
            id_col,
            "n_tokens",
            # integer `div`, not floor(double /): a corpus-level prefix
            # sum can pass 2^53 where double division loses exactness
            F.expr(f"_start div {max_tokens}").alias("pack_id"),
            (F.col("_start") % max_tokens).alias("pack_offset"),
            F.expr(
                f"(_start + n_tokens - 1) div {max_tokens} "
                f"- _start div {max_tokens} + 1"
            ).alias("spans_packs"),
        )
        .orderBy(id_col)
    )
