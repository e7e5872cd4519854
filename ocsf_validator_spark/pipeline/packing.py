"""Sequence packing: assign documents to fixed-capacity token windows.

Pretraining consumes fixed-length sequences; the standard
concat-and-split packing lays the corpus out in a deterministic
document order and cuts it every ``max_tokens`` — each document's pack
assignment is a pure function of the GLOBAL prefix sum of token counts
in that order. The naive Spark spelling is a cumulative-sum window
over everything — ONE reducer sorting the whole corpus.

This module computes the global prefix sum with a distributed
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

Two consumers: :func:`pack_sequences` (fixed-capacity training
windows; docs longer than ``max_tokens`` are reported where they START
and may straddle packs — ``spans_packs`` > 1) and :func:`plan_shards`
(equal-token output shards for writing a balanced corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocsf_validator_spark.localframe import empty_df, local_df


def _global_token_starts(
    df: DataFrame,
    token_col: str,
    id_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame | None, int]:
    """(frame with ``id_col, n_tokens, _start``, corpus token total).
    ``_start`` is the exact global prefix sum (exclusive) of token
    counts in ascending ``id_col`` order; rows with NULL/non-positive
    counts are excluded. Returns (None, 0) when nothing survives."""
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
    if not totals:
        return None, 0
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    offsets = local_df(
        spark,
        [(pid, off) for pid, off in prefix.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
    start = (
        F.col("_off") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).alias("_start")
    return (
        ranged.join(F.broadcast(offsets), "_pid").select(
            id_col, "n_tokens", start
        ),
        acc,
    )


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
    starts, _total = _global_token_starts(
        df, token_col, id_col, num_partitions
    )
    if starts is None:
        return empty_df(
            df.sparkSession,
            f"{id_col} long, n_tokens long, pack_id long, "
            "pack_offset long, spans_packs long",
        )
    return starts.select(
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
    ).orderBy(id_col)


def plan_shards(
    df: DataFrame,
    n_shards: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Equal-token shard assignment for writing a balanced corpus:
    shard boundaries fall at ``total/n_shards``-token marks of the
    global prefix sum, so every shard holds within one document of the
    ideal token share — the layout step before
    ``repartition(n).write`` that keeps training-shard sizes even when
    document lengths are skewed (a doc-COUNT split would not).

    shard_id(d) = (start(d) * n_shards) div total — exact integer
    arithmetic (start * n_shards stays under 2^63 for any real corpus),
    monotone in ``id_col`` order, every shard non-empty when
    n_shards <= corpus docs is satisfied in the typical token>0 regime.

    Returns (id_col, n_tokens, shard_id) ordered by ``id_col``.
    """
    starts, total = _global_token_starts(
        df, token_col, id_col, num_partitions
    )
    if starts is None:
        return empty_df(
            df.sparkSession, f"{id_col} long, n_tokens long, shard_id long"
        )
    return starts.select(
        id_col,
        "n_tokens",
        F.expr(f"(_start * {n_shards}) div {total}").alias("shard_id"),
    ).orderBy(id_col)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training order for one epoch: each row's
    position is the global rank of ``md5(id|salt|epoch)`` — a full
    corpus shuffle that is reproducible across runs, retries,
    partitionings, and engines (no RNG state), changes completely
    between epochs, and never needs the driver to hold the permutation.

    The naive spelling is ``row_number() OVER (ORDER BY key)`` — one
    reducer sorting the whole corpus. This is the same two-phase
    parallel prefix as :func:`pack_sequences`, counting rows instead of
    tokens: repartitionByRange on (key, id) — the one exchange a global
    permutation requires — then per-partition counts prefix-summed on
    the driver and a LOCAL row_number per ``spark_partition_id`` plus
    the broadcast offset. Boundary-placement-independent: ranks are
    order-determined, boundaries only split the work. ``id_col``
    tie-breaks identical keys so the order is total.

    Returns (id_col, epoch, pos) with pos in [0, n); NULL ids are
    excluded (no stable key). Downstream batch assignment is
    ``pos div batch_size``; shard-local files can write with
    ``repartitionByRange(n, pos)`` without re-shuffling semantics.
    """
    spark = df.sparkSession
    key = F.md5(
        F.concat_ws(
            "|",
            F.col(id_col).cast("string"),
            F.lit(salt),
            F.lit(str(int(epoch))),
        )
    )
    vals = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col), key.alias("_k")
    )
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = vals.repartitionByRange(
        parts, F.col("_k").asc(), F.col(id_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    # pin the layout the counts collect sees to the layout the local
    # windows run over (range sampler re-draws per action otherwise)
    ranged = ranged.localCheckpoint(eager=False)
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    if not counts:
        return local_df(
        spark,
            [], f"{id_col} long, epoch int, pos long"
        )
    prefix, acc = {}, 0
    for pid in sorted(counts):
        prefix[pid] = acc
        acc += counts[pid]
    offsets = local_df(
        spark,
        [(pid, off) for pid, off in prefix.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(
        F.col("_k").asc(), F.col(id_col).asc()
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .select(
            id_col,
            F.lit(int(epoch)).alias("epoch"),
            (F.col("_off") + F.row_number().over(w) - 1)
            .cast("bigint")
            .alias("pos"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking: each document becomes overlapping
    ``chunk_tokens``-token windows advancing by ``chunk_tokens -
    overlap`` — the context-window prep step (embedding indexing, long
    -doc SFT) between raw documents and :func:`pack_sequences`' packer.

    Pure column algebra over a 2-column pruned scan: tokens =
    whitespace split, starts = sequence(0, n-1, stride), one
    transform + explode — ZERO shuffle, composes into any scan. Window
    starts are emitted while start < n, so the final window is partial
    (>= ``overlap`` + 1 tokens when the document overflows a whole
    window, never empty); documents shorter than one window yield
    exactly one chunk; NULL text yields none. Output carries
    (chunk_idx, start_tok, n_tokens, chunk_chars) — offsets, not chunk
    text, so downstream hashes/joins stay narrow and the chunk body is
    recoverable from the source row by (start_tok, n_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    from ocsf_validator_spark.pipeline.decontam import bind1

    # start while start <= n - overlap - 1 (plus start 0 always): the
    # final window then holds >= overlap + 1 tokens and is never fully
    # contained in its predecessor, and every token is covered (the
    # last start is within stride of n - overlap, so start + chunk
    # reaches past n - 1). Token array bound once via bind1 (a split
    # referenced inside the per-window lambda would re-tokenize the
    # document once per window).
    body = f"""
        transform(
          sequence(0, greatest(size(tk) - {overlap} - 1, 0), {stride}),
          s -> named_struct(
            'start_tok', s,
            'n_tokens', size(slice(tk, s + 1, {chunk_tokens})),
            'chunk_chars',
              length(array_join(slice(tk, s + 1, {chunk_tokens}), ' '))
          )
        )
        """
    chunks = F.expr(bind1(body, f"split({text_col}, ' ')", "tk"))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c"))
        .select(
            id_col,
            "chunk_idx",
            F.col("_c.start_tok").alias("start_tok"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_chars").alias("chunk_chars"),
        )
    )
