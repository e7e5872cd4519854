"""Deduplication operators: exact, shingle-Jaccard, MinHash+LSH, SimHash.

Scale notes (the 100 TB design point):

- **Exact** dedup is one groupBy on a hash of the text — map-side partial
  aggregation keeps the shuffle proportional to distinct texts, and the
  second join is a semi-join against only the offending keys.
- **MinHash+LSH** replaces the O(n²) pairwise comparison with a
  signature groupBy: candidate pairs only materialize for documents that
  collide in at least one band. Shingles (word k-grams) are built with
  `transform(sequence(...))` — pure column algebra, one scan, no
  explode until the signature aggregation.
- **SimHash** is a single projection (nested `aggregate` over the token
  array), no shuffle at all; near-dup candidates come from banding the
  16-bit fingerprint.
- All hash functions are md5-prefix based (not xxhash64) so every
  result is reproducible in any engine for oracle verification; swap
  `_HASH_FMT` for xxhash64 when oracle parity is not needed (xxhash64 is
  ~3× faster, same plan shape).

Reference parity: the reference's collision detection is
validate_intra_type_collisions (reference validators.py:236-262) —
exact dedup generalizes it from (type, name) keys to content keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-prefix → bigint; engine-portable (DuckDB: ('0x'||substr(md5(x),1,8))::BIGINT)
_MD5_HASH = "cast(conv(substring(md5({x}), 1, 8), 16, 10) as bigint)"


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, keep_id) for every row whose ``text_col`` duplicates an
    earlier (min-id) row. GroupBy text benefits from map-side combine;
    only duplicated keys survive to the join."""
    canon = (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .drop("_n")
    )
    return (
        df.join(canon, text_col)
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col), F.col("keep_id"))
    )


def shingle_col(text_col: str = "text", k: int = 5):
    """Distinct word k-gram shingles as an array column — built with
    sequence+transform (no explode, stays in one projection)."""
    arr = f"split({text_col}, ' ')"
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({arr}) - {k - 1}, 1)),"
        f" j -> concat_ws(' ', slice({arr}, j, {k}))))"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    k: int = 5,
) -> DataFrame:
    """(id, m0..m{n-1}) MinHash signature over word k-gram shingles.

    One explode + one groupBy(id): the shuffle carries (id, shingle)
    pairs; all n_hashes mins aggregate in the same pass (map-side
    partial min per hash)."""
    sh = df.select(
        F.col(id_col), F.explode(shingle_col(text_col, k)).alias("_sh")
    )
    aggs = [
        F.min(F.expr(_MD5_HASH.format(x=f"concat(_sh, '#', {i})"))).alias(f"m{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Distinct (a_id, b_id) pairs colliding in ≥1 LSH band. Each band is
    an equi-join on the band's hash tuple — broadcast-free sort-merge /
    shuffled-hash joins on high-cardinality keys, output proportional to
    true collisions, never n²."""
    n_bands = n_hashes // band_size
    out = None
    for b in range(n_bands):
        cols = [f"m{i}" for i in range(b * band_size, (b + 1) * band_size)]
        a = sig.select(F.col(id_col).alias("a_id"), *cols)
        bb = sig.select(F.col(id_col).alias("b_id"), *cols)
        leg = a.join(bb, cols).filter(F.col("a_id") < F.col("b_id")).select(
            "a_id", "b_id"
        )
        out = leg if out is None else out.unionByName(leg)
    return out.distinct()


def jaccard_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Pairwise word-k-gram Jaccard within blocking-key groups —
    (a_id, b_id, jaccard). The inverted-index formulation: explode
    shingles, self-join on (block, shingle) to count the intersection,
    then join per-doc shingle counts for the union size. Blocking bounds
    the candidate set; without it this is a full O(n²)."""
    sh = df.select(
        *block_cols,
        F.col(id_col),
        F.explode(shingle_col(text_col, k)).alias("_sh"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.select(*block_cols, F.col(id_col).alias("a_id"), "_sh")
    b = sh.select(*block_cols, F.col(id_col).alias("b_id"), "_sh")
    common = (
        a.join(b, [*block_cols, "_sh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("_sz").alias("_szb"))
    jac = F.col("_common") / (F.col("_sza") + F.col("_szb") - F.col("_common"))
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_col(text_col: str = "text", bits: int = 16):
    """SimHash fingerprint of the whitespace-token multiset — one pure
    column expression (nested aggregate over the token array), zero
    shuffle. ``bits`` ≤ 32 keeps the oracle SQL tractable."""
    tok = f"split({text_col}, ' ')"
    h = _MD5_HASH.format(x="t")
    # per bit b: sign-sum over tokens of bit b of h(t); fingerprint bit set if > 0
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> acc + "
        f"if(aggregate({tok}, 0L, (s, t) -> s + if(({h} div shiftleft(1L, b)) % 2 = 1, 1L, -1L)) > 0,"
        f" shiftleft(1L, b), 0L))"
    )


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Candidate near-dup pairs: identical SimHash → same bucket.
    (Banding by half-fingerprints would admit Hamming distance ≤ bits/2;
    exact-bucket match is the strictest, cheapest variant.)"""
    s = df.select(F.col(id_col), simhash_col(text_col, bits).alias("simhash"))
    a = s.select(F.col(id_col).alias("a_id"), "simhash")
    b = s.select(F.col(id_col).alias("b_id"), "simhash")
    return (
        a.join(b, "simhash")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "simhash")
    )
