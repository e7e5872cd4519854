"""Per-document keyword extraction: TF-IDF top terms.

The classic curation feature between text profiling (textstats.py) and
selection (select.py): surface each document's most distinctive terms
so downstream stages can cluster, tag, or route documents by topic.

Scale discipline (the 100 TB design point):

- Term frequencies come from one ``explode`` + partial-aggregating
  ``groupBy(doc, term)``: every token of a document lives in one input
  row, so map-side combine collapses the token stream to DISTINCT
  (doc, term) pairs before the exchange — the shuffle is per-document
  VOCABULARY-sized (the same order as this operator's output
  precursor), never token-stream-sized.
- Document frequencies ride the SAME distinct-pair stream, re-keyed on
  a 60-bit md5-prefix hash of the term (`decontam._MD5_60`, DuckDB-
  replayable) so the df exchange carries fixed-width 8-byte ints, not
  strings. Because the pair stream is already distinct per doc,
  ``count(*)`` IS the document frequency.
- The corpus size N crosses as a broadcast 1-row frame (the drift.py
  totals pattern); the df side joins back on the hash (AQE broadcasts
  it when the vocabulary is small; at 100 TB it is a hash-keyed
  equi-join on the 8-byte key).
- The per-document top-k is a ``row_number`` window partitioned by
  doc_id — one exchange of the vocabulary-sized pair stream, linear
  per document.

Cross-engine determinism: ranking uses the ROUNDED tfidf (6 dp) with
the term string as tie-break, so a sub-rounding libm ULP difference in
``ln`` can never flip ranks between Spark and the DuckDB oracle.
60-bit hash collisions would merge two terms' document frequencies;
at 2^60 the corpus-vocabulary birthday bound makes this negligible
(same argument as decontam.py / select.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocsf_validator_spark.localframe import empty_df, local_df

from ocsf_validator_spark.pipeline.decontam import _MD5_60

# vocab_coverage small-histogram cap (rows of the count histogram the
# driver will walk); module-level so tests can force the distributed
# two-phase-prefix path
_HIST_CAP = 2_000_000


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Returns (id_col, term, tf, df_docs, tfidf) with
    ``tfidf = tf * ln(N / df_docs)`` rounded to 6 dp; ties within a
    document break on the term string ascending.
    """
    tf = (
        df.select(
            F.col(id_col), F.explode(F.expr(f"split({text_col}, ' ')")).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("_h", F.expr(_MD5_60.format(x="term")))
    )
    # both the scoring join's probe side and the df aggregation consume
    # tf; without this the whole scan+tokenize+explode subtree executes
    # TWICE (Catalyst does not reuse the exchange across the branches —
    # verified on the executed plan). Checkpointing the per-doc
    # vocabulary projection — the smallest common intermediate — makes
    # it one corpus scan; this is the "persist the tokenized
    # projection" production advice, automated.
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("_h").agg(F.count(F.lit(1)).alias("df_docs"))
    totals = df.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "_h")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("df_docs")), 6),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(id_col, "term", "tf", "df_docs", "tfidf")
        .orderBy(id_col, "term")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average unigram negative log-probability — the
    KenLM-style perplexity filter reduced to its unigram core: score a
    document by how surprising its tokens are under the corpus's own
    unigram distribution. Degenerate/templated pages score LOW
    (predictable tokens), lexically rich pages score HIGH; both tails
    are the usual cut candidates.

    score(d) = - sum_w tf(d,w) * ln( cnt(w) / total ) / len(d)

    Same scale shape as :func:`tfidf_topk`: one corpus scan into the
    checkpointed per-doc vocabulary projection; the global unigram
    counts ride the 60-bit term-hash exchange (8-byte ints, never
    strings); the corpus total crosses as a broadcast 1-row frame; the
    per-doc reduction is a partial-agg groupBy on the id.

    Returns (id_col, n_tokens, avg_neg_logprob) with the score rounded
    to 6 dp, ordered by id.
    """
    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.expr(f"split({text_col}, ' ')")).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("_h", F.expr(_MD5_60.format(x="term")))
        .localCheckpoint(eager=False)
    )
    counts = tf.groupBy("_h").agg(F.sum("tf").alias("cnt"))
    totals = tf.agg(F.sum("tf").cast("double").alias("_total"))
    return (
        tf.join(counts, "_h")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("tf") * F.log(F.col("cnt") / F.col("_total"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_neg_logprob"),
        )
        .orderBy(id_col)
    )


def vocab_coverage(
    df: DataFrame,
    coverages_pct: tuple[int, ...] = (50, 90, 99),
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Tokenizer-prep coverage curve: for each requested coverage
    fraction, the SMALLEST vocabulary (terms taken in descending
    frequency) whose occurrences cover at least that share of the
    corpus token stream — the number that sizes a vocab / merges
    budget before training a tokenizer.

    Never ranks individual terms: within one frequency value terms are
    interchangeable, so the whole curve is exact from the COUNT
    HISTOGRAM (cnt -> n_terms, mass): vocab_size at threshold =
    terms_above_cutoff + ceil((needed - mass_above_cutoff) / cutoff).

    Plan: token stream -> partial-agg term counts on the 60-bit
    md5-prefix hash (8-byte ints in the exchange, never strings — the
    X19/X15 discipline) -> count histogram (second exchange, bounded by
    the number of DISTINCT frequencies, ~O(sqrt(total_tokens)) under a
    Zipf tail, never vocabulary-sized) -> X23 two-phase parallel prefix
    over the histogram in cnt DESC order (per-partition totals on the
    driver, LOCAL windows — no single-reducer global cumsum even when
    the histogram is wide) -> each coverage picks its crossing row.
    All integer arithmetic: needed = ceil-div of exact BIGINTs, so the
    curve is engine-replayable with no float in sight.

    Returns one row per coverage: (coverage_pct, needed_tokens,
    vocab_size, cutoff_cnt, covered_tokens), covered_tokens >=
    needed_tokens by construction. Empty corpus -> empty frame.
    """
    if not coverages_pct or any(
        not (0 < int(q) <= 100) for q in coverages_pct
    ):
        raise ValueError("coverages_pct must be ints in (0, 100]")
    spark = df.sparkSession
    empty_schema = (
        "coverage_pct int, needed_tokens long, vocab_size long, "
        "cutoff_cnt long, covered_tokens long"
    )
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.expr(f"split({text_col}, ' ')")).alias("term"))
        .select(F.expr(_MD5_60.format(x="term")).alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = counts.groupBy("cnt").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.col("cnt") * F.count(F.lit(1))).alias("mass"),
    )
    # small-histogram fast path: the count histogram is bounded by the
    # number of DISTINCT frequencies (~O(sqrt(total_tokens)) under a
    # Zipf tail — the module-head argument), so the common case fits
    # the driver with room to spare. Collect it ONCE (Arrow, limit-
    # probed so a pathological non-Zipf histogram falls through to the
    # distributed two-phase prefix below) and walk the cumulative curve
    # in Python — the identical integer arithmetic, zero extra jobs.
    probe = hist.limit(_HIST_CAP + 1).toArrow()
    if probe.num_rows <= _HIST_CAP:
        rows = sorted(
            zip(
                probe.column("cnt").to_pylist(),
                probe.column("n_terms").to_pylist(),
                probe.column("mass").to_pylist(),
            ),
            key=lambda t: -t[0],
        )
        if not rows:
            return local_df(spark, [], empty_schema)
        total = sum(m for _, _, m in rows)
        out = []
        for q in coverages_pct:
            needed = (total * int(q) + 99) // 100
            cm = ct = 0
            for cnt, n_terms, mass in rows:
                if cm < needed <= cm + mass:
                    picked = (needed - cm + cnt - 1) // cnt
                    out.append(
                        (
                            int(q),
                            needed,
                            ct + picked,
                            cnt,
                            cm + picked * cnt,
                        )
                    )
                    break
                cm += mass
                ct += n_terms
        return local_df(spark, out, empty_schema)
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = hist.repartitionByRange(
        parts, F.col("cnt").desc()
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)
    ptot = (
        ranged.groupBy("_pid")
        .agg(F.sum("mass").alias("m"), F.sum("n_terms").alias("t"))
        .collect()
    )
    if not ptot:
        return local_df(spark, [], empty_schema)
    pm = {r["_pid"]: (r["m"], r["t"]) for r in ptot}
    offs, am, at = [], 0, 0
    for pid in sorted(pm):
        offs.append((pid, am, at))
        am += pm[pid][0]
        at += pm[pid][1]
    total = am
    offsets = local_df(
        spark,
        offs, "_pid int, _om long, _ot long"
    )
    w = Window.partitionBy("_pid").orderBy(F.col("cnt").desc())
    c = ranged.join(F.broadcast(offsets), "_pid").select(
        "cnt",
        "n_terms",
        "mass",
        (F.col("_om") + F.sum("mass").over(w) - F.col("mass")).alias(
            "cum_mass"
        ),
        (F.col("_ot") + F.sum("n_terms").over(w) - F.col("n_terms")).alias(
            "cum_terms"
        ),
    )
    cov = local_df(
        spark,
        [(int(q), (total * int(q) + 99) // 100) for q in coverages_pct],
        "coverage_pct int, needed_tokens long",
    )
    picked = F.expr("(needed_tokens - cum_mass + cnt - 1) div cnt")
    return (
        c.crossJoin(F.broadcast(cov))
        .filter(
            (F.col("cum_mass") < F.col("needed_tokens"))
            & (F.col("cum_mass") + F.col("mass") >= F.col("needed_tokens"))
        )
        .select(
            "coverage_pct",
            "needed_tokens",
            (F.col("cum_terms") + picked).cast("bigint").alias("vocab_size"),
            F.col("cnt").alias("cutoff_cnt"),
            (F.col("cum_mass") + picked * F.col("cnt"))
            .cast("bigint")
            .alias("covered_tokens"),
        )
    )


def ngram_diversity(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-n diversity per ``by`` group: distinct n-grams / total
    n-grams for each requested n — the standard generation-diversity
    metric (a synthetic-transcript source whose distinct-2/3 ratios
    collapse is mode-collapsed long before per-doc repetition flags
    fire, because the repeats live ACROSS documents).

    One tiny totals agg (all ns in one scan, groupBy(by) with one sum
    per n) reused by every leg via localCheckpoint; per n, corpus
    distinct counts ride the X21 discipline — per-doc ``array_distinct``
    BEFORE the explode (an in-doc repeat never crosses the wire) and
    60-bit md5-prefix ints in the (by, hash) exchange, which partial-agg
    collapses to per-partition-distinct pairs. NULL text is excluded on
    both engines (greatest/NULL semantics differ cross-engine —
    filtering is the deterministic spelling).

    Returns (by, n, total_grams, distinct_grams, distinct_ratio) with
    the ratio rounded 6 dp; groups with no n-grams (every doc shorter
    than n) carry 0 distinct and NULL ratio."""
    from ocsf_validator_spark.pipeline.decontam import _gram_hashes

    ns = tuple(int(n) for n in ns)
    if not ns or any(n < 1 for n in ns):
        raise ValueError("ns must be positive ints")
    toks = f"split({text_col}, ' ')"
    base = df.filter(F.col(text_col).isNotNull())
    totals = (
        base.groupBy(by)
        .agg(
            *[
                F.sum(
                    F.expr(f"greatest(size({toks}) - {n - 1}, 0)")
                ).alias(f"_t{n}")
                for n in ns
            ]
        )
        .localCheckpoint(eager=False)
    )
    legs = []
    for n in ns:
        d = (
            base.select(
                F.col(by),
                F.explode(F.expr(_gram_hashes(text_col, n))).alias("_g"),
            )
            .groupBy(by, "_g")
            .agg(F.lit(1))
            .groupBy(by)
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        legs.append(
            totals.select(
                F.col(by),
                F.lit(n).alias("n"),
                F.col(f"_t{n}").cast("bigint").alias("total_grams"),
            )
            .join(d, by, "left")
            .select(
                by,
                "n",
                "total_grams",
                F.coalesce(F.col("_d"), F.lit(0))
                .cast("bigint")
                .alias("distinct_grams"),
                F.round(
                    F.try_divide(
                        F.coalesce(F.col("_d"), F.lit(0)).cast("double"),
                        F.col("total_grams"),
                    ),
                    6,
                ).alias("distinct_ratio"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    PMI = ln(p(ab) / (p(a)·p(b))) — the corpus-analysis op that
    surfaces multiword units ("new york", tool-call idioms) and, on
    synthetic transcripts, template glue whose components never occur
    apart. ``min_count`` suppresses the rare-pair PMI explosion (a
    pair seen once between two hapaxes maxes the score).

    Scale discipline: unigram and bigram counts are keyed on 60-bit
    md5-prefix hashes (8-byte ints in every exchange, X19/X15); the
    bigram rows carry their component hashes computed map-side, so the
    two unigram joins are hash-keyed equi-joins, never string joins;
    totals broadcast as 1-row frames; the top-k over (pmi DESC, hb ASC)
    is TakeOrderedAndProject; the k winning STRINGS are recovered in
    the ngram_topk bounded second pass (per-doc DISTINCT pairs probed
    against the broadcast winner set, min(gram) per hash) — bigram
    strings cross only for the k winners.

    Determinism: pmi = round(ln((cnt·T·T)/(TB·c1·c2)), 6) with the
    exact same double expression tree on both engines, hb tie-break on
    the selection (X19 trick); presentation is (pmi DESC, bigram ASC).

    Returns (bigram, n_pair, n_left, n_right, pmi).
    """
    # bind the token array ONCE per row: expressions inside higher-order
    # lambdas re-evaluate their free subexpressions per ELEMENT, so a
    # split() referenced inside transform() is O(tokens^2) string work
    # per document — projecting _tk first makes every stream O(tokens)
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.expr(f"split({text_col}, ' ')").alias("_tk")
    )
    toks = "_tk"
    gram = f"concat_ws(' ', slice({toks}, i, 2))"
    # ONE tokenize+hash scan for BOTH count streams. The bigram stream
    # already binds the per-row token-hash array hs once via bind1
    # (element_at(hs, i) == md5_60(element_at(tk, i)) value-for-value),
    # so the unigram stream rides the SAME exploded pass as kind-0
    # entries over hs instead of re-scanning + re-hashing every token
    # in a second full pass (was: uni scan n md5 + bi scan (2n-1) md5 =
    # 3n-1 md5 and two tokenize scans; now: 2n-1 md5, one scan). The
    # grouped counts are identical — same keys, same occurrences — and
    # one lazily checkpointed frame serves every downstream consumer
    # (tot, tb, the two unigram join legs, the top-k selection).
    from ocsf_validator_spark.pipeline.decontam import bind1

    comb_body = (
        f"concat("
        f"transform(hs, h -> named_struct("
        f"'k', 0, 'hb', h, "
        f"'h1', CAST(NULL AS BIGINT), 'h2', CAST(NULL AS BIGINT))), "
        f"case when size({toks}) >= 2 then "
        f"transform(sequence(1, size({toks}) - 1), i -> named_struct("
        f"'k', 1, 'hb', {_MD5_60.format(x=gram)}, "
        f"'h1', element_at(hs, i), "
        f"'h2', element_at(hs, i + 1))) "
        f"else array() end)"
    )
    comb = bind1(
        comb_body,
        f"transform({toks}, t -> {_MD5_60.format(x='t')})",
        "hs",
    )
    counts = (
        base.select(F.explode(F.expr(comb)).alias("b"))
        .groupBy("b.k", "b.hb", "b.h1", "b.h2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    uni = counts.filter(F.col("k") == 0).select("hb", "c").select(
        F.col("hb").alias("_h"), "c"
    )
    tot = uni.agg(F.sum("c").cast("double").alias("_T"))
    bi = counts.filter(F.col("k") == 1).select(
        "hb", "h1", "h2", F.col("c").alias("n_pair")
    )
    tb = bi.agg(F.sum("n_pair").cast("double").alias("_TB"))
    u1 = uni.select(F.col("_h").alias("h1"), F.col("c").alias("n_left"))
    u2 = uni.select(F.col("_h").alias("h2"), F.col("c").alias("n_right"))
    top = (
        bi.filter(F.col("n_pair") >= min_count)
        .join(u1, "h1")
        .join(u2, "h2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tb))
        .select(
            "hb",
            "n_pair",
            "n_left",
            "n_right",
            F.round(
                F.expr(
                    "ln((cast(n_pair as double) * _T * _T) / "
                    "(_TB * cast(n_left as double) * "
                    "cast(n_right as double)))"
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("hb").asc())
        .limit(k)
    )
    # collect the k winners (tiny — the selection above is already a
    # TakeOrderedAndProject) and push their hash set into the recovery
    # pass as a LITERAL in-list filter applied before the distinct /
    # explode: the former join-based probe exploded every distinct
    # bigram of the corpus to discard all but k; now non-winning
    # positions drop inside the per-row transform and only winner
    # structs are distinct'd and exploded. Same probe rows reach the
    # same min(bigram) recovery, so the output is unchanged.
    spark = df.sparkSession
    top_rows = top.collect()
    out_schema = (
        "bigram string, n_pair bigint, n_left bigint, n_right bigint, "
        "pmi double"
    )
    if not top_rows:
        return local_df(spark, [], out_schema)
    win_list = ",".join(str(int(r["hb"])) for r in top_rows)
    top_df = local_df(
        spark,
        [
            (r["hb"], r["n_pair"], r["n_left"], r["n_right"], r["pmi"])
            for r in top_rows
        ],
        "hb bigint, n_pair bigint, n_left bigint, n_right bigint, pmi double",
    )
    pairs = (
        f"case when size({toks}) >= 2 then "
        f"array_distinct(filter(transform(sequence(1, size({toks}) - 1), "
        f"i -> struct({_MD5_60.format(x=gram)} as hb, {gram} as bigram)), "
        f"p -> p.hb in ({win_list}))) "
        f"else array() end"
    )
    probes = base.select(F.explode(F.expr(pairs)).alias("p")).select(
        "p.hb", "p.bigram"
    )
    return (
        probes.join(F.broadcast(top_df), "hb")
        .groupBy("hb", "n_pair", "n_left", "n_right", "pmi")
        .agg(F.min("bigram").alias("bigram"))
        .select("bigram", "n_pair", "n_left", "n_right", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
    )


def posting_lists(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Capped inverted index: per term, the document frequency and the
    ``k`` smallest doc_ids holding it — the search-index build step
    (and the debugging view behind X15's membership probes: WHICH
    documents carry a flagged gram).

    The naive ``groupBy(term).collect_list(doc)`` builds one unbounded
    list per term — a stopword's postings are corpus-sized and its
    group is the classic single-reducer straggler. Two SQL-only stages
    instead: stage 1 groups by (term-hash, ORIGIN PARTITION) — the
    salt-by-provenance trick — so a hot term splits across as many
    reducers as input partitions, each emitting its LOCAL k smallest
    doc_ids (per-group state bounded by that partition's rows, output
    collapse-proportional at k×partitions per term); stage 2 merges the
    bounded k-lists (flatten → sort → slice k), exactly equal to the
    global k smallest because a doc_id outside its partition's local
    top-k is outside the global top-k a fortiori. Per-doc terms are
    array_distinct'ed BEFORE the explode (X21) so in-doc repeats never
    cross the wire and count(*) IS the document frequency; term strings
    cross only as one min(term) per (hash, partition) group.

    Returns (term, df_docs, top_docs) — deterministic: min-string term
    per hash, doc_ids ascending."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = f"split({text_col}, ' ')"
    pairs = f"array_distinct(transform({toks}, t -> named_struct(" \
            f"'h', {_MD5_60.format(x='t')}, 'term', t)))"
    stage1 = (
        df.filter(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("_d"), F.explode(F.expr(pairs)).alias("p"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("p.h", "_pid")
        .agg(
            F.min("p.term").alias("_term"),
            F.count(F.lit(1)).alias("_c"),
            F.expr(f"slice(array_sort(collect_list(_d)), 1, {k})").alias(
                "_docs"
            ),
        )
    )
    return (
        stage1.groupBy("h")
        .agg(
            F.min("_term").alias("term"),
            F.sum("_c").alias("df_docs"),
            F.expr(
                f"slice(array_sort(flatten(collect_list(_docs))), 1, {k})"
            ).alias("top_docs"),
        )
        .select("term", "df_docs", "top_docs")
    )


def source_vocab_overlap(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Source-pair vocabulary Jaccard matrix — corpus cartography:
    which sources speak the same language (near-identical vocabularies
    flag a mirror or a shared template; disjoint ones flag a mix whose
    slices can't substitute for each other).

    The naive spelling self-joins the (term, source) stream on term —
    quadratic per hot term. Instead: distinct (60-bit term-hash,
    source) pairs via ONE partial-agg exchange, then per-hash
    ``collect_set(source)`` (state bounded by the GROUP COUNT, not the
    corpus), sorted and expanded map-side into ordered pairs with an
    index-windowed transform — pair volume is co-occurrence-
    proportional and bounded by |groups|² per term. Per-source vocab
    sizes ride the SAME distinct-pair frame (localCheckpoint'd); the
    report join broadcasts the tiny size frame.

    Returns (src_a, src_b, shared_terms, vocab_a, vocab_b, jaccard)
    for pairs sharing at least one term, src_a < src_b; jaccard =
    exact-count ratio rounded 6 dp. NULL text/group excluded."""
    pairs = (
        df.filter(F.col(text_col).isNotNull() & F.col(by).isNotNull())
        .select(
            F.col(by).cast("string").alias("_s"),
            F.explode(
                F.expr(
                    f"array_distinct(transform(split({text_col}, ' '), "
                    f"t -> {_MD5_60.format(x='t')}))"
                )
            ).alias("_h"),
        )
        .groupBy("_h", "_s")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
        .localCheckpoint(eager=False)
    )
    sizes = pairs.groupBy("_s").agg(F.count(F.lit(1)).alias("_n"))
    expand = (
        "flatten(transform(_set, (x, i) -> "
        "transform(slice(_set, i + 2, size(_set)), "
        "y -> named_struct('a', x, 'b', y))))"
    )
    inter = (
        pairs.groupBy("_h")
        .agg(F.array_sort(F.collect_set("_s")).alias("_set"))
        .select(F.explode(F.expr(expand)).alias("p"))
        .groupBy(
            F.col("p.a").alias("src_a"), F.col("p.b").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_terms"))
    )
    va = sizes.select(F.col("_s").alias("src_a"), F.col("_n").alias("vocab_a"))
    vb = sizes.select(F.col("_s").alias("src_b"), F.col("_n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_terms",
            "vocab_a",
            "vocab_b",
            F.round(
                F.col("shared_terms")
                / (
                    F.col("vocab_a") + F.col("vocab_b")
                    - F.col("shared_terms")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average bigram-conditional negative log-probability
    — the KenLM-style perplexity filter one Markov order up from
    :func:`unigram_logprob_score`:

        score(d) = - sum_i ln( c(w_{i-1} w_i) / c_ctx(w_{i-1}) )
                   / (len(d) - 1)

    with c_ctx the context's corpus count AS a bigram start (the MLE
    conditional denominator, so p in (0, 1]). The corpus scores ITSELF,
    so every observed transition has count >= 1 — no backoff or
    smoothing enters, and the score is a pure function of exact corpus
    counts. Templated/boilerplate text scores near 0 (every transition
    memorized); unigram-plausible but transition-scrambled text (shuffled
    words, model babble) scores HIGH — the failure mode the unigram
    filter is structurally blind to.

    Scale (the pmi_collocations discipline): the token array binds once
    per row, per-doc (bigram-hash, context-hash) tf rows carry 60-bit
    md5-prefix hashes computed MAP-SIDE pre-explode — 8-byte ints in
    every exchange, never gram strings — and the checkpointed tf frame
    feeds its three consumers (bigram counts, context counts, the
    per-doc reduction) without re-scanning the source. Both count
    joins are hash-keyed equi-joins. Docs with < 2 tokens have no
    transitions and drop (deterministic; mirror in any replay).

    Returns (id_col, n_bigrams, avg_neg_logprob) rounded to 6 dp,
    ordered by id."""
    toks = "_tk"
    gram = f"concat_ws(' ', slice({toks}, i, 2))"
    left = f"element_at({toks}, i)"
    pairs = (
        f"case when size({toks}) >= 2 then "
        f"transform(sequence(1, size({toks}) - 1), i -> named_struct("
        f"'hb', {_MD5_60.format(x=gram)}, "
        f"'hl', {_MD5_60.format(x=left)})) "
        f"else array() end"
    )
    tfb = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.expr(f"split({text_col}, ' ')").alias("_tk")
        )
        .select(F.col(id_col), F.explode(F.expr(pairs)).alias("_p"))
        .select(id_col, F.col("_p.hb").alias("hb"), F.col("_p.hl").alias("hl"))
        .groupBy(id_col, "hb", "hl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    cb = tfb.groupBy("hb").agg(F.sum("tf").alias("_cb"))
    cl = tfb.groupBy("hl").agg(F.sum("tf").alias("_cl"))
    return (
        tfb.join(cb, "hb")
        .join(cl, "hl")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.col("tf")
                    * F.log(
                        F.col("_cb").cast("double")
                        / F.col("_cl").cast("double")
                    )
                )
                / F.sum("tf"),
                6,
            ).alias("avg_neg_logprob"),
        )
        .orderBy(id_col)
    )
