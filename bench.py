"""Benchmark runner — prints ONE JSON line.

  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_SYNTH_TURNS    synthetic transcript rows for the validation
                       throughput probe (default 2_000_000)
  BENCH_WARMUPS        un-timed warmup runs per query (default 2)
  BENCH_RUNS           timed runs per query, median reported (default 3)
  BENCH_SCALING=1      also run the two-parallelism scaling probe
                       (local[8] vs local[32] semantics via two runs at
                       different spark.default/shuffle parallelism —
                       see tools/bench_scaling.py for the full version
                       with separate JVMs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> int:
    """Execute the full plan without driver-side materialization cost."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth_turns = int(os.environ.get("BENCH_SYNTH_TURNS", "2000000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ocsf-validator-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent

    qs = ent.queries()
    bench_set = [
        "suite_violations",
        "suite_verdicts",
        "conversation_stats",
        "sessionize_events",
        "q1_pricing",
        "revenue_by_nation",
        "top_revenue_orders",
        "minhash_lsh_pairs",
        "text_profile",
        "ann_topk_cosine",
        "psi_value_drift",
    ]

    # warmup: JIT + parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    import gc
    import statistics

    def drain():
        # ContextCleaner hygiene: with a big heap no natural GC fires,
        # so shuffle state from prior queries accumulates and later
        # queries degrade (see tools/bench_scaling.py)
        gc.collect()
        spark._jvm.System.gc()

    # protocol (same discipline as tools/bench_scaling.py): per query,
    # N_WARM un-timed warmups (JIT + codegen caches) then N_TIMED timed
    # runs; report the MEDIAN and the spread. Round-2's single cold shot
    # per query could not tell a real 2x regression from cold-JIT noise
    # (BENCH_r01->r02 showed 3-5x "regressions" on unchanged code).
    n_warm = int(os.environ.get("BENCH_WARMUPS", "2"))
    n_timed = int(os.environ.get("BENCH_RUNS", "3"))

    # suite_verdicts consumes the violations pass the production runner
    # computes exactly once — mirror that by caching the violations
    # frame OUTSIDE the timed window, so the verdicts timing measures
    # the verdict aggregation, not a second full violations scan.
    # The cache is created LAZILY on suite_verdicts' first (warmup)
    # call: Spark's cache is keyed by logical plan, so caching up-front
    # would also serve suite_violations' own timed runs and fake that
    # number. bench_set orders suite_violations before suite_verdicts.
    _viol_box: dict = {}

    def _verdicts_reuse(s, d):
        if "v" not in _viol_box:
            _viol_box["v"] = ent.q_suite_violations(s, d).cache()
            _viol_box["v"].count()
        return ent.q_suite_verdicts(s, d, violations=_viol_box["v"])

    bench_callables = dict(qs)
    bench_callables["suite_verdicts"] = _verdicts_reuse

    def timed(run) -> tuple[float, float]:
        """The one warm/median protocol every timed section shares:
        n_warm un-timed executions, n_timed timed, (median, max-min).
        ``run`` must fully execute the work (queries wrap themselves
        in force())."""
        for _ in range(n_warm):
            run()
            drain()
        runs = []
        for _ in range(n_timed):
            t0 = time.time()
            run()
            runs.append(time.time() - t0)
            drain()
        return (
            round(statistics.median(runs), 3),
            round(max(runs) - min(runs), 3),
        )

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}

    # validation-throughput probe FIRST (the north rule's primary
    # metric: validated turns/sec) — measured in the freshest JVM
    # state. Round-5 lesson: run at the END of the query gauntlet this
    # probe read 7-11 s with a 7-14 s max-min spread from accumulated
    # JVM state / cleaner backlog, while an isolated session measures a
    # tight 3.4-4.6 s; the per-query timings below are unaffected (each
    # has its own warmups), but the headline throughput number deserves
    # the clean window.
    from ocsf_validator_spark.runner import run_validation
    from ocsf_validator_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_turns=synth_turns).cache()
    df.count()  # materialize outside the timed window
    validate_sec, validate_spread = timed(
        lambda: run_validation(spark, df, quiet=True)
    )
    timings["validate_synth"] = validate_sec
    spread["validate_synth"] = validate_spread
    turns_per_sec = synth_turns / validate_sec

    for name in bench_set:
        timings[name], spread[name] = timed(
            lambda name=name: force(bench_callables[name](spark, sf_dir))
        )
    if "v" in _viol_box:
        _viol_box["v"].unpersist()

    # round-4+ pipeline additions ride as their OWN field: the headline
    # total must stay key-comparable across rounds (same rationale as
    # layout_ab below). Same warm/median protocol.
    extra_set = [
        "dedup_corpus",
        "ngram_topk",
        "stratified_sample",
        "token_budget_select",
        "curation_pipeline",
        "repetition_profile",
        "decontam_overlap",
        "asof_latest_order",
        "range_attribution",
        "rollup_events",
        "salted_join_events",
        "star_revenue_region",
        # round-5 additions
        "tfidf_topterms",
        "strip_boilerplate",
        "exact_quantiles_value",
        "quantiles_by_event_type",
        "embedding_outliers",
        "unigram_logprob",
        "pack_sequences",
        "containment_pairs",
        "render_conversations",
        "plan_shards",
        "mad_outliers_value",
        "mad_outliers_by_type",
        "weighted_sample_docs",
        "pii_scrub_docs",
        "cluster_split_docs",
        "weighted_sample_by_lang",
        "role_transitions",
        "latency_quantiles",
        "embedding_health",
        "dedup_incremental",
        "near_dup_incremental",
        "precedence_purchase",
        "opening_role_events",
        "corpus_mix",
        "increment_drift",
        "chunk_documents",
        "epoch_shuffle",
        "vocab_coverage",
        "lang_mismatch",
        "gopher_rules",
        "ngram_diversity",
        "funnel_events",
        "cohort_retention",
        "turn_echo",
        "pmi_collocations",
        "winsorize_value",
        "normalize_docs",
        "posting_lists",
        "dup_rate_by_source",
        "source_vocab_overlap",
        "sliding_stats",
        "quantile_bin_value",
        "itemset_pairs",
        "centroid_drift",
        "robust_scale_value",
        "dup_spans_docs",
        "strip_dup_spans",
        "alternation_roles",
        "semdedup_docs",
        "check_rows_events",
        "metric_bounds_events",
        "tokenizer_fertility",
        "label_balance",
        "bpe_token_stats",
        "mix_sample_docs",
        "conv_dedup",
        "quality_logit",
        "ann_topk_int8",
        "fd_documents",
        "column_topk",
        "volume_anomaly",
        "emd_value_drift",
        "bigram_logprob",
        "verdict_diff",
        "quantile_bounds",
        "worst_conversations",
        "split_leakage",
        "volume_gate",
        "drift_gate",
        "unicode_sanity",
        "group_metric",
        "loop_detector",
        "closing_role",
    ]
    extra_timings: dict[str, float] = {}
    for name in extra_set:
        if name in qs:
            extra_timings[name], _ = timed(
                lambda name=name: force(qs[name](spark, sf_dir))
            )

    # layout A/B on the SAME on-disk data (validate_synth above times
    # pure compute over a cached df; this pair times the deployment
    # shapes): flat parquet dir — scan + conv_id shuffle — vs the table
    # bucketed by conv_id, where the fused suite plans with zero
    # Exchange (sources.write_bucketed). Layout writes are outside the
    # timed window — the one-time ingest cost the layout amortizes.
    # NOT in timings: the headline total must stay key-comparable
    # across rounds — these ride as their own fields.
    import shutil
    import tempfile

    from ocsf_validator_spark.sources import write_bucketed

    tbl = "bench_transcripts_bucketed"
    flat_dir = tempfile.mkdtemp(prefix="bench-flat-") + "/transcripts"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(df, tbl, num_buckets=cpus)
    df.repartition(cpus).write.parquet(flat_dir)
    df.unpersist()

    def timed_validate(vdf) -> float:
        return timed(lambda: run_validation(spark, vdf, quiet=True))[0]

    flat_sec = timed_validate(spark.read.parquet(flat_dir))
    bucketed_sec = timed_validate(spark.table(tbl))
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(os.path.dirname(flat_dir), ignore_errors=True)

    # HOST CALIBRATION: the sandbox VM's effective CPU drifts across
    # hours (hypervisor throttling — identical code has measured
    # 1.2-1.35x slower across windows). This fixed, engine-independent
    # probe (JVM hash loop over range(400M), plan-stable, no IO/shuffle)
    # gives each round's JSON a denominator: to compare rounds, divide
    # query times by (host_calibration_sec / reference round's value).
    from pyspark.sql import functions as F

    cal_runs = []
    for i in range(n_timed + 1):
        t0 = time.time()
        spark.range(2_000_000_000).select(
            # % 1000 bounds the sum (ANSI mode: raw 64-bit hash sums overflow)
            F.sum(F.xxhash64("id") % 1000)
        ).collect()
        if i > 0:  # first is warmup
            cal_runs.append(time.time() - t0)
        drain()
    host_cal = round(statistics.median(cal_runs), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "validated_turns_per_sec": round(turns_per_sec, 1),
        "layout_ab_validate_sec": {
            "flat_parquet": round(flat_sec, 3),
            "bucketed_table": round(bucketed_sec, 3),
        },
        "validated_turns_per_sec_bucketed": round(
            synth_turns / bucketed_sec, 1
        ),
        "extra_queries": extra_timings,
        "synth_turns": synth_turns,
        "cpus": cpus,
        "protocol": f"{n_warm} warmups + {n_timed} timed, median",
        "spread_max_minus_min": spread,
        "host_calibration_sec": host_cal,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
