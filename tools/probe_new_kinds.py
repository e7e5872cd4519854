"""Round-5 session probe: the new constraint kinds must ride the fused
passes at ~zero marginal cost. Runs the FULL runner at N turns in three
suite variants, same input, separate steady-state measurements:

- base            — transcript_suite() as shipped
- extended        — + Alternation (one more lag on the fused window),
                    + Check (one more leg in the fused row projection),
                    + 2 piggybacked MetricBounds (null_rate + min ride
                    the stats scan's merge_aggs — zero extra jobs)
- extended_distinct — extended + a distinct_count MetricBound (the one
                    metric with no mergeable per-bucket form: expected
                    to cost exactly one extra narrow agg job)

Usage:
    python tools/probe_new_kinds.py --input /tmp/scaling16m \
        [--cores 8] [--runs 3]
    (generate the input once with --gen-turns 16000000)

Prints one JSON line with wall + phase medians per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ocsf_validator_spark.synth import synth_transcripts
    n = int(sys.argv[1]); out = sys.argv[2]
    synth_transcripts(spark, n_turns=n, seed=42).write.mode(
        "overwrite"
    ).parquet(out)
    print("wrote", n)
    """
)

CHILD = textwrap.dedent(
    """
    import gc, json, sys, time
    sys.path.insert(0, {repo!r})
    cores = int(sys.argv[1]); inp = sys.argv[2]; runs = int(sys.argv[3])
    variant = sys.argv[4]
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{{cores}}]")
        .appName(f"new-kinds-probe-{{variant}}")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.driver.memory", f"{{8 + 2 * cores}}g")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={{cores}}",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ocsf_validator_spark.runner import run_validation
    from ocsf_validator_spark.spec import (
        Alternation, Check, MetricBound, transcript_suite,
    )
    def build_suite():
        s = transcript_suite()
        if variant == "base":
            return s
        s.add(
            Alternation(column="role", scope=("assistant",)),
            Check(
                column="pairing",
                predicate="NOT (role = 'tool' AND tool = 'none')",
                id_override="check.pairing",
            ),
            MetricBound(column="role", metric="null_rate", hi=0.0001),
            MetricBound(column="turn_idx", metric="min", lo=0),
        )
        if variant == "extended_distinct":
            s.add(
                MetricBound(
                    column="conv_id", metric="distinct_count", lo=1
                )
            )
        return s
    df = spark.read.parquet(inp)
    n = df.count()
    walls, phases, nviol = [], [], None
    for i in range(runs + 1):  # 1 warmup
        t0 = time.time()
        res = run_validation(spark, df, suite=build_suite(), quiet=True)
        w = time.time() - t0
        if i > 0:
            walls.append(w); phases.append(res.timings)
            nviol = res.n_violations
        sys.stderr.write(f"  {{variant}} run {{i}}: {{w:.1f}}s\\n")
        sys.stderr.flush()
        gc.collect(); spark._jvm.System.gc(); time.sleep(2)
    print(json.dumps({{"walls": walls, "phases": phases, "n_rows": n,
                       "n_violations": nviol}}))
    """
)


def run_variant(cores: int, inp: str, runs: int, variant: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), inp, str(runs), variant],
        capture_output=True, text=True, cwd=REPO,
    )
    for line in out.stderr.splitlines():
        if line.startswith("  "):
            print(line, file=sys.stderr)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"{variant} probe failed")
    r = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    keys = r["phases"][0].keys()
    return {
        "walls_sec": [round(w, 2) for w in r["walls"]],
        "median_sec": round(statistics.median(r["walls"]), 2),
        "n_rows": r["n_rows"],
        "n_violations": r["n_violations"],
        "phase_median_sec": {
            k: round(statistics.median(p.get(k, 0.0) for p in r["phases"]), 2)
            for k in keys
        },
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--gen-turns", type=int, default=0,
                   help="generate the input first with this many turns")
    args = p.parse_args()
    if args.gen_turns:
        print(f"generating {args.gen_turns} turns...", file=sys.stderr)
        g = subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO),
             str(args.gen_turns), args.input],
            capture_output=True, text=True, cwd=REPO,
        )
        if g.returncode != 0:
            sys.stderr.write(g.stderr[-3000:])
            raise RuntimeError("generation failed")
    out = {}
    for variant in ("base", "extended", "extended_distinct"):
        print(f"running {variant} x{args.runs} (+1 warmup)...",
              file=sys.stderr)
        out[variant] = run_variant(args.cores, args.input, args.runs, variant)
    b, e = out["base"]["median_sec"], out["extended"]["median_sec"]
    out["extended_over_base"] = round(e / b, 4)
    out["distinct_over_extended"] = round(
        out["extended_distinct"]["median_sec"] / e, 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
