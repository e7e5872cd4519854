"""Round-5 worklist 9: run the FULL runner at 64M turns with the
bounded violation sink (--max-violation-rows) and quarantine routing
(--quarantine-out) LIVE, against the identical uncapped run, and report
both phase tables — evidence that the deterministic top-N cap and the
semi/anti quarantine split stay off the critical path at scale.

Usage (after generating the shared input once):
    python tools/probe_capped_sink.py --input /tmp/scaling64m \
        [--cores 8] [--runs 2]

Prints one JSON line: {"uncapped": {...}, "capped_quarantine": {...}}
with wall medians and per-phase medians for each variant.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import gc, json, shutil, sys, tempfile, time
    sys.path.insert(0, {repo!r})
    cores = int(sys.argv[1]); inp = sys.argv[2]; runs = int(sys.argv[3])
    capped = sys.argv[4] == "capped"
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{{cores}}]")
        .appName(f"capped-sink-probe-{{cores}}")
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
    df = spark.read.parquet(inp)
    n = df.count()
    walls, phases, nviol = [], [], None
    for i in range(runs + 1):  # 1 warmup (steady-state JIT from probe order)
        sink = tempfile.mkdtemp(prefix="probe-sink-")
        kw = {{}}
        if capped:
            kw = dict(
                violations_out=sink + "/viol",
                quarantine_out=sink + "/quar",
                max_violation_rows=1000,
            )
        t0 = time.time()
        res = run_validation(spark, df, quiet=True, **kw)
        w = time.time() - t0
        if i > 0:
            walls.append(w); phases.append(res.timings); nviol = res.n_violations
        sys.stderr.write(
            f"  {{'capped' if capped else 'uncapped'}} run {{i}}: "
            f"{{w:.1f}}s {{res.timings}}\\n"
        )
        sys.stderr.flush()
        shutil.rmtree(sink, ignore_errors=True)
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
    r = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
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
    p.add_argument("--runs", type=int, default=2)
    args = p.parse_args()
    out = {}
    for variant in ("uncapped", "capped"):
        print(f"running {variant} x{args.runs} (+1 warmup)...", file=sys.stderr)
        out["capped_quarantine" if variant == "capped" else variant] = (
            run_variant(args.cores, args.input, args.runs, variant)
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
