from __future__ import annotations

import os

from ocsf_validator_spark import checkpoint as ckpt
from ocsf_validator_spark.runner import run_validation
from ocsf_validator_spark.spec import transcript_suite
from ocsf_validator_spark.synth import synth_transcripts


def test_run_validation_end_to_end(spark, transcripts, tmp_path):
    res = run_validation(
        spark,
        transcripts,
        num_buckets=8,
        quiet=True,
        violations_out=str(tmp_path / "viol"),
    )
    assert res.exit_code == 1  # fixture has ERROR-level defects
    assert res.n_rows == transcripts.count()
    assert res.n_violations > 5
    written = spark.read.parquet(str(tmp_path / "viol"))
    assert written.count() > 5


def test_fatal_schema_aborts(spark, transcripts):
    bad = transcripts.drop("conv_id")  # required column missing → FATAL
    res = run_validation(spark, bad, num_buckets=8, quiet=True)
    assert res.exit_code == 2
    assert res.n_rows == 0  # aborted before any data pass


def test_checkpoint_resume(spark, tmp_path):
    manifest = str(tmp_path / "manifest")
    df = synth_transcripts(spark, n_turns=5000, seed=42)
    r1 = run_validation(
        spark, df, num_buckets=16, quiet=True,
        checkpoint_dir=manifest, snapshot_id="snapA",
    )
    assert r1.exit_code in (0, 1)
    assert r1.manifest_entries, "first run must write manifest entries"
    n_buckets_done = len(
        ckpt.completed_buckets(manifest, transcript_suite().version(), "snapA")
    )
    assert n_buckets_done == len(r1.manifest_entries)

    # second run with same snapshot + suite: everything skipped
    r2 = run_validation(
        spark, df, num_buckets=16, quiet=True,
        checkpoint_dir=manifest, snapshot_id="snapA",
    )
    assert r2.skipped_buckets == n_buckets_done
    assert r2.n_rows == 0  # nothing pending

    # different snapshot → full re-run (stale lineage never matches)
    r3 = run_validation(
        spark, df, num_buckets=16, quiet=True,
        checkpoint_dir=manifest, snapshot_id="snapB",
    )
    assert r3.skipped_buckets == 0
    assert r3.n_rows == 5000


def test_checkpoint_partial_resume(spark, tmp_path):
    """Simulate a crashed run: manifest covers only some buckets; the
    resumed run must process exactly the pending rows."""
    manifest = str(tmp_path / "m2")
    df = synth_transcripts(spark, n_turns=5000, seed=42)
    suite = transcript_suite()
    r1 = run_validation(
        spark, df, num_buckets=16, quiet=True,
        checkpoint_dir=manifest, snapshot_id="s",
    )
    # drop half the manifest files to fake a partial run
    files = sorted(
        f for f in os.listdir(manifest) if f.endswith(".jsonl")
    )
    entries = ckpt.read_entries(manifest)
    keep = {e.bucket for e in entries[: len(entries) // 2]}
    for f in files:
        os.remove(os.path.join(manifest, f))
    ckpt.write_entries(manifest, [e for e in entries if e.bucket in keep])

    done = ckpt.completed_buckets(manifest, suite.version(), "s")
    assert done == keep
    pending_rows = 5000 - sum(e.n_rows for e in entries if e.bucket in keep)
    r2 = run_validation(
        spark, df, num_buckets=16, quiet=True,
        checkpoint_dir=manifest, snapshot_id="s",
    )
    assert r2.n_rows == pending_rows
    # after resume, all buckets are complete
    assert len(ckpt.completed_buckets(manifest, suite.version(), "s")) == 16


def test_cli_main(tmp_path):
    from ocsf_validator_spark.runner import main

    code = main(["--synth", "2000", "--buckets", "8"])
    assert code == 1  # synthetic defects present
