"""Checkpoint-resume semantics (north_rule: resumable from the last
committed checkpoint; SURVEY.md §5.2 item 4: idempotent resume)."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pytest

from pipeline.io import StageRunner, is_committed
from pipeline.linkage import run_staged


def _content_hash(df) -> list[tuple]:
    pdf = df.toPandas()
    return sorted(map(tuple, pdf.astype(str).values))


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "stages")


def test_stage_runner_skips_committed(spark, tmp_path):
    calls = {"n": 0}
    runner = StageRunner(spark, str(tmp_path), fingerprint="v1")

    def build():
        calls["n"] += 1
        return spark.range(10)

    a = runner.run("s1", build)
    assert calls["n"] == 1 and a.count() == 10

    runner2 = StageRunner(spark, str(tmp_path), fingerprint="v1")
    b = runner2.run("s1", build)
    assert calls["n"] == 1, "committed stage must not rebuild"
    assert b.count() == 10
    assert runner2.metrics[0]["resumed"] is True


def test_fingerprint_mismatch_rebuilds(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    StageRunner(spark, str(tmp_path), fingerprint="v1").run("s", build)
    StageRunner(spark, str(tmp_path), fingerprint="v2").run("s", build)
    assert calls["n"] == 2


def test_kill_and_resume_identical_output(spark, turns_df, out_dir):
    """Run stages 1-2, simulate a crash (wipe later stages), rerun: final
    clusters content-identical to an uninterrupted run."""
    full_dir = out_dir + "_full"
    out_full = run_staged(spark, turns_df, full_dir)
    want = _content_hash(out_full["clusters"])

    # partial run: copy the first two committed stages only ("crash" after
    # features), then resume
    os.makedirs(out_dir)
    for stage in ["docs", "features"]:
        shutil.copytree(
            os.path.join(full_dir, stage), os.path.join(out_dir, stage)
        )
    assert is_committed(os.path.join(out_dir, "docs"))

    out_resumed = run_staged(spark, turns_df, out_dir)
    got = _content_hash(out_resumed["clusters"])
    assert got == want

    resumed_stages = [
        m["stage"] for m in out_resumed["_runner"].metrics if m.get("resumed")
    ]
    assert "docs" in resumed_stages and "features" in resumed_stages


def test_half_written_stage_is_invisible(spark, tmp_path):
    """A stage directory without a manifest (killed mid-write) is rebuilt."""
    d = str(tmp_path / "s1")
    os.makedirs(d)
    with open(os.path.join(d, "part-00000.parquet"), "w") as f:
        f.write("garbage")
    assert not is_committed(d)
    runner = StageRunner(spark, str(tmp_path), fingerprint="v1")
    out = runner.run("s1", lambda: spark.range(3))
    assert out.count() == 3


def test_audit_sample_seam(spark, turns_df, tmp_path):
    """run_staged(audit_sample_rate=r): clusters are IDENTICAL to the
    full run (the match_only fast path is provably the same match set),
    the audit tables are computed on a deterministic pair sample and
    carry the sample_rate label, and the sampled pair count is ~r of the
    full pair table."""
    full = run_staged(spark, turns_df, str(tmp_path / "full"))
    sampled = run_staged(
        spark, turns_df, str(tmp_path / "sampled"), audit_sample_rate=0.25
    )

    assert _content_hash(full["clusters"]) == _content_hash(
        sampled["clusters"]
    )

    tiers = sampled["tier_histogram"].toPandas()
    assert (tiers["sample_rate"] == 0.25).all()
    summary = sampled["match_summary"].toPandas()
    assert (summary["sample_rate"] == 0.25).all()
    n_full = full["pairs"].count()
    n_sampled = int(summary["pairs_scored"].iloc[0])
    assert 0 < n_sampled < n_full
    # the scored stage kept only matches (edge list), all of them real
    sc = sampled["scored"].toPandas()
    assert sc["is_match"].all()
    # deterministic: rerun from scratch gives the same sample
    shutil.rmtree(str(tmp_path / "sampled"))
    again = run_staged(
        spark, turns_df, str(tmp_path / "sampled"), audit_sample_rate=0.25
    )
    assert int(
        again["match_summary"].toPandas()["pairs_scored"].iloc[0]
    ) == n_sampled


def test_no_resume_recomputes_without_deleting(spark, tmp_path):
    """Round-5 review fix: --no-resume used to rmtree the whole output
    directory — destroying any NON-stage artifacts living next to the
    stage tables (e.g. committed incremental state). StageRunner
    resume=False must recompute + overwrite-commit every stage and
    leave foreign files untouched."""
    import os

    from pipeline.io import StageRunner

    out = str(tmp_path)
    # a foreign artifact sharing the output dir
    foreign = os.path.join(out, "committed_state.txt")
    with open(foreign, "w") as f:
        f.write("precious")

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).toDF("v")

    StageRunner(spark, out, fingerprint="v1").run("s", build)
    assert calls["n"] == 1
    # resume=True skips; resume=False recomputes in place
    StageRunner(spark, out, fingerprint="v1").run("s", build)
    assert calls["n"] == 1
    r = StageRunner(spark, out, fingerprint="v1", resume=False)
    got = r.run("s", build)
    assert calls["n"] == 2
    assert got.count() == 3
    assert r.metrics[-1]["resumed"] is False
    with open(foreign) as f:
        assert f.read() == "precious"


def test_changed_input_invalidates_resume(spark, tmp_path):
    """Same out_dir, same config, DIFFERENT input: resume must recompute,
    not serve the previous input's committed stages (round-5 review —
    the fingerprint used to cover config only, so `main.py --input
    day2.parquet` against day1's out_dir silently reported day1)."""
    import main as cli

    out = str(tmp_path / "stages")
    r1 = cli.main(
        ["--synthetic", "20", "--seed", "1", "--output", out,
         "--master", "local[4]"]
    )
    # same invocation resumes
    r2 = cli.main(
        ["--synthetic", "20", "--seed", "1", "--output", out,
         "--master", "local[4]"]
    )
    assert all(s.get("resumed") for s in r2["stages"] if "resumed" in s)
    assert r2["docs"] == r1["docs"]
    # different synthetic input (same config): every stage recomputes
    r3 = cli.main(
        ["--synthetic", "30", "--seed", "2", "--output", out,
         "--master", "local[4]"]
    )
    assert not any(s.get("resumed") for s in r3["stages"]), r3["stages"]
    assert r3["docs"] != r1["docs"], "stale stages served for new input"

    # parquet-input path: touching the file invalidates too
    from pipeline import synth

    src = str(tmp_path / "pq")
    synth.write_parquet(synth.generate(n_base=15, seed=3), src)
    turns_pq = os.path.join(src, "turns.parquet")
    out2 = str(tmp_path / "stages_pq")
    p1 = cli.main(["--input", turns_pq, "--output", out2,
                   "--master", "local[4]"])
    p2 = cli.main(["--input", turns_pq, "--output", out2,
                   "--master", "local[4]"])
    assert all(s.get("resumed") for s in p2["stages"] if "resumed" in s)
    # rewrite the input with different data -> recompute
    synth.write_parquet(synth.generate(n_base=25, seed=4), src)
    p3 = cli.main(["--input", turns_pq, "--output", out2,
                   "--master", "local[4]"])
    assert not any(s.get("resumed") for s in p3["stages"]), p3["stages"]
    assert p3["docs"] != p1["docs"]
