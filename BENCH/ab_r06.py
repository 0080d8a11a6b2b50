"""Interleaved code-state A/B for the round-6 optimizations.

Single bench runs on this VM drift 2x intra-hour (BENCH/vm_health.md),
so the round-6 before/after claim is settled the same way round 3's
kernel question was (BENCH/ab_kernels.py): the round-6 START tree
(commit 21cdec3, checked out as a git worktree) and HEAD run the SAME
probes from BENCH/ab_r06_runner.py in alternating fresh subprocesses
(ABBA order so monotone drift biases neither side), on the same VM
window. Only the ``pipeline`` package differs between legs.

Decision rule: a delta counts only if it exceeds each side's own
max-min repeat spread.

Writes BENCH/ab_r06.json + BENCH/ab_r06.md.

Usage: python BENCH/ab_r06.py [repeats] [baseline_commit]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_COMMIT = "21cdec3"
BASE_TREE = os.path.join(REPO, ".ab_r06")
RUNNER = os.path.join(REPO, "BENCH", "ab_r06_runner.py")
PROBES = ["featurize_s", "ring_steady_s", "step_s", "cc_tail_s"]


def ensure_worktree(commit: str) -> None:
    if os.path.isdir(BASE_TREE):
        remove_worktree()
    subprocess.run(
        ["git", "worktree", "add", "--detach", BASE_TREE, commit],
        cwd=REPO, check=True, capture_output=True,
    )


def remove_worktree() -> None:
    subprocess.run(
        ["git", "worktree", "remove", "--force", BASE_TREE],
        cwd=REPO, capture_output=True,
    )


def run_leg(tree: str, cpus: int = 32) -> dict:
    env = dict(os.environ, PYTHONPATH=tree, AB_CPUS=str(cpus))
    cmd = [sys.executable, RUNNER]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, cwd=tree, capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        raise RuntimeError(f"leg failed ({tree}): {out.stderr[-2000:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["pipeline_file"].startswith(tree), rec["pipeline_file"]
    return rec


def main() -> dict:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    commit = sys.argv[2] if len(sys.argv) > 2 else BASE_COMMIT
    ensure_worktree(commit)
    sides = {"round_start": BASE_TREE, "head": REPO}
    runs: dict[str, list[dict]] = {s: [] for s in sides}
    try:
        order = list(sides)
        for i in range(repeats):
            legs = order if i % 2 == 0 else order[::-1]
            for side in legs:
                rec = run_leg(sides[side])
                runs[side].append(rec)
                print(
                    f"[ab-r06] {side}: "
                    + " ".join(f"{p}={rec[p]}" for p in PROBES),
                    file=sys.stderr,
                )
    finally:
        remove_worktree()

    def stats(recs: list[dict], probe: str) -> dict:
        xs = [r[probe] for r in recs]
        return {
            "repeats": xs,
            "median": round(statistics.median(xs), 3),
            "best": min(xs),
            "spread": round(max(xs) - min(xs), 3),
        }

    report: dict = {
        "baseline_commit": commit,
        "generated_utc": datetime.now(timezone.utc).isoformat(),
        "repeats": repeats,
        "probes": {},
    }
    md = [
        "# ab_r06 — round-6 optimizations, interleaved code-state A/B",
        "",
        f"round_start = commit `{commit}` (worktree) vs head, {repeats}x "
        "ABBA-interleaved fresh-subprocess legs, local[32], sf0.1. "
        "best = min over repeats (the drift-robust statistic); a delta "
        "counts only if it exceeds both sides' own repeat spreads.",
        "",
        "| probe | round_start best (med) | head best (med) | delta best | side spreads |",
        "|---|---|---|---|---|",
    ]
    for p in PROBES:
        a = stats(runs["round_start"], p)
        b = stats(runs["head"], p)
        delta = (b["best"] - a["best"]) / a["best"] * 100 if a["best"] else 0.0
        report["probes"][p] = {"round_start": a, "head": b,
                               "delta_best_pct": round(delta, 1)}
        md.append(
            f"| {p} | {a['best']} ({a['median']}) | {b['best']} "
            f"({b['median']}) | {delta:+.1f}% | {a['spread']} / {b['spread']} |"
        )
    rp = [r["ring_pairs_per_sec"] for r in runs["round_start"]]
    hp = [r["ring_pairs_per_sec"] for r in runs["head"]]
    report["ring_pairs_per_sec"] = {"round_start": rp, "head": hp}
    md += [
        "",
        f"ring pairs/s: round_start {rp} vs head {hp}",
    ]
    with open(os.path.join(REPO, "BENCH", "ab_r06.json"), "w") as f:
        json.dump(report, f, indent=1)
    with open(os.path.join(REPO, "BENCH", "ab_r06.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
