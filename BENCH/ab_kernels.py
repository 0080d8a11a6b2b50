"""Same-session interleaved A/B: r2 per-pair kernels vs HEAD batch kernels.

Round-3 VERDICT task 1: the driver's single-shot r3 bench showed saturated
scoring at 48.1k pairs/s vs r2's 64.6k (-25.6%), on a VM with documented
same-code drift of 62.6k-81.4k — no A/B of the two CODE STATES existed.
This script settles it: within ONE session (same VM window, interleaved
legs so drift hits both sides equally), it benches the saturated
mixed-roles ring against

  * **r2**  — commit 8e5af82 (per-pair kernels), checked out as a git
              worktree under .ab_r2/ (removed after the run), and
  * **head** — the current tree (numpy batch kernels),

each leg a fresh subprocess (fresh JVM) running BENCH/ab_runner.py with
PYTHONPATH/cwd pointed at that tree, CPU-pinned via taskset. Both legs
score the IDENTICAL ring built by the runner (current methodology, mixed
roles) — the input, warmup and measurement are shared code; only the
``pipeline`` package under test differs.

Levels: local[32] (pinned 0-31) and one 4-core executor (local[4],
pinned 0-3) — per the verdict's ask. Ring size scales with cores
(600k pairs at 32, 75k at 4) so each leg is ~equal wall time per core;
sides are only ever compared WITHIN a level.

Repeats: >=3 per side per level, interleaved ABBA to cancel slow drift.
Decision rule (verdict): the r2-vs-head delta must exceed the measured
same-code variance (max-min spread of each side's own repeats).

Writes BENCH/ab_kernels.json + BENCH/ab_kernels.md; bench.py appends the
md summary into BENCH/regressions.md on every run.

Usage:  python BENCH/ab_kernels.py [repeats] [baseline_commit] [levels]

``baseline_commit`` defaults to the r2 code state; pass another commit
for a control A/B (e.g. the r3 final commit — the ring path barely
changed in round 4, so a sound harness must report a delta WITHIN
same-code variance: a null-result control). ``levels`` is a
comma-separated cpu list (default "32,4"). Control results are written
to ab_control.{json,md} instead of ab_kernels.* so the headline A/B is
never overwritten.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2_COMMIT = "8e5af82"
R2_TREE = os.path.join(REPO, ".ab_r2")
RUNNER = os.path.join(REPO, "BENCH", "ab_runner.py")
ALL_LEVELS = {32: ("0-31", 600_000), 4: ("0-3", 75_000)}


def ensure_worktree(commit: str) -> None:
    if os.path.isdir(os.path.join(R2_TREE, "pipeline")):
        remove_worktree()
    subprocess.run(
        ["git", "worktree", "add", "--detach", R2_TREE, commit],
        cwd=REPO,
        check=True,
        capture_output=True,
    )


def remove_worktree() -> None:
    subprocess.run(
        ["git", "worktree", "remove", "--force", R2_TREE],
        cwd=REPO,
        capture_output=True,
    )


def run_leg(tree: str, cpus: int, cpu_range: str, pairs: int) -> dict:
    env = dict(
        os.environ,
        PYTHONPATH=tree,
        AB_CPUS=str(cpus),
        AB_PAIRS=str(pairs),
    )
    cmd = [sys.executable, RUNNER]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", cpu_range] + cmd
    out = subprocess.run(
        cmd, env=env, cwd=tree, capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        raise RuntimeError(f"leg failed ({tree}, {cpus}): {out.stderr[-2000:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["pipeline_file"].startswith(tree), rec["pipeline_file"]
    return rec


def main() -> dict:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    commit = sys.argv[2] if len(sys.argv) > 2 else R2_COMMIT
    level_list = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [32, 4]
    )
    LEVELS = {c: ALL_LEVELS[c] for c in level_list}
    control = commit != R2_COMMIT
    base_name = "r2_perpair" if not control else f"baseline_{commit}"
    ensure_worktree(commit)
    sides = {base_name: R2_TREE, "head_batch": REPO}
    runs: dict[int, dict[str, list[dict]]] = {
        c: {s: [] for s in sides} for c in LEVELS
    }
    try:
        for cpus, (cpu_range, pairs) in LEVELS.items():
            order = list(sides)
            for i in range(repeats):
                # ABBA interleave: alternate which side goes first so a
                # monotone drift within the level biases neither side
                legs = order if i % 2 == 0 else order[::-1]
                for side in legs:
                    rec = run_leg(sides[side], cpus, cpu_range, pairs)
                    runs[cpus][side].append(rec)
                    print(
                        f"[ab] cpus={cpus} {side}: {rec['pairs_per_sec']} "
                        f"pairs/s (steady {rec['steady_s']}s)",
                        file=sys.stderr,
                    )
    finally:
        remove_worktree()

    def stats(recs: list[dict]) -> dict:
        xs = [r["pairs_per_sec"] for r in recs]
        return {
            "repeats": xs,
            "median": round(statistics.median(xs), 1),
            "best": max(xs),
            "spread_pct": round((max(xs) - min(xs)) / statistics.median(xs) * 100, 1),
        }

    report: dict = {
        "baseline_commit": commit,
        "control": control,
        "methodology": "interleaved ABBA, fresh JVM per leg, identical "
        "mixed-roles ring, steady best-of-2 after warmup pass, CPU-pinned",
        "generated": datetime.now(timezone.utc).isoformat(),
        "levels": {},
    }
    for cpus in LEVELS:
        a = stats(runs[cpus][base_name])
        b = stats(runs[cpus]["head_batch"])
        delta_pct = round((b["median"] / a["median"] - 1) * 100, 1)
        report["levels"][str(cpus)] = {
            "pairs": LEVELS[cpus][1],
            base_name: a,
            "head_batch": b,
            "delta_median_pct": delta_pct,
            "exceeds_same_code_variance": abs(delta_pct)
            > max(a["spread_pct"], b["spread_pct"]),
        }

    out_base = "ab_control" if control else "ab_kernels"
    with open(os.path.join(REPO, "BENCH", f"{out_base}.json"), "w") as f:
        json.dump(report, f, indent=2)

    title = (
        "# A/B CONTROL: prior code state vs HEAD (expect delta WITHIN variance)"
        if control
        else "# A/B: r2 per-pair kernels vs HEAD numpy batch kernels"
    )
    lines = [
        title,
        "",
        f"Interleaved same-session A/B, baseline = "
        f"`{commit}` via git worktree, {repeats} repeats/side/level, "
        "fresh JVM per leg, identical mixed-roles ring, steady "
        "best-of-2 after an untimed warmup pass, taskset-pinned.",
        "",
        "| level | side | repeats (pairs/s) | median | best | same-code spread |",
        "|---|---|---|---|---|---|",
    ]
    for cpus in LEVELS:
        lv = report["levels"][str(cpus)]
        for side in (base_name, "head_batch"):
            s = lv[side]
            lines.append(
                f"| local[{cpus}] | {side} | "
                f"{', '.join(str(x) for x in s['repeats'])} | "
                f"{s['median']} | {s['best']} | {s['spread_pct']}% |"
            )
        lines.append(
            f"| local[{cpus}] | **delta (head vs baseline, medians)** | | "
            f"**{lv['delta_median_pct']:+.1f}%** | | "
            f"{'exceeds' if lv['exceeds_same_code_variance'] else 'WITHIN'} "
            "same-code variance |"
        )
    md = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", f"{out_base}.md"), "w") as f:
        f.write(md)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
