"""Interleaved A/B benchmark: HEAD vs a base git commit (VERDICT r5
next-round #1 — settle whether the r5 per_row_cutoffs 4.5x /
dfs_depth2 1.5x swings were host noise or a code regression).

Protocol (the scaling run's discipline, applied per-query):
- each LEG is a fresh-JVM subprocess running `bench.py --single
  q1,q2,...` in its checkout (HEAD = the repo, BASE = a git worktree
  of the base commit) — one cold execution per query per leg
- legs ALTERNATE variant order per rep ((head,base),(base,head),...)
  so both variants share the same mean wall-clock position; host
  saturation that accumulates through the run biases neither side
- a fixed idle cool-down precedes EVERY leg (same reasoning as the
  scaling protocol: a leg launched right after a saturating run
  measures ~25% slow on this host)
- >=5 reps, medians compared; per-rep times all reported

Output: one JSON dict on stdout (and incrementally appended JSONL to
--progress so a VM restart mid-run loses nothing).

Usage:
  python tools/ab_bench.py --base 387b45b \
      --queries per_row_cutoffs,dfs_depth2,ewm_by_user \
      --reps 5 --cooldown 60 --out BENCH/ab_r6_head_vs_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def _ensure_worktree(commit: str) -> str:
    path = f"/tmp/ab_base_{commit}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=REPO, check=True, capture_output=True, text=True,
        )
    return path


def _run_leg(checkout: str, queries: list[str], sf_dir: str) -> dict:
    """One fresh-JVM leg: every query once, cold, in `checkout`."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_QREPS"] = "1"
    env.pop("SPARK_GRAFT_BENCH_COOLDOWN", None)
    r = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py"),
         "--single", ",".join(queries)],
        cwd=checkout, env=env, capture_output=True, text=True,
        timeout=3600,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"leg in {checkout} produced no JSON:\n{r.stdout[-2000:]}\n"
            f"{r.stderr[-2000:]}")
    return json.loads(lines[-1])["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="git commit for the BASE side")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cooldown", type=int, default=60)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--progress", default="/tmp/ab_bench_progress.jsonl")
    args = ap.parse_args()

    queries = args.queries.split(",")
    base_dir = _ensure_worktree(args.base)
    variants = {"head": REPO, "base": base_dir}
    times: dict = {v: {q: [] for q in queries} for v in variants}

    for rep in range(args.reps):
        order = ("head", "base") if rep % 2 == 0 else ("base", "head")
        for v in order:
            time.sleep(args.cooldown)
            qsecs = _run_leg(variants[v], queries, args.sf_dir)
            for q in queries:
                times[v][q].append(qsecs[q])
            with open(args.progress, "a") as f:
                f.write(json.dumps(
                    {"rep": rep + 1, "variant": v, "queries": qsecs,
                     "t": time.strftime("%H:%M:%S")}) + "\n")
            print(json.dumps({"rep": rep + 1, "variant": v,
                              "queries": qsecs}), file=sys.stderr)

    out = {
        "metric": "ab_head_vs_base",
        "base_commit": args.base,
        "queries": queries,
        "reps": args.reps,
        "cooldown_s": args.cooldown,
        "leg_order": "alternated",
        "sf_dir": args.sf_dir,
        "per_rep": times,
        "median": {
            v: {q: round(_median(ts), 3) for q, ts in qs.items()}
            for v, qs in times.items()
        },
    }
    out["ratio_head_over_base"] = {
        q: round(out["median"]["head"][q] / out["median"]["base"][q], 3)
        for q in queries
    }
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
