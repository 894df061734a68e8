#!/usr/bin/env python3
"""Round-close 10x scale sweep (VERDICT r20 #9: make the sweep a script,
not a by-hand session).

Sequence:
  1. rebuild the deterministic 10x fixture via gen_sf1_all.py (unless
     --fixture points at an existing one),
  2. PRIME pass: full graft.Bench at the fixture, reps=1 — its only job
     is building every materialized index under /tmp for the new corpus
     stamp (first-ever runs pay builds inside the timed region, which is
     not the serve-side number the sweep compares),
  3. RECORD pass: full graft.Bench, min-of-2, warm indexes — the honest
     build-once/serve-many measurement,
  4. print the per-query sf/10x ratio table against a reference artifact
     (BENCH_LAST.json by default) sorted worst-first, plus median/p90.

Both passes run with SPARK_GRAFT_BENCH_RECORD=0 so the canonical sf0.1
BENCH_LAST.json is never clobbered. Queries that fail loud at 10x (e.g.
a recall floor) are listed, not hidden.

Usage: python3 tools/sweep10x.py [--fixture /tmp/graft_sf1] [--ref BENCH_LAST.json]
           [--cpus 32] [--skip-prime] [--out sweep10x.json]
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: str, reps: int):
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_CPUS": cpus, "SPARK_GRAFT_BENCH_RECORD": "0",
           "SPARK_GRAFT_REPS": str(reps)}
    p = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, env=env, cwd=ROOT)
    art = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and '"queries"' in line:
            art = json.loads(line)
    if art is None:
        sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:] + "\n")
        raise SystemExit("no bench artifact line found")
    return art


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/graft_sf1")
    ap.add_argument("--ref", default="BENCH_LAST.json")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--skip-prime", action="store_true",
                    help="fixture + indexes already primed (re-analysis)")
    ap.add_argument("--out", default=None,
                    help="write the record-pass artifact JSON here")
    args = ap.parse_args()

    if not os.path.isdir(args.fixture):
        print(f"building fixture {args.fixture} via gen_sf1_all.py", flush=True)
        subprocess.run([sys.executable, os.path.join(ROOT, "tools/gen_sf1_all.py"),
                        "/root/testdata/sf0.1", args.fixture], check=True, cwd=ROOT)
    if not args.skip_prime:
        print("prime pass (index builds, reps=1)", flush=True)
        run_bench(args.fixture, args.cpus, reps=1)
    print("record pass (min-of-2, warm indexes)", flush=True)
    art = run_bench(args.fixture, args.cpus, reps=2)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(art, f)

    with open(os.path.join(ROOT, args.ref)) as f:
        ref = json.load(f)["queries"]
    q = art["queries"]
    ratios = {k: q[k] / ref[k] for k in q
              if k in ref and ref[k] > 0 and q[k] > 0}
    vals = sorted(ratios.values())
    print(f"\nfailed at 10x: {art['failed']}")
    if not vals:
        # an all-failed run (or zero key overlap with the reference) must
        # report that state cleanly, not die on median([])
        print("no comparable queries (all failed, or no ref overlap)")
        return 1
    p90 = vals[min(int(len(vals) * 0.9), len(vals) - 1)]
    print(f"n={len(vals)} median {statistics.median(vals):.2f}x "
          f"p90 {p90:.2f}x")
    print("| query | 10x s | ref s | ratio |")
    print("|---|---|---|---|")
    for k, v in sorted(ratios.items(), key=lambda kv: -kv[1])[:25]:
        print(f"| {k} | {q[k]:.2f} | {ref[k]:.2f} | {v:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
