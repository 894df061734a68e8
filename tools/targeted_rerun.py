#!/usr/bin/env python3
"""Isolated min-of-2 re-runs for in-suite bench outliers.

Codifies the r8/r11 lesson (ann_ivf: 3.27 s in-suite vs 1.23 s targeted;
r12 root cause: a failed warmup piece silently shifted first-in-JVM costs
onto the alphabetically-first queries): an IN-SUITE min-of-2 inherits
whatever warmth, neighbor contention, and shared-index accounting the
suite ordering dealt it, so any suspicious in-suite number must be
confirmed by an ISOLATED re-run before it is called a regression.

Reads a bench artifact (BENCH_LAST.json by default), selects every query
whose official time exceeds --threshold seconds (default 2.0) — or, with
--ref <old_bench.json>, whose time exceeds 1.5x the same query's time in
the reference artifact — and re-runs each alone in a fresh JVM
(SPARK_GRAFT_ONLY=<query>, same sf dir as the artifact). Prints a
markdown table ready for BASELINE.md.

With --record, verdicts are also merged into tools/adjudicated.json
(query -> {in_suite_s, isolated_s, verdict, adjudicated_utc}), which
graft.Bench embeds verbatim into every bench artifact as "adjudicated"
— so a >2 s row whose floor is already isolated-confirmed carries its
flag machine-readably instead of needing BASELINE.md prose.

Usage: python3 tools/targeted_rerun.py [bench.json] [--threshold 2.0]
           [--ref old_bench.json] [--sf <dir>] [--cpus 32] [--record]
"""
import argparse
import json
import subprocess
import sys


def run_isolated(query: str, sf_dir: str, cpus: str) -> float:
    env = {"SPARK_GRAFT_ONLY": query, "SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_CPUS": cpus}
    import os
    full = {**os.environ, **env}
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=full, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in p.stdout.splitlines():
        line = line.strip()
        # sbt prefixes forked stdout with "[info] " in some modes and not
        # others (the driver's capture shows the bare line); accept both
        if '"metric"' in line and (line.startswith("[info] {") or line.startswith("{")):
            payload = line[len("[info] "):] if line.startswith("[info] ") else line
            data = json.loads(payload)
            return data["queries"].get(query, -1.0)
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", nargs="?", default="BENCH_LAST.json")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--ref", default=None,
                    help="prior bench json; select queries >1.5x their ref time")
    ap.add_argument("--sf", default=None, help="override sf dir")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--record", action="store_true",
                    help="merge verdicts into tools/adjudicated.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to adjudicate "
                         "regardless of threshold (VERDICT r14 #1: a "
                         "specific unledgered row)")
    args = ap.parse_args()

    with open(args.bench) as f:
        bench = json.load(f)
    sf_dir = args.sf or bench.get("sf", "/root/testdata/sf0.1")
    times = bench["queries"]

    # VERDICT r15 #7: q5_setops regressed 5.8x but sat under the 2 s
    # absolute gate and carried no verdict. The default trigger is now
    # the UNION of the absolute threshold and a >2x ratio against the
    # previous round's artifact (auto-detected as the highest-numbered
    # BENCH_r*.json that is not the input file; --ref overrides).
    def load_ref(path):
        # three artifact shapes: the repo's own bench (top-level
        # "queries"), the driver's wrapper ("parsed" holding the bench
        # line — null until the stdout-decoration fix lands), or neither
        # (ratio rule silently skipped)
        with open(path) as f:
            d = json.load(f)
        return (d.get("queries")
                or (d.get("parsed") or {}).get("queries")
                or {})

    ref_path = args.ref
    if ref_path is None and not args.only:
        import glob as _glob
        import os as _os
        here = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        import re as _re

        def _round_num(p):
            m = _re.search(r"BENCH_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        # numeric round sort, not lexicographic: BENCH_r9 < BENCH_r16
        # (ADVICE r16 low — lexicographic picked r9 as "latest")
        cands = sorted(_glob.glob(_os.path.join(here, "BENCH_r*.json")),
                       key=_round_num)
        cands = [c for c in cands
                 if _os.path.realpath(c) != _os.path.realpath(args.bench)]
        if cands:
            ref_path = cands[-1]

    if args.only:
        picked = sorted(q for q in args.only.split(",") if q in times)
        rule = f"named via --only ({args.only})"
    elif args.ref:
        ref = load_ref(args.ref)
        picked = sorted(q for q, t in times.items()
                        if t > 0 and q in ref and ref[q] > 0
                        and t > 1.5 * ref[q])
        rule = f">1.5x their time in {args.ref}"
    else:
        ref = load_ref(ref_path) if ref_path else {}
        picked = sorted(q for q, t in times.items()
                        if t > args.threshold
                        or (t > 0 and ref.get(q, 0) > 0 and t > 2.0 * ref[q]))
        rule = (f">{args.threshold}s in-suite, or >2x their time in "
                f"{ref_path}" if ref_path else f">{args.threshold}s in-suite")

    if not picked:
        print(f"no queries {rule} — nothing to re-run")
        return 0

    print(f"re-running {len(picked)} queries ({rule}) isolated, "
          f"min-of-2, fresh JVM each, sf={sf_dir}\n", file=sys.stderr)
    rows = []
    for q in picked:
        iso = run_isolated(q, sf_dir, args.cpus)
        verdict = ("in-suite artifact" if 0 < iso <= 0.67 * times[q]
                   else "confirmed" if iso > 0 else "RE-RUN FAILED")
        rows.append((q, times[q], iso, verdict))
        print(f"  {q}: in-suite {times[q]:.2f}s -> isolated {iso:.2f}s "
              f"({verdict})", file=sys.stderr)

    print("| query | in-suite min-of-2 (s) | isolated min-of-2 (s) | verdict |")
    print("|---|---|---|---|")
    for q, t, iso, v in rows:
        print(f"| {q} | {t:.2f} | {iso:.2f} | {v} |")

    if args.record:
        import datetime
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "adjudicated.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ")
        for q, t, iso, v in rows:
            merged[q] = {"in_suite_s": round(t, 3), "isolated_s": round(iso, 3),
                         "verdict": v, "adjudicated_utc": stamp}
        with open(path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"recorded {len(rows)} verdicts into {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
