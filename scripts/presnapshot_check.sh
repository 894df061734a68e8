#!/usr/bin/env bash
# Pre-snapshot parity check (VERDICT r10 task 8 / r9 task 8).
#
# Run BEFORE any end-of-round snapshot commit. Guards against the two
# failure modes round 9/10 actually hit:
#   1. the snapshot auto-commit re-adding files a prior commit removed
#      (the Drive.scala incident: deleted in 4cc00bb, resurrected by the
#      cccf4dc snapshot) — now also prevented structurally by the
#      .gitignore entry for scratch drivers;
#   2. committed BENCH/CORRECTNESS artifacts drifting from what the
#      driver-shaped harness measures on /root/testdata as-is.
set -u
cd "$(dirname "$0")/.."
fail=0

echo "== 1. git hygiene: no unintended re-adds or scratch files =="
# scratch measurement drivers must never ship
if [ -e src/main/scala/Drive.scala ]; then
  echo "FAIL: src/main/scala/Drive.scala exists (scratch driver — delete before snapshot)"
  fail=1
fi
# untracked source files are snapshot re-add candidates: list them loudly
untracked=$(git status --porcelain | awk '$1 == "??" {print $2}' | grep -E '\.(scala|sbt)$' || true)
if [ -n "$untracked" ]; then
  echo "WARN: untracked build/source files the snapshot would add:"
  echo "$untracked"
fi

echo "== 2. build green =="
sbt -batch compile > /tmp/presnap_compile.log 2>&1 || { echo "FAIL: compile"; fail=1; }

echo "== 3. driver-shaped verify on testdata as-is (sf0.01) =="
rm -rf /tmp/presnap_verify
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/presnap_verify" \
  > /tmp/presnap_verify.log 2>&1 || { echo "FAIL: graft.Verify run"; fail=1; }
nq=$(python3 -c "import json;print(len(json.load(open('/tmp/presnap_verify/oracle_sql.json'))))" 2>/dev/null || echo 0)
echo "verify wrote output for declared queries: $nq (see /tmp/presnap_verify)"
if [ "$nq" -lt 1 ]; then
  echo "FAIL: verify declared no oracled queries"
  fail=1
fi

echo "== 4. bench JSON emits =="
# SPARK_GRAFT_BENCH_RECORD=0: this sf0.01 smoke must not overwrite the
# committed canonical sf0.1 series in BENCH_LAST.json
SPARK_GRAFT_BENCH_RECORD=0 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -o '{"metric".*}' | tail -1 > /tmp/presnap_bench.json
if [ -s /tmp/presnap_bench.json ]; then
  # exit 1 from the inline python iff any query failed — a snapshot must
  # not ship with a red query masquerading under a green headline
  python3 - <<'PY' || fail=1
import json, sys
b = json.load(open("/tmp/presnap_bench.json"))
qs = b.get("queries", {})
failed = [k for k, v in qs.items() if v is None or v < 0]
print(f"bench: {len(qs)} queries, metric={b.get('value')}{b.get('unit','')}, failed={failed}")
sys.exit(1 if failed or not qs else 0)
PY
else
  echo "FAIL: graft.Bench produced no JSON line"
  fail=1
fi

if [ "$fail" -eq 0 ]; then echo "PRESNAPSHOT: OK"; else echo "PRESNAPSHOT: FAILED"; fi
exit "$fail"
