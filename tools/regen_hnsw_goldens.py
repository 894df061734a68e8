#!/usr/bin/env python3
"""Regenerate the HNSW VALUES-golden resources from a Verify dump.

The HNSW serve is deterministic (hash-derived levels, id-ordered
inserts, (dist, id) tie-breaks — HnswSpec pins bit-identical rebuilds),
so its output at the driver's gate sf is a fixed relation committed as
CSV under src/main/resources/goldens and replayed to DuckDB as literal
VALUES by SparkEntry.hnswGoldenSql. Re-run this ONLY after a deliberate
corpus regeneration or HNSW parameter change, from a fresh-fixture run:

  rm -rf /tmp/graft_hnsw*_v1_*
  SPARK_GRAFT_ONLY=ann_hnsw_served,ann_hnsw_appended,ann_hnsw_asof,ann_hnsw_deleted,ann_hnsw_compacted \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_hnsw"
  python3 tools/regen_hnsw_goldens.py /tmp/verify_hnsw

The in-closure recall floor (assertHnswRecallFloor) stays the semantic
gate either way — a regenerated golden that somehow encoded a recall
regression would still fail the floor.

AFTER regenerating, run `python3 tools/hnsw_independent.py` — the pure-
Python second implementation of the construction spec must reproduce
every regenerated golden byte-identically (the round-19 dual-generation
contract; a mismatch means one of the two implementations drifted from
the spec and MUST be resolved before committing new goldens).
"""
import glob
import sys

import pandas as pd

QUERIES = ["ann_hnsw_served", "ann_hnsw_appended", "ann_hnsw_asof",
           "ann_hnsw_deleted", "ann_hnsw_compacted"]
COLS = ["query_id", "rank", "vec_id", "cos1e6"]


def main(verify_dir: str) -> int:
    for q in QUERIES:
        files = sorted(glob.glob(f"{verify_dir}/{q}/*.parquet"))
        if not files:
            print(f"SKIP {q}: no output under {verify_dir}")
            continue
        df = pd.concat([pd.read_parquet(f) for f in files])[COLS]
        df = df.sort_values(["query_id", "rank"]).reset_index(drop=True)
        out = f"src/main/resources/goldens/{q}.csv"
        df.to_csv(out, index=False)
        print(f"wrote {out} ({len(df)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_hnsw"))
