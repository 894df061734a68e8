#!/usr/bin/env python3
"""Rebuild the ENTIRE /tmp/graft_sf1 stress fixture in one deterministic run.

The sf1 scaling tables in BASELINE.md were measured against a /tmp dir
whose lineitem/events replication had only ever been done ad hoc — the
fixture evaporated with /tmp and the recipe lived nowhere (the round-11/12
"fixture debt" items were symptoms). This script IS the recipe now:

- lineitem: sf0.1 replicated `replicas`x, l_orderkey += i*6,000,000 per
  copy (the stride gen_sf1_orders.py documents; orders replicates with the
  same stride, so every lineitem replica joins exactly its orders replica).
- orders:   via gen_sf1_orders.py (same stride, o_custkey untouched).
- events:   replicated `replicas`x with event_id += i*10,000,000 and
  user_id += i*1,000,000 — DISTINCT user universes per replica, so
  streaming/funnel/dedup state scales with key count (the honest 10x for
  stateful operators; replicating the same users would instead deepen
  per-key state while holding key cardinality flat).
- documents/embeddings: via gen_sf1_documents.py / gen_sf1_embeddings.py
  (sharded multi-file, many row groups — see their docstrings for why).
- region/nation/supplier/part/customer: copied unscaled (dims grow slower
  than facts; the 10x join fan-out is the scale shape being measured).

Every step is seeded/arithmetic — two runs produce identical tables.
Output is for SCALING measurements only and never touches /root/testdata.

Usage: python3 tools/gen_sf1_all.py [src_sf_dir] [outdir] [replicas]
"""
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute  # noqa: F401 -- pa.compute is lazily bound; import it explicitly
import pyarrow.parquet as pq

LINEITEM_STRIDE = 6_000_000   # matches gen_sf1_orders.py
EVENT_ID_STRIDE = 10_000_000
USER_ID_STRIDE = 1_000_000


def replicate(src: str, dst: str, replicas: int, offsets: dict) -> None:
    """Replicate a parquet table, offsetting `offsets`' columns by
    i*stride per copy; write with many row groups so scans split."""
    base = pq.read_table(src)
    copies = []
    for i in range(replicas):
        t = base
        for col, stride in offsets.items():
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pa.compute.add(base.column(col), i * stride))
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, dst, row_group_size=max(1, out.num_rows // 32))
    m = pq.read_metadata(dst)
    print(f'{os.path.basename(dst)}: {m.num_rows} rows, {m.num_row_groups} row groups')


def main(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    replicate(f'{src}/lineitem.parquet', f'{out}/lineitem.parquet', replicas,
              {'l_orderkey': LINEITEM_STRIDE})
    subprocess.check_call([sys.executable, f'{here}/gen_sf1_orders.py',
                           src, out, str(replicas)])
    replicate(f'{src}/events.parquet', f'{out}/events.parquet', replicas,
              {'event_id': EVENT_ID_STRIDE, 'user_id': USER_ID_STRIDE})
    # documents/embeddings scale from the SOURCE profile x replicas, so a
    # non-default src/replicas cannot silently produce a mixed-scale
    # fixture (each table is the same multiple of its source)
    n_docs = pq.read_metadata(f'{src}/documents.parquet').num_rows * replicas
    n_emb = pq.read_metadata(f'{src}/embeddings.parquet').num_rows * replicas
    subprocess.check_call([sys.executable, f'{here}/gen_sf1_documents.py',
                           out, str(n_docs), 'flat'])
    subprocess.check_call([sys.executable, f'{here}/gen_sf1_embeddings.py',
                           out, str(n_emb)])
    for dim in ('region', 'nation', 'supplier', 'part', 'customer'):
        shutil.copyfile(f'{src}/{dim}.parquet', f'{out}/{dim}.parquet')
        print(f'{dim}.parquet: copied unscaled')


if __name__ == '__main__':
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, out, replicas)
