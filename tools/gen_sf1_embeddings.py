#!/usr/bin/env python3
"""Generate an sf1-scale embeddings table for local stress runs.

Reproduces the driver table's measured profile at 10x sf0.1 (20,000
rows): 64-dim float32 unit vectors with no cluster structure (measured
within-label cosine == cross-label == 0), labels 0..9 uniform. Seed 42.
Like gen_sf1_documents.py, output is for SCALING measurements only and
never touches /root/testdata.

Usage: python3 tools/gen_sf1_embeddings.py [outdir] [rows]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(outdir: str, rows: int) -> None:
    rng = np.random.default_rng(42)
    v = rng.standard_normal((rows, 64))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    table = pa.table({
        'vec_id': pa.array(range(rows), pa.int64()),
        'embedding': pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, rows), pa.int32())})
    import os
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(table, f'{outdir}/embeddings.parquet')
    print(f'wrote {rows} rows to {outdir}/embeddings.parquet')


if __name__ == '__main__':
    out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft_sf1'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    main(out, n)
