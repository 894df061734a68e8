#!/usr/bin/env python3
"""Generate an sf1-scale embeddings table for local stress runs.

Reproduces the driver table's measured profile at 10x sf0.1 (20,000
rows): 64-dim float32 unit vectors with no cluster structure (measured
within-label cosine == cross-label == 0), labels 0..9 uniform. Seed 42.
Like gen_sf1_documents.py, output is for SCALING measurements only and
never touches /root/testdata.

Usage: python3 tools/gen_sf1_embeddings.py [outdir] [rows] [rgsize]

`rgsize` (rows per row group, default rows/32): see gen_sf1_documents.py
— single-row-group fixtures are unsplittable and serialize their scans.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(outdir: str, rows: int, rgsize: int = 0) -> None:
    rng = np.random.default_rng(42)
    v = rng.standard_normal((rows, 64))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    table = pa.table({
        'vec_id': pa.array(range(rows), pa.int64()),
        'embedding': pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, rows), pa.int32())})
    import os
    import shutil
    root = f'{outdir}/embeddings.parquet'
    if os.path.isfile(root):
        os.remove(root)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    files = 32
    rg = rgsize if rgsize > 0 else max(1, rows // (files * 2))
    per = (rows + files - 1) // files
    for f in range(files):
        pq.write_table(table.slice(f * per, per),
                       f'{root}/part-{f:05d}.parquet', row_group_size=rg)
    print(f'wrote {rows} rows ({files} files, {rg} rows/row-group) to {root}/')


if __name__ == '__main__':
    out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft_sf1'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    rg = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    main(out, n, rg)
