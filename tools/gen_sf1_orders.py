#!/usr/bin/env python3
"""Scale the sf1 orders fixture to 10x sf0.1 by replication.

The sf1 stress dir's lineitem was replicated 10x with l_orderkey offset
by replica*6,000,000 per copy, but orders never was (VERDICT r11 "what's
wrong" #3) — so every orders-driven sf1 ratio measured noise, not scale.
This replicates sf0.1 orders with the SAME o_orderkey stride, preserving
the lineitem<->orders join (each lineitem replica finds exactly its
orders replica) and leaving o_custkey untouched (customer is deliberately
unscaled — dims grow slower than facts; the join fans out 10x, which is
the scale shape). Output gets many row groups (see gen_sf1_documents.py).

Usage: python3 tools/gen_sf1_orders.py [src_sf_dir] [outdir] [replicas]
"""
import sys

import pyarrow as pa
import pyarrow.compute  # noqa: F401 -- pa.compute is lazily bound; import it explicitly
import pyarrow.parquet as pq

KEY_STRIDE = 6_000_000  # matches the existing sf1 lineitem replication


def main(src_dir: str, outdir: str, replicas: int) -> None:
    base = pq.read_table(f'{src_dir}/orders.parquet')
    keys = base.column('o_orderkey')
    copies = []
    for i in range(replicas):
        off = pa.compute.add(keys, i * KEY_STRIDE)
        copies.append(base.set_column(
            base.schema.get_field_index('o_orderkey'), 'o_orderkey', off))
    out = pa.concat_tables(copies)
    import os
    os.makedirs(outdir, exist_ok=True)
    rg = max(1, out.num_rows // 32)
    pq.write_table(out, f'{outdir}/orders.parquet', row_group_size=rg)
    m = pq.read_metadata(f'{outdir}/orders.parquet')
    print(f'wrote {m.num_rows} rows ({m.num_row_groups} row groups) '
          f'to {outdir}/orders.parquet')


if __name__ == '__main__':
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, out, n)
