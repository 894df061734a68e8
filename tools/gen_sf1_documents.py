#!/usr/bin/env python3
"""Generate an sf1-scale documents table for local stress runs.

The driver provides sf0.001/0.01/0.1 only; this reproduces the documents
table's measured profile at 10x sf0.1 (50,000 rows): 31-word vocabulary,
uniform 10..100 tokens/doc, langs en~41%/de/es/fr/zh~15% each, sources
src0..src19 uniform, n_chars = length(text). Seed 42, pure python RNG —
deterministic across runs. Output is for SCALING measurements (BASELINE.md
sf1 section), not the correctness oracle, and never touches /root/testdata.

Usage: python3 tools/gen_sf1_documents.py [outdir] [rows]
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
LANGS = ['en'] * 41 + ['de'] * 15 + ['es'] * 15 + ['fr'] * 15 + ['zh'] * 14


def main(outdir: str, rows: int) -> None:
    rng = random.Random(42)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(rows):
        n_tok = rng.randint(10, 100)
        text = ' '.join(rng.choice(VOCAB) for _ in range(n_tok))
        ids.append(i)
        texts.append(text)
        langs.append(rng.choice(LANGS))
        sources.append(f'src{rng.randrange(20)}')
        n_chars.append(len(text))
    table = pa.table({'doc_id': pa.array(ids, pa.int64()),
                      'text': texts, 'lang': langs, 'source': sources,
                      'n_chars': pa.array(n_chars, pa.int64())})
    import os
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(table, f'{outdir}/documents.parquet')
    print(f'wrote {rows} rows to {outdir}/documents.parquet')


if __name__ == '__main__':
    out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft_sf1'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    main(out, n)
