#!/usr/bin/env python3
"""Generate an sf1-scale documents table for local stress runs.

The driver provides sf0.001/0.01/0.1 only; this reproduces the documents
table's measured profile at 10x sf0.1 (50,000 rows): 31-word vocabulary,
uniform 10..100 tokens/doc, langs en~41%/de/es/fr/zh~15% each, sources
src0..src19 uniform, n_chars = length(text). Seed 42, pure python RNG —
deterministic across runs. Output is for SCALING measurements (BASELINE.md
sf1 section), not the correctness oracle, and never touches /root/testdata.

Zipfian mode (`zipf` as third arg): a realistic large-vocabulary corpus
— 20,000 distinct synthetic words (length 4-10, seeded), frequencies
Zipf-ish (weight i^-0.6), uniform 10..100 tokens/doc. The flat 31-word
profile above is the inverted index's WORST case (every gram corpus-
common); the Zipf mode is the shape real web corpora have, where the
prefix-filtered join's rare-gram candidates pay off — used for the
BASELINE.md prefix-vs-sparse measurement.

Usage: python3 tools/gen_sf1_documents.py [outdir] [rows] [zipf|flat] [rgsize]

`rgsize` (rows per parquet row group, default rows/32) and the sharded
output exist because the original single-row-group single-file output was
unsplittable: Spark cannot split inside a row group, and a file far under
maxPartitionBytes lands in one scan task regardless of its row-group
count (measured r12: qualityFilter over the 6 MB fixture, 1.60 s as one
task vs 0.37 s split — the r11 3.7x "scaling" ratio was the fixture).
Real tables are many files of many row groups; the fixture now is too:
`documents.parquet` becomes a DIRECTORY of `files` parquet parts, which
spark.read.parquet consumes transparently.
"""
import bisect
import itertools
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
LANGS = ['en'] * 41 + ['de'] * 15 + ['es'] * 15 + ['fr'] * 15 + ['zh'] * 14


def zipf_vocab(rng: random.Random, size: int = 20000):
    words = set()
    while len(words) < size:
        words.add(''.join(rng.choice('abcdefghijklmnopqrstuvwxyz')
                          for _ in range(rng.randint(4, 10))))
    vocab = sorted(words)
    rng.shuffle(vocab)  # rank order independent of spelling
    weights = [1.0 / (i + 1) ** 0.6 for i in range(size)]
    cum = list(itertools.accumulate(weights))
    total = cum[-1]

    def pick():
        return vocab[bisect.bisect_left(cum, rng.random() * total)]
    return pick


def main(outdir: str, rows: int, mode: str = 'flat', rgsize: int = 0) -> None:
    rng = random.Random(42)
    pick = zipf_vocab(rng) if mode == 'zipf' else (lambda: rng.choice(VOCAB))
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(rows):
        n_tok = rng.randint(10, 100)
        text = ' '.join(pick() for _ in range(n_tok))
        ids.append(i)
        texts.append(text)
        langs.append(rng.choice(LANGS))
        sources.append(f'src{rng.randrange(20)}')
        n_chars.append(len(text))
    table = pa.table({'doc_id': pa.array(ids, pa.int64()),
                      'text': texts, 'lang': langs, 'source': sources,
                      'n_chars': pa.array(n_chars, pa.int64())})
    import os
    import shutil
    root = f'{outdir}/documents.parquet'
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    mode = sys.argv[3] if len(sys.argv) > 3 else 'flat'
    rg = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    main(out, n, mode, rg)
