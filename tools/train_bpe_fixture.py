#!/usr/bin/env python3
"""Regenerate the committed BPE merges fixture from the sf0.001 corpus.

Provenance tool for src/main/resources/graft/bpe_merges.txt: classic BPE
training over the pre-token frequency table (the scalable formulation —
one distributed groupBy produces the compact word-freq table, the merge
loop runs over THAT, never the corpus). Semantics mirror
graft.functions.Bpe.train exactly:

  - pre-tokenizer: [A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]  (lookahead-free,
    identical under Java regex and RE2/DuckDB)
  - pair counts weighted by word frequency, one count per adjacent
    position
  - best pair = (count desc, left asc, right asc)  [deterministic]
  - pairs with left == right are SKIPPED: the fixture guarantees
    left != right for every merge, which makes "merge all occurrences"
    overlap-free and therefore exactly replayable without nested
    recursion in the DuckDB oracle (see SparkEntry tokenize_bpe)
  - merges apply left-to-right, non-overlapping

Usage: python3 tools/train_bpe_fixture.py [sfdir] [numMerges]
"""
import re
import sys
from collections import Counter

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 48

PRETOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

rows = duckdb.connect().execute(
    f"""SELECT pt, count(*) AS n FROM (
          SELECT unnest(regexp_extract_all(text, '{PRETOKEN}')) AS pt
          FROM '{sfdir}/documents.parquet') GROUP BY pt"""
).fetchall()
words = {tuple(w): int(n) for w, n in rows}

merges = []
for _ in range(num_merges):
    pairs = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            if w[i] != w[i + 1]:
                pairs[(w[i], w[i + 1])] += n
    if not pairs:
        break
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
    merges.append(best)
    l, r = best
    merged = l + r
    new_words = {}
    for w, n in words.items():
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == l and w[i + 1] == r:
                out.append(merged)
                i += 2
            else:
                out.append(w[i])
                i += 1
        new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
    words = new_words

out = "".join(f"{l}\t{r}\n" for l, r in merges)
path = "src/main/resources/graft/bpe_merges.txt"
with open(path, "w") as f:
    f.write(out)
print(f"wrote {len(merges)} merges to {path}")
for i, (l, r) in enumerate(merges[:10]):
    print(f"  rank {i}: {l!r} + {r!r}")
