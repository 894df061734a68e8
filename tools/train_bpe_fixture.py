#!/usr/bin/env python3
"""Regenerate the committed BPE merges fixture.

Provenance tool for src/main/resources/graft/bpe_merges.txt: classic BPE
training over the pre-token frequency table (the scalable formulation —
one distributed groupBy produces the compact word-freq table, the merge
loop runs over THAT, never the corpus). Semantics mirror
graft.functions.Bpe.train exactly:

  - pre-tokenizer: [A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]  compiled with
    re.ASCII so \\s means the ASCII set exactly like Java regex (a
    Unicode-aware \\s would treat NBSP as whitespace and diverge —
    ADVICE r13)
  - BYTE-LEVEL symbols: each pre-token trains as its UTF-8 byte
    sequence mapped through the standard byte->unicode bijection
    (printable bytes map to themselves, the rest to U+0100..), the same
    alphabet Bpe.mapWord produces — engine-independent, no surrogate
    or code-point iteration ambiguity
  - pair counts weighted by word frequency, one count per adjacent
    position
  - best pair = (count desc, left asc, right asc)  [deterministic]
  - pairs with left == right are SKIPPED: the fixture guarantees
    left != right for every merge, which makes "merge all occurrences"
    overlap-free and therefore exactly replayable without nested
    recursion in the DuckDB oracle (see SparkEntry tokenize_bpe)
  - merges apply left-to-right, non-overlapping

Usage: python3 tools/train_bpe_fixture.py [sfdir] [numMerges]
Default corpus is sf0.1 (5000 docs — the "larger synthetic corpus" of
VERDICT r13 next #2); the old fixture trained on sf0.001's 31 words.
"""
import re
import sys
from collections import Counter

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 160

PRETOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)

# byte -> symbol char bijection, identical to Bpe.ByteToChar
_keep = set(range(33, 127)) | set(range(161, 173)) | set(range(174, 256))
B2C = {}
_n = 0
for _b in range(256):
    if _b in _keep:
        B2C[_b] = chr(_b)
    else:
        B2C[_b] = chr(256 + _n)
        _n += 1


def map_word(w: str):
    return tuple(B2C[b] for b in w.encode("utf-8"))


texts = duckdb.connect().execute(
    f"SELECT text FROM '{sfdir}/documents.parquet'"
).fetchall()
freq = Counter()
for (t,) in texts:
    for pt in PRETOKEN.findall(t):
        freq[pt] += 1
words = {map_word(w): int(n) for w, n in freq.items()}

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
with open(path, "w", encoding="utf-8") as f:
    f.write(out)
print(f"wrote {len(merges)} merges to {path}")
for i, (l, r) in enumerate(merges[:10]):
    print(f"  rank {i}: {l!r} + {r!r}")
