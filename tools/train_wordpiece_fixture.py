#!/usr/bin/env python3
"""Regenerate the committed WordPiece merges fixture.

Provenance tool for src/main/resources/graft/wordpiece_merges.txt:
WordPiece training (Schuster & Nakajima 2012 likelihood criterion) over
the pre-token frequency table. Semantics mirror
graft.functions.WordPiece.train exactly:

  - pre-tokenizer + byte-level symbol alphabet: identical to
    train_bpe_fixture.py (re.ASCII pattern, UTF-8 byte iteration,
    byte->unicode bijection)
  - pair counts AND symbol counts weighted by word frequency, one count
    per position
  - best pair = argmax of the fixed-point integer likelihood score
    floor(count(l,r) * 10**12 // (count(l) * count(r))), ties broken
    (score desc, left asc, right asc)  [deterministic; Python ints are
    exact like the Scala BigInt path]
  - pairs with left == right SKIPPED (same replay contract as BPE)
  - merges apply left-to-right, non-overlapping

Usage: python3 tools/train_wordpiece_fixture.py [sfdir] [numMerges]
"""
import re
import sys
from collections import Counter

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 160

SCALE = 10**12
PRETOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)

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
    syms = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            syms[w[i]] += n
            if i + 1 < len(w) and w[i] != w[i + 1]:
                pairs[(w[i], w[i + 1])] += n
    if not pairs:
        break
    best = min(
        pairs.items(),
        key=lambda kv: (-(kv[1] * SCALE // (syms[kv[0][0]] * syms[kv[0][1]])),
                        kv[0][0], kv[0][1]),
    )[0]
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
path = "src/main/resources/graft/wordpiece_merges.txt"
with open(path, "w", encoding="utf-8") as f:
    f.write(out)
print(f"wrote {len(merges)} merges to {path}")
for i, (l, r) in enumerate(merges[:10]):
    print(f"  rank {i}: {l!r} + {r!r}")
