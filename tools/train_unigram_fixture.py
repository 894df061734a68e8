#!/usr/bin/env python3
"""Regenerate the committed Unigram-LM vocab fixture.

Provenance tool for src/main/resources/graft/unigram_vocab.txt — the
THIRD tokenizer family's model (Kudo 2018, SentencePiece unigram).
This builds the SEED model exactly the way SentencePiece initializes
one: candidate pieces are the corpus's frequent substrings, piece
probability is its (overlapping, frequency-weighted) substring count
normalized over all candidates, cost = round(-1e6 * ln p) as a
fixed-point integer. EM refinement of the seed probabilities is out of
scope (documented divergence); INFERENCE over the committed integer
costs is exact Viterbi in both engines — no float ever crosses the
engine boundary, the model file is where the logs live.

File format: one `piece\tcost` per line; the first 256 lines are the
byte-level base pieces in byte order (Laplace count 1 when unseen), so
ids are positional: id = line index + 1, multi-char pieces from 257.
Same byte->symbol bijection and pre-tokenizer as the BPE/WordPiece
fixtures.

Usage: python3 tools/train_unigram_fixture.py [sfdir] [maxPieces]
"""
import math
import re
import sys
from collections import Counter

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
max_pieces = int(sys.argv[2]) if len(sys.argv) > 2 else 200

MAX_PIECE_LEN = 8
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
BASE = [B2C[b] for b in range(256)]


def map_word(w: str) -> str:
    return "".join(B2C[b] for b in w.encode("utf-8"))


texts = duckdb.connect().execute(
    f"SELECT text FROM '{sfdir}/documents.parquet'"
).fetchall()
freq = Counter()
for (t,) in texts:
    for pt in PRETOKEN.findall(t):
        freq[map_word(pt)] += 1

# overlapping substring counts, frequency-weighted (the seed inventory)
sub = Counter()
for w, n in freq.items():
    for i in range(len(w)):
        for j in range(i + 1, min(i + MAX_PIECE_LEN, len(w)) + 1):
            sub[w[i:j]] += n

multi = [(p, c) for p, c in sub.items() if len(p) > 1]
multi.sort(key=lambda pc: (-pc[1], pc[0]))
multi = multi[: max_pieces - 256]

counts = [(b, max(sub.get(b, 0), 1)) for b in BASE] + multi
total = sum(c for _, c in counts)
lines = [(p, round(-1e6 * math.log(c / total))) for p, c in counts]

path = "src/main/resources/graft/unigram_vocab.txt"
with open(path, "w", encoding="utf-8") as f:
    for p, cost in lines:
        f.write(f"{p}\t{cost}\n")
print(f"wrote {len(lines)} pieces to {path} "
      f"({len(lines) - 256} multi-char, total count {total})")
for p, cost in lines[256:266]:
    print(f"  {p!r}: {cost}")
