#!/usr/bin/env python3
"""INDEPENDENT re-implementation of the deterministic HNSW construction
spec (VERDICT r18 #4) — closes the self-referential-golden loop.

The committed VALUES goldens under src/main/resources/goldens were
generated from the engine's own Verify output (tools/regen_hnsw_goldens
.py), so the driver's hash_match pins determinism and regression, not
independent correctness. This script is a SECOND implementation of the
construction spec in pure Python — hash-derived levels (byteswap64 of
the vec_id, 20 bits -> U in (0,1]), ascending-id inserts, (dist, id)
tie-breaks everywhere, diversity-based neighbor selection (Algorithm 4),
level-0 degree 2m with diversity pruning, per-segment graphs keyed by
vec_id %% nSegments, tombstones as serve-time acceptance filters — and
it must produce BYTE-IDENTICAL golden CSVs for all five driver
scenarios. Either outcome is the point: identical files close the loop;
a divergence is a bug in one of the two implementations.

Floating point: every accumulation is a sequential IEEE-double loop in
the same order as the JVM code (float32 values promote exactly), sqrt
and division are correctly-rounded IEEE ops on both runtimes, and
Math.round(double) is floor(x + 0.5). The one library call that is not
IEEE-pinned is log() in the level draw; a 1-ulp divergence there would
move a level only if -ln(u)*mL lands exactly on an integer for one of
the 2^20 possible u values, and a mismatch would be caught here, not
hidden.

Usage: python3 tools/hnsw_independent.py [sf_dir] [goldens_dir]
Exit 0 = all five scenarios byte-identical to the committed goldens.
"""
import heapq
import math
import sys

import pyarrow.parquet as pq

MCONST = 0x9E3775CD9E3775CD
MASK64 = (1 << 64) - 1


def byteswap64(v):
    """scala.util.hashing.byteswap64: mul, reverse bytes, mul (64-bit)."""
    hc = (v * MCONST) & MASK64
    hc = int.from_bytes(hc.to_bytes(8, "big"), "little")
    return (hc * MCONST) & MASK64


def level_of(vid, m_l):
    h = byteswap64(vid)
    u = ((h & 0xFFFFF) + 1) / float(1 << 20)
    return int(math.floor(-math.log(u) * m_l))


def seq_dot(a, b):
    s = 0.0
    for i in range(len(a)):
        s += a[i] * b[i]
    return s


def round_long(x):
    """java.lang.Math.round(double): floor(x + 0.5) as int."""
    return int(math.floor(x + 0.5))


ALWAYS = lambda n: True  # noqa: E731


class Graph:
    def __init__(self, m):
        self.m = m
        self.ids = []
        self.vecs = []
        self.norms = []
        self.levels = []
        self.adj = []  # adj[node][level] = list of node indexes
        self.entry = -1
        self.max_level = -1

    def dist(self, q, qnorm, node):
        v = self.vecs[node]
        s = seq_dot(q, v)
        d = qnorm * self.norms[node]
        return 0.0 if d == 0.0 else -s / d

    def add_node(self, vid, vec, level):
        self.ids.append(vid)
        self.vecs.append(vec)
        self.norms.append(math.sqrt(seq_dot(vec, vec)))
        self.levels.append(level)
        self.adj.append([[] for _ in range(level + 1)])
        return len(self.ids) - 1

    def search_layer(self, q, qnorm, eps, ef, lc, allow=ALWAYS):
        visited = set()
        cand = []  # min-heap of (d, n)
        res = []  # max-heap via negation: (-d, -n)
        for d, n in eps:
            if n not in visited:
                visited.add(n)
                heapq.heappush(cand, (d, n))
                if allow(n):
                    heapq.heappush(res, (-d, -n))
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            cd, c = heapq.heappop(cand)
            if len(res) >= ef and cd > -res[0][0]:
                break  # every remaining candidate is at least as far
            for n in self.adj[c][lc]:
                if n not in visited:
                    visited.add(n)
                    d = self.dist(q, qnorm, n)
                    if len(res) < ef or (d, n) < (-res[0][0], -res[0][1]):
                        heapq.heappush(cand, (d, n))
                        if allow(n):
                            heapq.heappush(res, (-d, -n))
                            if len(res) > ef:
                                heapq.heappop(res)
        return sorted((-d, -n) for d, n in res)  # ascending (dist, node)

    def select_diverse(self, base, cands, mmax):
        kept = []
        for dc, c in cands:
            if len(kept) >= mmax:
                break
            if c == base:
                continue
            v = self.vecs[c]
            vn = self.norms[c]
            diverse = True
            for _, kn in kept:
                if self.dist(v, vn, kn) <= dc:
                    diverse = False
                    break
            if diverse:
                kept.append((dc, c))
        return kept

    def prune(self, node, lc, mmax):
        v = self.vecs[node]
        vn = self.norms[node]
        cands = sorted(((self.dist(v, vn, n), n) for n in self.adj[node][lc]),
                       key=lambda t: (t[0], self.ids[t[1]]))
        self.adj[node][lc] = [n for _, n in self.select_diverse(node, cands, mmax)]

    def insert(self, vid, vec, m_l, ef_construction):
        lvl = level_of(vid, m_l)
        node = self.add_node(vid, vec, lvl)
        if self.entry < 0:
            self.entry = node
            self.max_level = lvl
            return
        qn = self.norms[node]
        eps = [(self.dist(vec, qn, self.entry), self.entry)]
        lc = self.max_level
        while lc > lvl:
            eps = [self.search_layer(vec, qn, eps, 1, lc)[0]]
            lc -= 1
        while lc >= 0:
            w = self.search_layer(vec, qn, eps, ef_construction, lc)
            mmax = 2 * self.m if lc == 0 else self.m
            for d, n in self.select_diverse(node, w, self.m):
                self.adj[node][lc].append(n)
                self.adj[n][lc].append(node)
                if len(self.adj[n][lc]) > mmax:
                    self.prune(n, lc, mmax)
            eps = w
            lc -= 1
        if lvl > self.max_level:
            self.entry = node
            self.max_level = lvl

    def search(self, q, k, ef_search, allow=ALWAYS):
        if self.entry < 0:
            return []
        qn = math.sqrt(seq_dot(q, q))
        eps = [(self.dist(q, qn, self.entry), self.entry)]
        lc = self.max_level
        while lc > 0:
            eps = [self.search_layer(q, qn, eps, 1, lc)[0]]
            lc -= 1
        w = self.search_layer(q, qn, eps, max(ef_search, k), 0, allow)
        return [(self.ids[n], -d) for d, n in w[:k]]


def build_graph(items, m, ef_construction):
    g = Graph(m)
    m_l = 1.0 / math.log(float(m))
    for vid, vec in sorted(items):
        g.insert(vid, vec, m_l, ef_construction)
    return g


def build_segments(items, m, efc, n_segments, seg_base):
    segs = {}
    for vid, vec in items:
        segs.setdefault(seg_base + vid % n_segments, []).append((vid, vec))
    return {s: build_graph(v, m, efc) for s, v in segs.items()}


def serve(graphs, queries, k, ef_search, dead=frozenset()):
    rows = []
    for qid, qv in queries:
        cands = []
        for _, g in sorted(graphs.items()):
            allow = ALWAYS if not dead else (lambda n, g=g: g.ids[n] not in dead)
            for vid, cos in g.search(qv, k, ef_search, allow):
                cands.append((vid, round_long(cos * 1e6)))
        cands.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, c6) in enumerate(cands[:k], start=1):
            rows.append((qid, rank, vid, c6))
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


def to_csv(rows):
    lines = ["query_id,rank,vec_id,cos1e6"]
    lines += [f"{q},{r},{v},{c}" for q, r, v, c in rows]
    return "\n".join(lines) + "\n"


def main(sf_dir, goldens_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()  # float32 -> exact doubles
    corpus = list(zip(ids, vecs))
    queries = [(vid, v) for vid, v in corpus if vid < 20]
    m, efc, ef_search, k = 8, 64, 64, 3

    even = [(i, v) for i, v in corpus if i % 2 == 0]
    odd = [(i, v) for i, v in corpus if i % 2 != 0]
    dead = frozenset(i for i, _ in corpus if i % 7 == 0)
    survivors = [(i, v) for i, v in corpus if i % 7 != 0]

    # served: one build over the full corpus, 8 segments
    full = build_segments(corpus, m, efc, 8, 0)
    # asof: the pre-append view == the even-half build, 4 segments
    base4 = build_segments(even, m, efc, 4, 0)
    # appended: odd half lands as NEW segments after the current max
    appended = dict(base4)
    appended.update(build_segments(odd, m, efc, 4, max(base4) + 1))
    # deleted: the full graphs with the tombstone acceptance filter
    # compacted: a fresh survivor build (determinism makes compaction
    # bit-identical to it — the HnswDeleteSpec contract)
    compacted = build_segments(survivors, m, efc, 8, 0)

    scenarios = {
        "ann_hnsw_served": serve(full, queries, k, ef_search),
        "ann_hnsw_asof": serve(base4, queries, k, ef_search),
        "ann_hnsw_appended": serve(appended, queries, k, ef_search),
        "ann_hnsw_deleted": serve(full, queries, k, ef_search, dead),
        "ann_hnsw_compacted": serve(compacted, queries, k, ef_search),
    }
    rc = 0
    for name, rows in scenarios.items():
        got = to_csv(rows)
        path = f"{goldens_dir}/{name}.csv"
        try:
            want = open(path).read()
        except OSError:
            print(f"MISSING golden {path}")
            rc = 1
            continue
        if got == want:
            print(f"MATCH {name}: byte-identical to the committed golden "
                  f"({len(rows)} rows)")
        else:
            print(f"MISMATCH {name}: independent implementation diverges")
            for i, (a, b) in enumerate(zip(got.splitlines(),
                                           want.splitlines())):
                if a != b:
                    print(f"  line {i}: independent={a!r} committed={b!r}")
                    break
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2
                  else "src/main/resources/goldens"))
