"""Single-process NumPy oracle for conformance testing (FIXTURES.md §4).

Computes, with NO Ray and no LSH approximation:
- all-pairs exact token-shingle Jaccard (pruned only by the *provable*
  size-ratio bound |A|/|B| >= t),
- all-pairs exact common-substring detection (every L-codepoint window hashed, hash
  collisions re-verified against the actual bytes),
- union-find clustering over the resulting dup pairs,
- the expected report statuses (best = max quality, url tie-break).

The Ray pipeline's dup-pair recall vs this oracle must be >= 0.99 (north rule).
Reference analog: the expected-group assertions of
/root/reference/tests/performance/test_deduplication_process.py:154-171.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .config import DedupConfig
from .functions.hashing import _char_kgram_hashes
from .functions.text import normalize_text, shingle_set


class UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


@dataclass
class OracleResult:
    urls: list
    jaccard_pairs: set = field(default_factory=set)    # {(i, j)} index pairs, i<j
    substring_pairs: set = field(default_factory=set)
    clusters: dict = field(default_factory=dict)       # url -> cluster root url
    statuses: dict = field(default_factory=dict)       # url -> Best|Duplicate|Unique

    @property
    def dup_pairs(self) -> set:
        return self.jaccard_pairs | self.substring_pairs


def oracle_dedup(urls: list, texts: list, cfg: DedupConfig) -> OracleResult:
    """Ground-truth duplicate pairs + clusters + report statuses."""
    n = len(urls)
    norm = [normalize_text(t) for t in texts]
    shingles = [shingle_set(t, cfg.shingle_k) for t in texts]
    sizes = np.array([len(s) for s in shingles], dtype=np.int64)
    res = OracleResult(urls=list(urls))

    # --- exact Jaccard via inverted index: any pair with J >= t > 0 shares at
    # least one shingle, so enumerating co-occurring doc pairs per shingle and
    # counting them gives the exact intersection size for every candidate ---
    t = cfg.jaccard_threshold
    if n > 1 and sizes.sum() > 0:
        all_sh = np.concatenate(shingles)
        all_doc = np.repeat(np.arange(n, dtype=np.int64), sizes)
        o = np.lexsort((all_doc, all_sh))
        S, D = all_sh[o], all_doc[o]
        bounds = np.append(np.nonzero(S[1:] != S[:-1])[0] + 1, len(S))
        codes = []
        start = 0
        for end in bounds:
            g = end - start
            if g > 1:
                d = D[start:end]  # ascending, unique (shingle sets are unique per doc)
                ia, ib = np.triu_indices(g, k=1)
                codes.append(d[ia] * n + d[ib])
            start = end
        if codes:
            pair_codes, inter = np.unique(np.concatenate(codes), return_counts=True)
            pi = pair_codes // n
            pj = pair_codes % n
            union = sizes[pi] + sizes[pj] - inter
            ok = inter >= t * np.maximum(union, 1)
            for a, b in zip(pi[ok], pj[ok]):
                res.jaccard_pairs.add((int(a), int(b)))

    # --- exact common substrings >= L CHARS: hash every L-codepoint window,
    # verify codepoints (unit matches the SQL substr/length oracle) ---
    L = cfg.min_substring_len
    win_hashes, win_docs, win_pos = [], [], []
    datas = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in norm]
    for i, data in enumerate(datas):
        h = _char_kgram_hashes(data, L)
        if len(h):
            win_hashes.append(h)
            win_docs.append(np.full(len(h), i, dtype=np.int64))
            win_pos.append(np.arange(len(h), dtype=np.int64))
    if win_hashes:
        H = np.concatenate(win_hashes)
        D = np.concatenate(win_docs)
        P = np.concatenate(win_pos)
        o = np.argsort(H, kind="stable")
        H, D, P = H[o], D[o], P[o]
        start = 0
        for end in np.append(np.nonzero(H[1:] != H[:-1])[0] + 1, len(H)):
            group_docs = D[start:end]
            if len(np.unique(group_docs)) > 1:
                idx = np.arange(start, end)
                # verify actual bytes across each cross-doc pair (collision safety)
                for a_ in range(len(idx)):
                    for b_ in range(a_ + 1, len(idx)):
                        di, dj = int(D[idx[a_]]), int(D[idx[b_]])
                        if di == dj:
                            continue
                        pi, pj = int(P[idx[a_]]), int(P[idx[b_]])
                        if np.array_equal(
                            datas[di][pi : pi + L], datas[dj][pj : pj + L]
                        ):
                            res.substring_pairs.add((min(di, dj), max(di, dj)))
            start = end

    # --- union-find + statuses ---
    uf = UnionFind(n)
    for a, b in res.dup_pairs:
        uf.union(a, b)
    roots: dict[int, list[int]] = {}
    for i in range(n):
        roots.setdefault(uf.find(i), []).append(i)
    quality = np.array([len(t) for t in texts], dtype=np.float64)
    for root, members in roots.items():
        for m in members:
            res.clusters[urls[m]] = urls[min(members)]
        if len(members) == 1:
            res.statuses[urls[members[0]]] = "Unique"
        else:
            best = min(members, key=lambda m: (-quality[m], urls[m]))
            for m in members:
                res.statuses[urls[m]] = "Best" if m == best else "Duplicate"
    return res
