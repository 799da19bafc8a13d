"""Brute-force numpy oracle: ground-truth dup pairs + union-find clusters.

Plays the role of the reference's fixture artifacts (`cluster_results.csv` +
`pairs-test-sample.parquet`, /root/reference/tests/test_cluster_pairs.py:30-39
and /root/reference/Clusters.md:29-57): an independent, exact implementation
the Spark pipeline is gated against (dup-pair recall >= 0.99, BASELINE.json).

Exactness notes:
  - Jaccard: candidates via an inverted shingle index (complete: J > 0 implies
    a shared shingle), exact set Jaccard on each candidate — no approximation.
  - pHash Hamming: all-pairs over *unique* phash values (chunked numpy XOR +
    popcount), expanded back to ids.
  - Substring: each caption searched in the concatenation of all captions
    (str.find loop over true occurrences only — near-linear).
Dedup by identical caption first keeps the viral family from exploding the
candidate set; identical-caption groups are linked exactly (J = 1).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np

from .config import DedupConfig, DEFAULT
from .signatures import jaccard, shingle_hashes


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root so cluster ids are deterministic (SURVEY.md §4.2)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    out = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        out += _POP8[(x & np.uint64(0xFF)).astype(np.int64)]
        x >>= np.uint64(8)
    return out


def oracle_pairs(rows: list[dict], cfg: DedupConfig = DEFAULT) -> set[tuple[str, str]]:
    """All ground-truth dup pairs (id_a < id_b) under the frozen config."""
    ids = [r["image_id"] for r in rows]
    captions = [r["caption"] for r in rows]
    pairs: set[tuple[str, str]] = set()

    def add(a: str, b: str):
        if a != b:
            pairs.add((a, b) if a < b else (b, a))

    # ---- exact: identical bytes + caption (reference filter.py:51-57)
    by_exact: dict[tuple, list[str]] = defaultdict(list)
    for r in rows:
        by_exact[(hashlib.sha256(r["bytes"]).hexdigest(), r["caption"])].append(r["image_id"])
    for members in by_exact.values():
        for i in range(1, len(members)):
            add(members[0], members[i])
            for j in range(1, i):
                add(members[j], members[i])

    # ---- caption Jaccard >= threshold (unique captions, inverted index)
    uniq: dict[str, list[str]] = defaultdict(list)
    for i, c in enumerate(captions):
        uniq[c].append(ids[i])
    uc = sorted(uniq)  # deterministic order
    shingles = [shingle_hashes(c, cfg.shingle_k) for c in uc]
    index: dict[int, list[int]] = defaultdict(list)
    for i, sh in enumerate(shingles):
        for v in sh.tolist():
            index[v].append(i)
    cand: set[tuple[int, int]] = set()
    for lst in index.values():
        if len(lst) > 1:
            for i in range(len(lst)):
                for j in range(i + 1, len(lst)):
                    cand.add((lst[i], lst[j]))
    dup_caption_pairs = [
        (i, j) for (i, j) in cand if jaccard(shingles[i], shingles[j]) >= cfg.jaccard_threshold
    ]
    # expand unique-caption pairs to id pairs; identical-caption groups are J=1 cliques
    for members in uniq.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                add(members[i], members[j])
    for i, j in dup_caption_pairs:
        for a in uniq[uc[i]]:
            for b in uniq[uc[j]]:
                add(a, b)

    # ---- pHash Hamming <= threshold (unique values, chunked all-pairs)
    ph = np.array([r["phash"] for r in rows], dtype=np.int64).astype(np.uint64)
    uph, inv = np.unique(ph, return_inverse=True)
    groups: dict[int, list[str]] = defaultdict(list)
    for i, g in enumerate(inv):
        groups[int(g)].append(ids[i])
    n = uph.size
    chunk = 2048
    for lo in range(0, n, chunk):
        block = uph[lo : lo + chunk]
        d = _popcount(block[:, None] ^ uph[None, :])
        ii, jj = np.nonzero(d <= cfg.hamming_threshold)
        for bi, gj in zip(ii.tolist(), jj.tolist()):
            gi = lo + bi
            if gi < gj:
                for a in groups[gi]:
                    for b in groups[gj]:
                        add(a, b)
    for members in groups.values():  # identical phash, distinct rows
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                add(members[i], members[j])

    # ---- substring: caption B (len >= min) contained in caption A
    sep = "\x00"
    big = sep.join(c.lower() for c in uc)
    offsets = np.zeros(len(uc) + 1, dtype=np.int64)
    for i, c in enumerate(uc):
        offsets[i + 1] = offsets[i] + len(c.lower()) + 1
    for bi, cb in enumerate(uc):
        needle = cb.lower()
        if len(needle) < cfg.substr_min_len:
            continue
        start = 0
        while True:
            pos = big.find(needle, start)
            if pos < 0:
                break
            start = pos + 1
            ai = int(np.searchsorted(offsets, pos, side="right") - 1)
            if ai != bi and pos + len(needle) <= offsets[ai + 1] - 1:
                for a in uniq[uc[ai]]:
                    for b in uniq[cb]:
                        add(a, b)
    return pairs


def oracle_clusters(
    rows: list[dict], pairs: set[tuple[str, str]] | None = None, cfg: DedupConfig = DEFAULT
) -> dict[str, str]:
    """image_id -> cluster_id (= min image_id of the component; singletons self)."""
    if pairs is None:
        pairs = oracle_pairs(rows, cfg)
    uf = UnionFind()
    for r in rows:
        uf.find(r["image_id"])
    for a, b in pairs:
        uf.union(a, b)
    # path-compress to true min root: UnionFind.union keeps min as root already
    return {r["image_id"]: uf.find(r["image_id"]) for r in rows}


def cosine_cluster_oracle(
    ids: list[str], X: np.ndarray, threshold: float
) -> tuple[dict[str, str], list[tuple[int, int]]]:
    """Brute-force oracle for semantic dedup (ann.semantic_dedup): all-pairs
    cosine >= threshold -> union-find components rooted at the min id (ids
    must be ordered so positional min == string min, e.g. zero-padded).
    Returns (id -> root id, list of qualifying index pairs i<j). Shared by
    the in-contract q57 gate (tools/check_contract.py) and the nlist=1
    equality pytest so the two checks can never drift apart."""
    m = np.asarray(X, dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    cos = m @ m.T
    ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
    parent = list(range(len(ids)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    pairs = list(zip(ii.tolist(), jj.tolist()))
    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    return {ids[i]: ids[find(i)] for i in range(len(ids))}, pairs
