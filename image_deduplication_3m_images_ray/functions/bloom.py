"""Membership filters for broadcast semi-joins: exact sorted-id sets and a
vectorized, mergeable Bloom filter.

The verify attach ships a profile row only when its doc id appears in some
candidate pair.  Below ``attach_semijoin_max_ids`` the filter is an exact
sorted uint64 array (:class:`SortedIdSet`); above it the exact set no longer
fits a broadcast object, so the scale path is :class:`BloomFilter` — fixed
memory (``m_bits/8`` bytes no matter how many ids), no false negatives (a
row that must ship always ships), and false positives only ship extra rows
that the attach shard drops anyway.  Reference analog: the processed-set
membership filter (`/root/reference/pipeline.py:464-476`), which holds the
exact set in one process; here the same contract is met distributedly.

Both classes expose the same ``contains(ids) -> bool mask`` surface so the
attach's profile-prep closure is agnostic to which engaged.

Bloom construction is numpy-vectorized double hashing (Kirsch-Mitzenmacher:
``pos_i = h1 + i*h2 mod m`` probes a full cycle when ``h2`` is odd and ``m``
is a power of two) over the splitmix64 finalizer — deterministic, so reruns
build bit-identical filters (the repo-wide determinism contract).  Word
arrays merge by elementwise OR (associative, commutative, idempotent), which
is what lets per-block partial filters tree-reduce without ever collecting
raw ids on the driver.
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, splitmix64

_H2_SALT = U64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


class SortedIdSet:
    """Exact membership over a SORTED uint64 id array (broadcast-sized)."""

    __slots__ = ("ids",)

    def __init__(self, ids: np.ndarray):
        self.ids = np.asarray(ids, dtype=U64)

    def __len__(self) -> int:
        return len(self.ids)

    def contains(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=U64)
        if len(self.ids) == 0:
            return np.zeros(len(ids), dtype=bool)
        loc = np.minimum(np.searchsorted(self.ids, ids), len(self.ids) - 1)
        return self.ids[loc] == ids


class BloomFilter:
    """``m_bits``-bit Bloom filter with ``n_hashes`` probes per id.

    ``m_bits`` must be a power of two (probe positions mask instead of mod).
    False-positive rate ~ ``(1 - exp(-k*n/m))**k``; at the default sizing of
    12 bits/id with k=8 that is ~3e-4.  No false negatives ever.
    """

    __slots__ = ("words", "n_hashes")

    def __init__(self, m_bits: int, n_hashes: int = 8, words: np.ndarray | None = None):
        if m_bits <= 0 or m_bits % 64 or (m_bits & (m_bits - 1)):
            raise ValueError("m_bits must be a power of two >= 64")
        self.words = (
            np.zeros(m_bits // 64, dtype=U64) if words is None else np.asarray(words, U64)
        )
        if len(self.words) * 64 != m_bits:
            raise ValueError("words length inconsistent with m_bits")
        self.n_hashes = int(n_hashes)

    @property
    def m_bits(self) -> int:
        return len(self.words) * 64

    @staticmethod
    def size_bits(n_ids_upper: int, bits_per_id: int, max_bits: int = 1 << 33) -> int:
        """Power-of-two bit count for an expected id upper bound, clamped to
        [2^16, max_bits] (2^16 = 8 KB floor; default 2^33 = 1 GB ceiling —
        a broadcast object, not driver heap pressure, at cluster scale)."""
        want = max(1 << 16, bits_per_id * max(n_ids_upper, 1))
        m = 1 << (int(want - 1).bit_length())
        return min(m, max_bits)

    def _positions(self, ids: np.ndarray) -> np.ndarray:
        """(n_hashes, n) probe positions in [0, m_bits)."""
        ids = np.asarray(ids, dtype=U64)
        with np.errstate(over="ignore"):
            h1 = splitmix64(ids)
            h2 = splitmix64(ids ^ _H2_SALT) | U64(1)
            i = np.arange(self.n_hashes, dtype=U64)[:, None]
            return (h1[None, :] + i * h2[None, :]) & U64(self.m_bits - 1)

    def add(self, ids: np.ndarray) -> "BloomFilter":
        if len(ids) == 0:
            return self
        pos = self._positions(ids).ravel()
        np.bitwise_or.at(
            self.words, (pos >> U64(6)).astype(np.int64), U64(1) << (pos & U64(63))
        )
        return self

    def contains(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=U64)
        if len(ids) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(ids)
        w = self.words[(pos >> U64(6)).astype(np.int64)]
        hit = (w >> (pos & U64(63))) & U64(1)
        return np.logical_and.reduce(hit.astype(bool), axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Elementwise-OR merge (filters must share m_bits and n_hashes)."""
        if self.m_bits != other.m_bits or self.n_hashes != other.n_hashes:
            raise ValueError("cannot merge differently-shaped Bloom filters")
        return BloomFilter(self.m_bits, self.n_hashes, self.words | other.words)

    def fill_fraction(self) -> float:
        """Fraction of set bits — a cheap saturation diagnostic."""
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


def build_bloom_distributed(ds, ids_of_batch, m_bits: int, n_hashes: int = 8) -> BloomFilter:
    """Distributed Bloom build over ``ids_of_batch(block) -> uint64[]``.

    Per-block partial filters (fixed ``m_bits/8`` bytes each regardless of
    block id count) are built inside ``map_batches`` and OR-merged by a
    fan-in-8 tree of Ray tasks — the driver only ever holds object refs plus
    the single final filter, never raw ids.  Empty input blocks pass through
    ``map_batches`` without the UDF running (they keep the input schema) and
    are skipped at merge time.
    """
    import pyarrow as pa
    import ray

    def partial(t: pa.Table) -> pa.Table:
        f = BloomFilter(m_bits, n_hashes).add(ids_of_batch(t))
        return pa.table({"bloom_words": pa.array([f.words.tobytes()])})

    refs = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).to_arrow_refs()

    @ray.remote
    def or_merge(*parts):
        acc = np.zeros(m_bits // 64, dtype=U64)
        for p in parts:
            if p.num_rows == 0 or "bloom_words" not in p.schema.names:
                continue
            col = p["bloom_words"]
            for chunk in col.chunks if hasattr(col, "chunks") else [col]:
                for buf in chunk:
                    acc |= np.frombuffer(buf.as_py(), dtype=U64)
        return pa.table({"bloom_words": pa.array([acc.tobytes()])})

    fanin = 8
    while len(refs) > 1:
        refs = [or_merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)]
    if not refs:
        return BloomFilter(m_bits, n_hashes)
    final = ray.get(refs[0])
    if final.num_rows == 0 or "bloom_words" not in final.schema.names:
        return BloomFilter(m_bits, n_hashes)
    return BloomFilter(
        m_bits, n_hashes, np.frombuffer(final["bloom_words"][0].as_py(), U64).copy()
    )
