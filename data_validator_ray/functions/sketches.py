"""Mergeable sketches for distributed checks: HyperLogLog (approximate
distinct counts for uniqueness at scale), a merging t-digest (quantile
stats / KS drift), and a Bloom filter (approximate referential checks).

All three are associative/commutative merges, so per-batch partials
computed inside ``map_batches`` combine to the exact same sketch
regardless of batch order or parallelism level — that is what makes
them safe under Ray's streaming executor (SURVEY.md §2.5 T5). Pure
numpy, no external deps; algorithms follow the published papers
(Flajolet et al. 2007 HLL; Dunning & Ertl 2019 t-digest; Bloom 1970).
"""

from __future__ import annotations

import pickle
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd


try:
    import polars as _pl
except ImportError:  # pragma: no cover — polars is baked into this env
    _pl = None


def hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of an arbitrary array-like (nulls allowed).

    Prefers polars' Rust xxhash (27× faster than pandas' SipHash on
    string columns, measured at 64Ki urls); deterministic across
    processes/workers for a fixed seed within a polars version — the
    property sketch merging and shuffle bucketing need. Accepts Arrow
    arrays directly (zero-copy into polars — the pandas round-trip cost
    more than the hashing). Falls back to pandas when polars is absent.
    Distinct ``seed`` values give independent hash families (used by the
    128-bit collision-checked distinct scheme).
    """
    import pyarrow as pa

    if _pl is not None:
        try:
            if isinstance(values, (pa.Array, pa.ChunkedArray)):
                ser = _pl.from_arrow(values)
            else:
                ser = _pl.Series(values)
            return ser.hash(seed=seed).to_numpy().astype(np.uint64)
        except (TypeError, ValueError):
            pass  # exotic dtype → pandas path
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    ser = pd.Series(values)
    if seed == 0:
        return pd.util.hash_pandas_object(ser, index=False).to_numpy(
            dtype=np.uint64
        )
    key = f"{seed:016d}"[-16:]
    return pd.util.hash_pandas_object(
        ser, index=False, hash_key=key
    ).to_numpy(dtype=np.uint64)


class HyperLogLog:
    """Dense HLL with 2**p registers (default p=14 → ~0.8% error)."""

    def __init__(self, p: int = 14, registers: Optional[np.ndarray] = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rank = number of leading zeros in the (64-p)-bit suffix, + 1
        wf = w.astype(np.float64)
        _, exp = np.frexp(wf)  # bit length of w for w > 0
        rank = np.where(w == 0, 64 - self.p + 1, (64 - self.p) - exp + 1).astype(
            np.uint8
        )
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        est = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers))

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        p, regs = pickle.loads(data)
        return cls(p, regs)


class TDigest:
    """Merging t-digest (k1-style size bound) for streaming quantiles.

    Centroids are kept sorted by mean; :meth:`compress` re-clusters the
    full sorted list, so merging is order-insensitive up to compression
    ties — callers merge partials in a fixed (partition-id) order for
    bit-level determinism (SURVEY.md §7 hard parts).
    """

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: List[np.ndarray] = []
        self.n = 0.0
        self.min = np.inf
        self.max = -np.inf

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf.append(v)
        self.n += v.size
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        if sum(b.size for b in self._buf) > 100_000:
            self.compress()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta * (np.arcsin(2 * q - 1) / np.pi + 0.5)

    def compress(self) -> None:
        """Fully vectorized re-cluster: every point maps to the k-scale
        bucket of its mid-quantile (``floor(k(q_mid))``), consecutive
        equal buckets merge via ``np.add.reduceat``. No Python loop —
        this runs per 64Ki-row batch in the fused kernel (the loop
        version was the whole pipeline's bottleneck at 9 ms/1k rows)."""
        if self._buf:
            bufv = np.concatenate(self._buf)
            bufw = np.ones_like(bufv)
            means = np.concatenate([self.means, bufv])
            weights = np.concatenate([self.weights, bufw])
            self._buf = []
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        q_mid = (np.cumsum(weights) - weights / 2.0) / total
        ids = np.floor(self._k(np.clip(q_mid, 0.0, 1.0))).astype(np.int64)
        starts = np.nonzero(np.concatenate([[True], ids[1:] != ids[:-1]]))[0]
        w_out = np.add.reduceat(weights, starts)
        self.means = np.add.reduceat(means * weights, starts) / w_out
        self.weights = w_out

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        self.compress()
        other.compress()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out.n = self.n + other.n
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        out.compress()
        return out

    def quantile(self, q: float) -> float:
        self.compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.n
        if target <= cum[0]:
            return float(self.min)
        if target >= cum[-1]:
            return float(self.max)
        return float(np.interp(target, cum, self.means))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        """Approximate CDF at points x (for KS drift)."""
        self.compress()
        if self.means.size == 0:
            return np.full(len(x), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return np.interp(x, self.means, cum / self.n, left=0.0, right=1.0)

    def to_bytes(self) -> bytes:
        self.compress()
        return pickle.dumps(
            (self.delta, self.means, self.weights, self.n, self.min, self.max)
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        delta, means, weights, n, mn, mx = pickle.loads(data)
        td = cls(delta)
        td.means, td.weights, td.n, td.min, td.max = means, weights, n, mn, mx
        return td


class BloomFilter:
    """Fixed-size Bloom filter over 64-bit hashes (double hashing)."""

    def __init__(self, n_bits: int = 1 << 23, k: int = 5,
                 bits: Optional[np.ndarray] = None):
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(
            np.int64
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        present = (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return present.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        return BloomFilter(self.n_bits, self.k, np.bitwise_or(self.bits, other.bits))

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.n_bits, self.k, self.bits))

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        n_bits, k, bits = pickle.loads(data)
        return cls(n_bits, k, bits)


class KMV:
    """k-minimum-values distinct sketch over 64-bit hashes: keeps the
    k smallest DISTINCT hash values seen. Mergeable (k smallest of the
    union), deterministic (hash-based, no RNG), and — unlike HLL —
    supports set-OVERLAP estimation: the Jaccard of two sets is
    estimated by the shared fraction of the merged sketch's k minima
    (Beyer et al., "On synopses for distinct-value estimation").
    Relative error ~1/√k. A sketch holding fewer than k values has
    seen every distinct element — estimates are then exact."""

    def __init__(self, k: int = 1024, values: Optional[np.ndarray] = None):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.values = (
            values if values is not None else np.empty(0, np.uint64)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        merged = np.concatenate(
            [self.values, hashes.astype(np.uint64, copy=False)]
        )
        self.values = np.unique(merged)[: self.k]

    def merge(self, other: "KMV") -> "KMV":
        assert self.k == other.k
        vals = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        return KMV(self.k, vals)

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)  # saw everything — exact
        return (self.k - 1) * (2.0 ** 64) / float(self.values[self.k - 1])

    @staticmethod
    def overlap(a: "KMV", b: "KMV") -> "dict":
        """Jaccard / union / intersection estimates of the two sketched
        sets. Exact when both sketches are unsaturated."""
        assert a.k == b.k
        u = a.merge(b)
        kp = len(u.values)
        if kp == 0:
            return {"jaccard": float("nan"), "union": 0.0, "intersection": 0.0}
        shared = np.intersect1d(
            np.intersect1d(u.values, a.values, assume_unique=True),
            b.values,
            assume_unique=True,
        )
        j = len(shared) / kp
        if kp < a.k:
            # unsaturated merge: the sketch IS the union — exact
            return {
                "jaccard": j,
                "union": float(kp),
                "intersection": float(len(shared)),
            }
        union_est = u.estimate()
        return {
            "jaccard": j,
            "union": union_est,
            "intersection": j * union_est,
        }


def canonical_key_table(table, columns) -> "object":
    """Numeric/temporal key components normalized to ONE hash domain so
    tuple identity matches SQL equality across storage types (int 1 =
    float 1.0 = decimal 1.00; timestamps compare by instant regardless
    of unit): integers/floats/decimals cast to float64 (exact for
    |v| ≤ 2⁵³ — document the key-domain envelope), timestamps/dates to
    microsecond instants. NULLs survive the casts; other types hash
    native. Used by the composite-referential check on BOTH sides."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arrs = {}
    for c in columns:
        col = table[c]
        t = col.type
        if (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_decimal(t)
        ):
            col = pc.cast(col, pa.float64())
        elif pa.types.is_timestamp(t):
            col = pc.cast(col, pa.timestamp("us"))
        elif pa.types.is_date(t):
            col = pc.cast(col, pa.timestamp("us"))
        arrs[c] = col
    return pa.table(arrs)


class HashPairSet:
    """Collision-checked membership set over 128-bit identities — two
    independent 64-bit hash families per element (the exact-uniqueness
    convention): a probe is a member iff BOTH h1 and h2 match the same
    stored element, so the false-positive probability is ~n²/2⁻¹²⁸
    (treated as exact, like the 16-byte double-hash distinct shuffle).
    Stores two sorted int64 arrays — 16 bytes per distinct element,
    broadcast-friendly."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray):
        order = np.lexsort((h2, h1))
        self.h1 = np.ascontiguousarray(h1[order])
        self.h2 = np.ascontiguousarray(h2[order])

    def __len__(self) -> int:
        return len(self.h1)

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(self.h1) == 0 or len(h1) == 0:
            return np.zeros(len(h1), dtype=bool)
        lo = np.searchsorted(self.h1, h1, "left")
        hi = np.searchsorted(self.h1, h1, "right")
        out = np.zeros(len(h1), dtype=bool)
        single = hi == lo + 1  # the overwhelmingly common case
        idx = np.minimum(lo, len(self.h1) - 1)
        out[single] = self.h2[idx[single]] == h2[single]
        multi = np.flatnonzero(hi - lo > 1)  # h1 collisions in the set
        for i in multi:
            out[i] = bool(
                np.any(self.h2[lo[i] : hi[i]] == h2[i])
            )
        return out


def combined_hash64(table, columns, seed: int = 0) -> np.ndarray:
    """Row-wise 64-bit hash of a column TUPLE: per-column
    :func:`hash64` values mixed with an FNV-style multiply-xor fold
    (order-sensitive, so ``(a, b)`` ≠ ``(b, a)``). Distinct ``seed``
    values yield independent families — the composite-key uniqueness
    shuffle uses two, exactly like the single-column scheme."""
    import pyarrow as pa  # noqa: F401  (Table access below)

    h = hash64(table[columns[0]], seed=seed)
    prime = np.uint64(0x100000001B3)
    for c in columns[1:]:
        h = (h * prime) ^ hash64(table[c], seed=seed)
    return h
