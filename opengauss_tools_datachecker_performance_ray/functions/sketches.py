"""Mergeable per-column sketches: HLL distinct, t-digest quantiles,
min/max/null counts, capped categorical counters.

North-rule extension — the reference has no column statistics at all
(SURVEY.md §2.5); these are the standard mergeable-summaries designs
(Flajolet et al. HyperLogLog; Dunning's merging t-digest), implemented
with numpy so a batch is absorbed vectorized. Mergeability is the
contract that makes them Ray-Data-friendly: one partial sketch per
batch inside ``map_batches``, then a tiny tree/actor merge — never a
row shuffle.
"""

from __future__ import annotations

import math

import numpy as np


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

class HLL:
    """HyperLogLog with 2^p registers over pre-hashed uint64 values."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of rest + 1 (capped at 64-p+1 when rest==0)
        lz = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # float64 log2 is exact enough for leading-zero counting of
            # the top 53 bits; values with >=53 leading zeros fall back
            f = rest[nz].astype(np.float64)
            lz_nz = (63 - np.floor(np.log2(f))).astype(np.uint8) + 1
            lz[nz] = np.minimum(lz_nz, 64 - self.p + 1)
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    # sparse pickle: a small group's partial profile would otherwise
    # ship all 2^p registers (16 KB of zeros) — at 10^5 (batch, group)
    # drift partials that is GBs of shuffle for KBs of information.
    # Densely-populated sketches still ship raw register bytes.
    def __getstate__(self):
        nz = np.flatnonzero(self.registers)
        if len(nz) < self.m // 16:
            return ("sparse", self.p, nz.astype(np.int32).tobytes(),
                    self.registers[nz].tobytes())
        return ("dense", self.p, self.registers.tobytes())

    def __setstate__(self, state):
        self.p = state[1]
        self.m = 1 << self.p
        if state[0] == "dense":
            self.registers = np.frombuffer(
                state[2], dtype=np.uint8).copy()
        else:
            self.registers = np.zeros(self.m, dtype=np.uint8)
            idx = np.frombuffer(state[2], dtype=np.int32)
            self.registers[idx] = np.frombuffer(state[3], dtype=np.uint8)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting
        return float(e)


# --------------------------------------------------------------------------
# Merging t-digest (Dunning & Ertl) — k1-ish scale, buffer + compress
# --------------------------------------------------------------------------

class TDigest:
    """Mergeable quantile sketch over float64 values."""

    __slots__ = ("delta", "means", "weights", "_buf", "n", "vmin", "vmax")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self._buf: list[tuple[np.ndarray, np.ndarray]] = []
        self.n = 0.0
        self.vmin = math.inf
        self.vmax = -math.inf

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.n += len(v)
        self._buf.append((v, np.ones(len(v))))
        if sum(len(b[0]) for b in self._buf) > 8 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        out.n = self.n + other.n
        out.vmin = min(self.vmin, other.vmin)
        out.vmax = max(self.vmax, other.vmax)
        self._compress(); other._compress()
        out._buf = [(np.concatenate([self.means, other.means]),
                     np.concatenate([self.weights, other.weights]))]
        out._compress()
        return out

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta * (np.arcsin(2 * np.clip(q, 0, 1) - 1) / math.pi + 0.5)

    def _k1(self, q: float) -> float:
        if q < 0.0:
            q = 0.0
        elif q > 1.0:
            q = 1.0
        return self.delta * (math.asin(2.0 * q - 1.0) / math.pi + 0.5)

    def _compress(self) -> None:
        if not self._buf and len(self.means):
            return
        means = np.concatenate([self.means] + [b[0] for b in self._buf]) \
            if self._buf else self.means
        weights = np.concatenate([self.weights] + [b[1] for b in self._buf]) \
            if self._buf else self.weights
        self._buf = []
        if not len(means):
            return
        order = np.argsort(means, kind="stable")
        # plain-float greedy walk (same arithmetic as the original
        # per-centroid numpy version, ~30x faster: the scalar k() and
        # list indexing drop the per-iteration array allocations that
        # made 10^4 driver-side merges cost minutes)
        ml = means[order].tolist()
        wl = weights[order].tolist()
        total = float(weights.sum())
        out_m, out_w = [], []
        cur_m, cur_w = ml[0], wl[0]
        cum = 0.0
        k1 = self._k1
        for i in range(1, len(ml)):
            wi = wl[i]
            if k1((cum + cur_w + wi) / total) - k1(cum / total) <= 1.0:
                cur_m = (cur_m * cur_w + ml[i] * wi) / (cur_w + wi)
                cur_w += wi
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = ml[i], wi
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    @staticmethod
    def merge_many(digests: "list[TDigest]") -> "TDigest | None":
        """Fold many digests with ONE compression over the concatenated
        centroids — the global-baseline fold at 10^4+ groups pays one
        O(total centroids) pass instead of 10^4 pairwise compressions."""
        ds = [d for d in digests if d is not None]
        if not ds:
            return None
        for d in ds:
            d._compress()
        out = TDigest(ds[0].delta)
        out.n = float(sum(d.n for d in ds))
        out.vmin = min(d.vmin for d in ds)
        out.vmax = max(d.vmax for d in ds)
        means = np.concatenate([d.means for d in ds
                                if len(d.means)] or [np.empty(0)])
        weights = np.concatenate([d.weights for d in ds
                                  if len(d.weights)] or [np.empty(0)])
        if len(means):
            out._buf = [(means, weights)]
            out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        if not len(self.means):
            return math.nan
        if q <= 0:
            return self.vmin
        if q >= 1:
            return self.vmax
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means,
                               left=self.vmin, right=self.vmax))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        """Approximate CDF at points x (for KS drift tests)."""
        self._compress()
        if not len(self.means):
            return np.full(len(np.atleast_1d(x)), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        return np.interp(np.atleast_1d(x).astype(np.float64),
                         self.means, cum / total, left=0.0, right=1.0)


# --------------------------------------------------------------------------
# Capped categorical counter (for PSI drift / top-k values)
# --------------------------------------------------------------------------

class TopCounter:
    """Exact value counts, capped at ``cap`` distinct keys (then 'other')."""

    __slots__ = ("cap", "counts", "other")

    def __init__(self, cap: int = 1000):
        self.cap = cap
        self.counts: dict[str, int] = {}
        self.other = 0

    def add(self, values: np.ndarray, counts: np.ndarray) -> None:
        for v, c in zip(values, counts):
            key = str(v)
            if key in self.counts:
                self.counts[key] += int(c)
            elif len(self.counts) < self.cap:
                self.counts[key] = int(c)
            else:
                self.other += int(c)

    def merge(self, other: "TopCounter") -> "TopCounter":
        out = TopCounter(self.cap)
        out.counts = dict(self.counts)
        out.other = self.other + other.other
        for k, c in other.counts.items():
            if k in out.counts:
                out.counts[k] += c
            elif len(out.counts) < out.cap:
                out.counts[k] = c
            else:
                out.other += c
        return out
