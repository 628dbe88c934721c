"""Bench-scale deterministic synthetic power-law webgraph (FIXTURES.md §3
`powerlaw_s42`, bench scale: ~1M pages / ~16M links).

Same copy-model as sources/pages.py (target = ⌊u²·i⌋, quadratic bias →
heavy-tailed in-degree) but with a numpy-vectorized splitmix64 mix in
place of per-row md5, so generating 16M edges takes seconds, not
minutes. Deterministic in (n, m, seed): both scaling runs read
IDENTICAL bytes (BASELINE.md protocol).
"""

from __future__ import annotations

import os

import numpy as np

MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + 0x9E3779B97F4A7C15) & MASK
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def powerlaw_edges_np(n: int, m: int = 8, seed: int = 42) -> np.ndarray:
    """(E, 2) int64 array of distinct directed edges, 1-based vids."""
    i = np.repeat(np.arange(1, n, dtype=np.uint64), m)
    k = np.tile(np.arange(m, dtype=np.uint64), n - 1)
    h = _splitmix64((np.uint64(seed) * np.uint64(0x100000001B3) ^ (i << np.uint64(20)) ^ k) & np.uint64(MASK))
    frac = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    t = np.floor(frac * frac * i.astype(np.float64)).astype(np.int64)
    src = i.astype(np.int64) + 1
    dst = t + 1
    keep = src != dst
    e = np.stack([src[keep], dst[keep]], axis=1)
    return np.unique(e, axis=0)


def materialize_parquet(path: str, n: int = 1_000_000, m: int = 16, seed: int = 42) -> str:
    """Write the graph once (idempotent) and return the path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    e = powerlaw_edges_np(n, m, seed)
    table = pa.table({"src": e[:, 0], "dst": e[:, 1]})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path + ".tmp", row_group_size=1 << 20)
    os.rename(path + ".tmp", path)
    return path
