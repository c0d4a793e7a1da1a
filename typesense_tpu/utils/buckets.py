"""Power-of-two bucketing for dynamic lengths.

XLA traces/compiles once per static shape. We round every dynamic extent
(driver-list length, candidate counts, query token counts) up to a bucket so
the compile cache stays bounded (~log2 of max size buckets per site) while
masks carry the true lengths.
"""

from __future__ import annotations


def bucket(n: int, lo: int = 8, hi: int = 1 << 22) -> int:
    """Smallest power of two >= n, clamped to [lo, hi]."""
    if n <= lo:
        return lo
    b = 1 << (n - 1).bit_length()
    return min(b, hi)


def pad_to(arr, n: int, fill=0):
    """Pad 1-D/2-D numpy array's first axis to length n with `fill`."""
    import numpy as np
    if arr.shape[0] >= n:
        return arr[:n]
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)
