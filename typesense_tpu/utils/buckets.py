"""Power-of-two bucketing for dynamic lengths.

XLA traces/compiles once per static shape. We round every dynamic extent
(driver-list length, candidate counts, query token counts) up to a bucket so
the compile cache stays bounded (~log2 of max size buckets per site) while
masks carry the true lengths.
"""

from __future__ import annotations


def bucket(n: int, lo: int = 8, hi: int = 1 << 22, step: int = 2) -> int:
    """Smallest power of two >= n, clamped to [lo, hi]."""
    if n <= lo:
        return lo
    b = 1 << (n - 1).bit_length()
    return min(b, hi)


def bucket4(n: int, lo: int = 8, hi: int = 1 << 22) -> int:
    """Power-of-FOUR bucket: quarter the distinct shapes of bucket() at the
    cost of <=4x padded work per site. On TPU padded vector work is far
    cheaper than an extra remote compile (tens of seconds through the
    tunnel), so coarse buckets win for anything query-dependent."""
    if n <= lo:
        return lo
    b = 1 << (n - 1).bit_length()
    # round up to the next power of four relative to lo
    while ((b // lo).bit_length() - 1) % 2 != 0:
        b <<= 1
    return min(b, hi)


def pad_to(arr, n: int, fill=0):
    """Pad 1-D/2-D numpy array's first axis to length n with `fill`."""
    import numpy as np
    if arr.shape[0] >= n:
        return arr[:n]
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)
