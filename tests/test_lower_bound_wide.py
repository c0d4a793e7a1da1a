"""lower_bound_wide must agree with the binary lower_bound on every
(range, target) case — including empty ranges, duplicates, and
out-of-range targets."""

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax.numpy as jnp

from typesense_tpu.ops.postings import lower_bound, lower_bound_wide


def test_wide_matches_binary_random():
    rng = np.random.default_rng(0)
    flat = np.sort(rng.integers(0, 5000, 20000)).astype(np.int32)
    iters = int(np.ceil(np.log2(len(flat)))) + 1
    for trial in range(5):
        lo = rng.integers(0, len(flat), (8, 256)).astype(np.int32)
        hi = np.minimum(lo + rng.integers(0, 4000, lo.shape), len(flat)) \
            .astype(np.int32)
        x = rng.integers(-10, 5100, (1, 256)).astype(np.int32)
        want = np.empty_like(lo)
        for r in range(lo.shape[0]):
            for c in range(lo.shape[1]):
                want[r, c] = np.searchsorted(
                    flat[lo[r, c]:hi[r, c]], x[0, c]) + lo[r, c]
        a = np.asarray(lower_bound(jnp.asarray(flat), jnp.asarray(lo),
                                   jnp.asarray(hi), jnp.asarray(x), iters))
        np.testing.assert_array_equal(a, want, err_msg="binary")
        for fan in (4, 16, 32):
            b = np.asarray(lower_bound_wide(
                jnp.asarray(flat), jnp.asarray(lo), jnp.asarray(hi),
                jnp.asarray(x), iters, fan=fan))
            np.testing.assert_array_equal(b, want, err_msg=f"fan={fan}")


def test_wide_edges():
    flat = jnp.asarray(np.asarray([5, 5, 5, 9, 12, 12, 40], np.int32))
    iters = 4
    cases = [
        (0, 7, 5, 0), (0, 7, 6, 3), (0, 7, 12, 4), (0, 7, 13, 6),
        (0, 7, 41, 7),   # beyond all -> hi
        (3, 3, 9, 3),    # empty range -> lo
        (2, 5, 12, 4),
    ]
    for lo, hi, x, want in cases:
        got = np.asarray(lower_bound_wide(
            flat, jnp.asarray([lo], jnp.int32),
            jnp.asarray([hi], jnp.int32),
            jnp.asarray([x], jnp.int32), iters))[0]
        assert got == want, (lo, hi, x, got, want)
