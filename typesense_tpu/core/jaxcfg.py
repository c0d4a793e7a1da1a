"""Central JAX configuration. Imported before any jax use.

x64 is enabled because ranking parity with the reference requires the exact
64-bit packed match score (match_score.h:56-68) and int64 sort columns; all
hot arrays (postings, positions, vectors) remain explicitly int32/bf16/f32 —
int64 appears only on candidate-sized score/sort vectors.
"""

import jax

jax.config.update("jax_enable_x64", True)
