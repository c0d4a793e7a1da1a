"""typesense_tpu — a TPU-native search engine with the capabilities of Typesense.

A brand-new engine (not a port): the query core runs as XLA/Pallas programs over
flat, HBM-resident index arrays — batched Levenshtein fuzzy matching over a
flattened term table, vectorized posting intersection via sorted-membership
probes, proximity ranking with Typesense-parity bit-packed match scores,
bitmap filter/facet evaluation, fused vector distance + top-k — while a host
layer provides the REST API, JSON document store, durability and the index
build pipeline.

Reference behavior contract: typesense/typesense @ /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

from typesense_tpu.collection import Collection
from typesense_tpu.manager import CollectionManager

__all__ = ["Collection", "CollectionManager", "__version__"]
