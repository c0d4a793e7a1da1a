"""ML model subsystem: local JAX embedders + remote embedder clients.

Reference equivalent: /root/reference/include/embedder_manager.h,
text_embedder.h (ONNX Runtime sessions), text_embedder_remote.h. Here the
local path is a pure-JAX transformer encoder compiled onto the TPU's MXU
instead of an ONNX session.
"""

from typesense_tpu.models.embedder import EmbedderManager, TextEncoder

__all__ = ["EmbedderManager", "TextEncoder"]
