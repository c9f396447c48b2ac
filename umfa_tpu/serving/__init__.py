"""Serving/inference subsystem: KV caches (dense + quantized) and
incremental decode attention.

New scope vs the reference (its serving story is "import the extension and
SDPA is overridden"); designed for the BASELINE.json north star's
large-scale serving path. INT8 KV caching follows the KV-cache-compression
line of work in PAPERS.md.
"""

from umfa_tpu.serving.kv_cache import (
    KVCache,
    LatentKVCache,
    QuantizedKVCache,
    append_latent,
    init_cache,
    init_latent_cache,
    init_quantized_cache,
)
from umfa_tpu.serving.decode import decode_attention

__all__ = [
    "KVCache",
    "LatentKVCache",
    "QuantizedKVCache",
    "append_latent",
    "init_cache",
    "init_latent_cache",
    "init_quantized_cache",
    "decode_attention",
]
