"""Multi-device / multi-host sharding layer.

New scope beyond the reference (SURVEY.md §2.4: "Parallelism: none beyond
single device") — designed TPU-first per BASELINE.json: heads and KV
tensor-sharded over ICI via shard_map, ring-attention KV rotation for
sequences exceeding one host, collectives overlapped with compute.
"""

from umfa_tpu.parallel.mesh import make_mesh
from umfa_tpu.parallel.sharded import sharded_attention
from umfa_tpu.parallel.ring import ring_flash_attention
from umfa_tpu.parallel.ring_pallas import ring_flash_attention_pallas
from umfa_tpu.parallel.pipeline import pipeline_apply

__all__ = [
    "make_mesh",
    "sharded_attention",
    "ring_flash_attention",
    "ring_flash_attention_pallas",
    "pipeline_apply",
]
