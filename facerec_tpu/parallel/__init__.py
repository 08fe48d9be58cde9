"""Multi-chip scaling via jax.sharding.

The reference scales by SLURM array jobs over a shared filesystem
(SURVEY.md §2.4); here the same temporal decomposition maps onto a
device mesh: the frame axis is sharded with ``shard_map``, the scene
detector's 2-frame dependency becomes an ICI ``ppermute`` halo
exchange, and per-device tracker blocks are stitched by the merge
stage exactly like file shards.
"""
from facerec_tpu.parallel.mesh import frame_mesh
from facerec_tpu.parallel.extract_sharded import sharded_extract_step
