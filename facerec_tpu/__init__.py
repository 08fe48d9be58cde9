"""facerec_tpu — TPU-native actor-recognition pipeline for feature films.

A ground-up JAX/XLA/Pallas rebuild of the MoMaF/facerec pipeline
(reference: /root/reference). The pipeline takes a film, finds faces,
tracks them into trajectories, segments shots, embeds faces, clusters
trajectories by identity and emits per-cluster actor predictions, writing
the same JSON/JSONL data contract the reference's downstream
video-labeler consumes.

Layer map (TPU-first):
  - ``facerec_tpu.ops``      — batched device ops (scene stats, Kalman,
    assignment, IoU, crops, NMS, linkage, KNN), Pallas kernels for hot ops.
  - ``facerec_tpu.models``   — Flax models (single-stage face detector,
    FaceNet embedder) running bf16 on the MXU.
  - ``facerec_tpu.track``    — fixed-capacity SORT tracker lowered to
    ``lax.scan`` over frame blocks.
  - ``facerec_tpu.pipeline`` — stage programs (extract/merge/cluster/
    classify/orchestrate) operating on HBM-resident frame blocks.
  - ``facerec_tpu.parallel`` — ``shard_map`` frame-axis sharding with
    halo exchange over a ``jax.sharding.Mesh``.
  - ``facerec_tpu.contract`` — byte-compatible readers/writers for the
    reference's file contract.
  - ``facerec_tpu.video``    — host-side decode (OpenCV / native C++).
"""

__version__ = "0.1.0"
