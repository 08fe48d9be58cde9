"""Pipeline configuration.

One frozen dataclass per stage, defaults chosen to match the reference
CLI defaults (cf. /root/reference/facerec/extract.py:374-387,
merge_shards.py:279-290, cluster.py:229-238, classify_knn.py:285-287)
so that a reference user can switch over without changing behaviour.

TPU-specific knobs (block sizes, fixed capacities, dtypes) live here too:
everything under ``jit`` is traced once, so all shapes are static and are
derived from this config.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# The four FaceNet checkpoints the reference loads
# (/root/reference/facerec/extract.py:24-25).  The first two embed to 512
# dims, the last two to 128 dims; downstream stages use only EMB_NAME.
FACENET_MODELS: Tuple[str, ...] = (
    "20180402-114759",
    "20180408-102900",
    "20170511-185253",
    "20170512-110547",
)
FACENET_DIMS = {
    "20180402-114759": 512,
    "20180408-102900": 512,
    "20170511-185253": 128,
    "20170512-110547": 128,
}
# Embedding used by cluster/classify stages (cluster.py:17, classify_knn.py:13)
EMB_NAME = "20170512-110547"

FACE_IMAGE_SIZE = 160          # face crops resolution (extract.py:27)
SAVE_FACE_PADDING = 0.10       # padding for saved crops (extract.py:28)
CROP_MARGIN = int(0.1 * 160)   # cropBox margin in px (extract.py:163)

ACTOR_ID_PREFIX = "momaf:elonet_henkilo_"  # classify_knn.py:15


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    """Config of the extract stage (decode→scene→detect→track→embed)."""

    # Reference-visible knobs (extract.py:376-387)
    n_shards: int = 1                 # single chip replaces 100-256 CPU shards
    shard_i: int = 0
    save_every: int = 5
    iou_threshold: float = 0.5
    min_trajectory: int = 3
    max_trajectory_age: int = 5
    min_face_size: int = 20
    face_threshold: float = 0.95
    save_images: bool = True
    display_width: Optional[int] = None
    display_height: Optional[int] = None

    # TPU knobs: static shapes for the jitted frame-block program
    # Frames per device block.  Bigger blocks amortize per-dispatch
    # latency and schedule better: measured 2228 fps (64) → 3522 fps
    # (128) → 3811 fps (256, but ~8x the compile time) on one v5e chip.
    block_frames: int = 128
    max_detections: int = 16          # per-frame detection capacity
    max_tracks: int = 32              # live track table capacity
    # Detector input (H, W); None = fit to the film's aspect ratio
    # (stride-32 multiples) so no FLOPs run on padding.
    detector_size: Optional[Tuple[int, int]] = None
    # Long side of the AR-fitted detector input.  None (default) =
    # native display resolution — parity-first, like the reference
    # which detects at display scale
    # (/root/reference/facerec/detector.py:20, min_face_size=20).
    # Setting 512 downscales a 576x768 film 1.5x: measured recall on
    # 28-44 px faces 0.93 vs 1.0 at native, at ~2.25x less detector
    # compute (tools/detector_eval.py --sweep-long-side) — the SPEED
    # opt-in, not the default (see README "Defaults that trade parity
    # for speed").
    detector_long_side: Optional[int] = None
    # Detector backbone width for RANDOM-INIT harnesses (checkpoints
    # carry their own width; models/load.py infers it back from the
    # stem shape).  96 is the trained/documented default; 72 is the
    # measured speed knob (detector 12.6 → 9.2 ms per 128-frame block
    # on v5e, selfcheck quality gates green — docs/DESIGN.md round 4);
    # 128 runs at the SAME device time as 96 (the MXU pads 96-channel
    # convs to its 128 lanes) with 1.78x the capacity.
    backbone_width: int = 96
    compute_dtype: str = "bfloat16"

    # Parallel native decode workers (each seeks per claimed block —
    # needs frame-accurate seeks; see runtime/native.py). 0 = use
    # FACEREC_DECODE_WORKERS or sequential.
    decode_workers: int = 0

    # Device→host fetches are batched: the packed per-block payloads
    # and the deferred per-block embedding buffers of N consecutive
    # blocks concatenate on device and come back as ONE transfer.  On
    # latency-bound links (the reference harness tunnel pays a full
    # RPC round trip per fetched buffer) this divides the transfer
    # count — and with it the end-to-end floor — by N.  Flush
    # *semantics* stay per-block (identical ready sets, record order,
    # and bytes at any setting); only the fetch schedule changes.
    fetch_every_blocks: int = 4

    # Host→device pixel wire format.  "rgb" (default): the decoded
    # frames upload as-is — byte-exact parity with host-only decode.
    # "rgb-delta": frames upload as uint8-wraparound temporal deltas,
    # undone EXACTLY on device (modular cumsum, ops/yuv.py) — every
    # output byte identical to "rgb", while the mostly-zero deltas
    # ride the link's wire compressor (measured 3x e2e on the
    # reference harness tunnel; free to enable on any transfer-bound
    # host).  "yuv420-delta": additionally ships 4:2:0 YUV planes (the
    # codec's own 1.5 B/px storage) — half the raw wire bytes — at the
    # cost of a few LSB of chroma re-quantization in device-side
    # crops/features (host-side JPEG images stay exact).  See README
    # defaults table.
    wire_format: str = "rgb"

    # Fault tolerance (SURVEY.md §5.3-5.4): block-granular in-stage
    # checkpoints + idempotent shard completion markers
    checkpoint_every_blocks: int = 0  # 0 = no in-stage checkpoints
    resume: bool = True               # skip done shards, resume checkpoints


@dataclasses.dataclass(frozen=True)
class MergeConfig:
    """Config of the shard/block merge stage (merge_shards.py:279-290)."""

    iou_threshold: float = 0.5
    overlap: int = 5                  # must match max_trajectory_age
    min_face_size: int = 50
    # Reproduce merge_shards.py:237-240 exactly: cross-shard merges
    # require strict t2.start < t1.start and are skipped entirely when
    # t1 starts at a scene cut — which keeps duplicate tracks that
    # spawned inside the overlap halo in both shards.  Default (False)
    # also dedups equal-start pairs, keeping sharded == unsharded.
    strict_start: bool = False


@dataclasses.dataclass(frozen=True)
class ClusterConfig:
    """Config of the trajectory clustering stage (cluster.py:229-238)."""

    size: int = 18
    min_size: int = 12
    max_size: int = 24
    emb_name: str = EMB_NAME


@dataclasses.dataclass(frozen=True)
class ClassifyConfig:
    """Config of the KNN actor classification stage (classify_knn.py:285-293)."""

    k: int = 10
    min_samples: int = 20
    save_p_higher: float = 0.05
    emb_name: str = EMB_NAME


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    extract: ExtractConfig = dataclasses.field(default_factory=ExtractConfig)
    merge: MergeConfig = dataclasses.field(default_factory=MergeConfig)
    cluster: ClusterConfig = dataclasses.field(default_factory=ClusterConfig)
    classify: ClassifyConfig = dataclasses.field(default_factory=ClassifyConfig)
