"""Multi-object tracking.

``tracker`` runs SORT semantics as a ``lax.scan`` over frame blocks on
device; ``assemble`` turns the scan's per-frame emissions back into
reference-ordered trajectories and valid-face streams on the host.
"""
from facerec_tpu.track.tracker import TrackerConfig, TrackerState, init_tracker, run_block
from facerec_tpu.track.assemble import TrajectoryAssembler
