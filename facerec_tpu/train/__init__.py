"""Training: anchor target assignment, losses, data-parallel train steps.

The reference consumes frozen external checkpoints and has no training
path at all; a standalone framework needs one to produce detector /
embedder weights.  Training here is data-parallel ``jit`` over a mesh —
batch sharded on the mesh axis, parameters replicated, gradient
all-reduce inserted by XLA.
"""
from facerec_tpu.train.detector_train import (DetectorTrainer, anchor_targets,
                                              detector_loss)
