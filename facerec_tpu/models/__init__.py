"""Flax models: face detection and face embedding.

Replaces the reference's external TF stacks — the ``mtcnn`` package's
cascaded P/R/O-nets (/root/reference/facerec/detector.py:19-35) with a
single-stage anchor detector, and ``keras_facenet``'s Inception-ResNet
FaceNet (/root/reference/facerec/extract.py:21-25) with a native Flax
implementation — so detection and embedding run as one batched XLA
program per frame block in bfloat16 on the MXU.
"""
from facerec_tpu.models.facenet import (FaceNet, FaceNetEmbedder,
                                         PooledStackedEmbedders,
                                         StackedEmbedders)
from facerec_tpu.models.detector import FaceDetector, DetectorHarness
