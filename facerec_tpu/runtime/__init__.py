"""Host runtime: platform selection, logging, prefetch, native bindings."""
from facerec_tpu.runtime.platform import ensure_platform
