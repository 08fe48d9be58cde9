"""Host-side video ingest: probing, DAR correction, block decoding."""
from facerec_tpu.video.reader import VideoInfo, VideoReader, probe_video, load_aspect_ratio_csv
