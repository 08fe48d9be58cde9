"""Video probing and block decoding (host side).

Implements the framing logic of /root/reference/facerec/extract.py:
204-300 — frame count/fps probing, display-aspect-ratio correction from
the container SAR (or an ``aspect_ratios.csv`` override,
extract.py:398-413), shard ranges, seek, BGR→RGB conversion — but
decodes into contiguous (B, H, W, 3) uint8 *blocks* sized for the
device program instead of single frames.

Decode backend is OpenCV; a native C++ decoder with double buffering
lives in ``native/`` and is used when built (see
:mod:`facerec_tpu.runtime.native`).
"""
from __future__ import annotations

import csv
import dataclasses
import os
import sys
from typing import Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class VideoInfo:
    n_frames: int
    fps: float
    storage_width: int
    storage_height: int
    display_width: int
    display_height: int


def probe_video(path: str,
                display_size: Optional[Tuple[int, int]] = None) -> VideoInfo:
    """Probe container properties and derive the display resolution.

    DAR = SAR × PAR from the container (extract.py:213-225); an explicit
    ``display_size`` (from aspect_ratios.csv) wins.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if n_frames <= 0:
            raise ValueError(f"Invalid video file <{path}>")
        fps = cap.get(cv2.CAP_PROP_FPS)
        sw = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        sh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        if display_size is not None:
            dw, dh = display_size
        else:
            sar = sw / sh
            par = ((cap.get(cv2.CAP_PROP_SAR_NUM) or 1.0)
                   / (cap.get(cv2.CAP_PROP_SAR_DEN) or 1.0))
            dar = sar * par
            dh = sh
            dw = round(sh * dar)
        return VideoInfo(n_frames, fps, sw, sh, dw, dh)
    finally:
        cap.release()


def load_aspect_ratio_csv(csv_path: str,
                          file_basename: str) -> Optional[Tuple[int, int]]:
    """Look up a precomputed display size (extract.py:398-413)."""
    if not os.path.exists(csv_path):
        return None
    with open(csv_path, "r") as f:
        reader = csv.reader(f, delimiter=",", quotechar='"')
        headers = next(reader)
        name_i = headers.index("filename")
        w_i = headers.index("display_width")
        h_i = headers.index("display_height")
        for row in reader:
            if row[name_i] == file_basename:
                return int(row[w_i]), int(row[h_i])
    return None


class VideoReader:
    """Decode a frame range into fixed-size RGB (or I420) blocks."""

    def __init__(self, path: str, info: VideoInfo,
                 pixel_format: str = "rgb"):
        import cv2

        if pixel_format not in ("rgb", "i420"):
            raise ValueError(f"unknown pixel_format {pixel_format!r}")
        if pixel_format == "i420" and (info.display_width % 2
                                       or info.display_height % 2):
            raise ValueError("i420 needs even display dims")
        self.cv2 = cv2
        self.info = info
        self.pixel_format = pixel_format
        self.cap = cv2.VideoCapture(path)

    def seek(self, frame: int) -> None:
        ok = self.cap.set(self.cv2.CAP_PROP_POS_FRAMES, frame)
        if not ok:
            raise RuntimeError(f"Couldn't seek to frame {frame}")

    def read_block(self, n: int) -> np.ndarray:
        """Read up to ``n`` frames; returns (m, H, W, 3) uint8 RGB —
        or (m, H*3/2, W) planar I420 — at display resolution, m ≤ n
        (short at end of stream)."""
        info = self.info
        i420 = self.pixel_format == "i420"
        frames = []
        for _ in range(n):
            ok, frame = self.cap.read()
            if not ok:
                break
            if (info.display_width != info.storage_width
                    or info.display_height != info.storage_height):
                frame = self.cv2.resize(
                    frame, (info.display_width, info.display_height))
            if i420:
                frames.append(self.cv2.cvtColor(
                    frame, self.cv2.COLOR_BGR2YUV_I420))
            else:
                frames.append(frame[..., ::-1])  # BGR → RGB
        if not frames:
            shape = ((0, info.display_height * 3 // 2,
                      info.display_width) if i420 else
                     (0, info.display_height, info.display_width, 3))
            return np.zeros(shape, np.uint8)
        return np.ascontiguousarray(np.stack(frames))

    def blocks(self, beg: int, end: int, block: int) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield (first_frame, frames) blocks covering [beg, end)."""
        self.seek(beg)
        f = beg
        while f < end:
            chunk = self.read_block(min(block, end - f))
            if len(chunk) == 0:
                break
            yield f, chunk
            f += len(chunk)

    def close(self) -> None:
        self.cap.release()


class _NativeBlockAdapter:
    """Adapts NativeVideoReader to the (beg, end, block) iterator API."""

    def __init__(self, native_reader):
        self.native = native_reader

    def blocks(self, beg: int, end: int, block: int):
        return self.native.blocks(beg, end)

    def close(self) -> None:
        self.native.close()


# (path, n_workers, pixel_format, block_frames) → bool probe verdict;
# one probe per film/config, not one per open (the mesh path opens n
# readers on the same file)
_seek_probe_cache: dict = {}


def _parallel_seek_probe(path: str, info: VideoInfo, block_frames: int,
                         n_workers: int, pixel_format: str) -> bool:
    """True iff ``n_workers``-parallel decode of the first blocks is
    bit-identical to sequential decode of the same range.

    Parallel decode workers seek per claimed block
    (``CAP_PROP_POS_FRAMES``, native/decode.cpp), which is
    frame-accurate for closed-GOP film files but not guaranteed for
    every codec/container; the reference never risks per-block seeks
    (it seeks once per shard, /root/reference/facerec/extract.py:
    230-234).  This probe makes the multi-worker opt-in safe: decoding
    two blocks twice costs a few hundred frames once per film, and a
    mismatch drops the reader to 1 worker instead of silently
    producing wrong frames."""
    from facerec_tpu.runtime import native as native_mod

    key = (path, n_workers, pixel_format, block_frames)
    if key in _seek_probe_cache:
        return _seek_probe_cache[key]
    end = min(info.n_frames, 2 * block_frames)
    outs = []
    for w in (1, n_workers):
        r = native_mod.NativeVideoReader(
            path, info.display_width, info.display_height, block_frames,
            ring_blocks=n_workers + 1, n_workers=w,
            pixel_format=pixel_format)
        try:
            outs.append(list(r.blocks(0, end)))
        finally:
            r.close()
    seq, par = outs
    ok = (len(seq) == len(par)
          and all(fa == fb and a.shape == b.shape and np.array_equal(a, b)
                  for (fa, a), (fb, b) in zip(seq, par)))
    _seek_probe_cache[key] = ok
    return ok


def open_block_reader(path: str, info: VideoInfo, block_frames: int,
                      prefer_native: bool = True,
                      decode_workers: int = 0,
                      ring_blocks: int = 2,
                      pixel_format: str = "rgb"):
    """Best available block reader: the native C++ block decoder when
    built (optionally with parallel decode workers), the OpenCV Python
    reader otherwise.

    ``ring_blocks`` bounds how far the native decode workers run ahead
    of the consumer; group-fetch drivers raise it to the fetch group
    size so decode continues through the multi-second device→host
    transfer of a group (see :func:`fetch_ring_blocks`).

    ``pixel_format="i420"`` emits (m, H*3/2, W) planar 4:2:0 blocks —
    the color conversion then runs in the native reader's worker
    threads instead of the caller's loop (the wire-format encode path,
    facerec_tpu.ops.yuv)."""
    if prefer_native:
        try:
            from facerec_tpu.runtime.native import NativeVideoReader

            native = NativeVideoReader(
                path, info.display_width, info.display_height,
                block_frames, ring_blocks=ring_blocks,
                n_workers=decode_workers, pixel_format=pixel_format)
            if (native.n_workers > 1
                    and os.environ.get("FACEREC_SEEK_CHECK", "1") != "0"
                    and not _parallel_seek_probe(
                        path, info, block_frames, native.n_workers,
                        pixel_format)):
                print(f"WARNING: parallel decode seek probe failed for "
                      f"{os.path.basename(path)} (per-block seeks are "
                      f"not frame-accurate here); falling back to 1 "
                      f"decode worker", file=sys.stderr, flush=True)
                native.close()
                native = NativeVideoReader(
                    path, info.display_width, info.display_height,
                    block_frames, ring_blocks=ring_blocks,
                    n_workers=1, pixel_format=pixel_format)
            return _NativeBlockAdapter(native)
        except (RuntimeError, ValueError, OSError):
            pass
    return VideoReader(path, info, pixel_format=pixel_format)


def fetch_ring_blocks(group: int, block_frames: int, height: int,
                      width: int, budget_bytes: int = 2 << 30) -> int:
    """Decode-ring depth for a fetch group: group + 2 blocks ahead so
    the C++ workers keep decoding through a group's fetch RTT, capped
    by a host-memory budget (a 4K film's blocks are ~3 GB each)."""
    block_bytes = max(1, block_frames * height * width * 3)
    return max(2, min(group + 2, budget_bytes // block_bytes))
