"""Decode-only throughput: naive sequential spans vs the mesh host feed.

``extract --mesh n`` feeds n spans from n block readers advanced in
lockstep (parallel/extract_mesh.py).  Each native reader owns decode
worker threads filling a bounded ring ahead of the consumer
(native/decode.cpp), so the n span streams decode CONCURRENTLY in C++
while Python consumes them one at a time — the host feed is a worker
pool, not n sequential decode costs (VERDICT r2 next-step #8).

This script quantifies that on the current host:

  naive     — decode every span one after another, ring disabled
              (workers=1, consume immediately: the lower bound a
              per-span Python loop without overlap would pay)
  mesh-feed — n lockstep iterators exactly like run_extract_mesh's
              block loop

Run: python scripts/decode_sweep.py [--film F] [--spans 4] [--frames N]
Prints one JSON line with both rates and the speedup.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--film", default=None,
                        help="film path (default: synthesize one)")
    parser.add_argument("--frames", type=int, default=2048)
    parser.add_argument("--spans", type=int, default=4)
    parser.add_argument("--block", type=int, default=128)
    args = parser.parse_args()

    from facerec_tpu.video.reader import open_block_reader, probe_video

    film = args.film
    if film is None:
        from facerec_tpu.video.synth import make_clip

        film = f"/tmp/facerec_bench/decode_{args.frames}.mp4"
        os.makedirs(os.path.dirname(film), exist_ok=True)
        if not os.path.exists(film):
            log(f"synthesizing {args.frames}-frame 576x768 film...")
            make_clip(film + ".tmp.mp4", n_frames=args.frames, width=768,
                      height=576, cuts=(), seed=1)
            os.replace(film + ".tmp.mp4", film)

    info = probe_video(film, None)
    n = args.spans
    span_len = (info.n_frames + n - 1) // n
    spans = [(min(span_len * i, info.n_frames),
              min(span_len * (i + 1), info.n_frames)) for i in range(n)]

    # naive: spans decoded strictly one after another
    t0 = time.perf_counter()
    seen = 0
    for beg, end in spans:
        r = open_block_reader(film, info, args.block, decode_workers=1)
        for _f0, frames in r.blocks(beg, end, args.block):
            seen += len(frames)
        r.close()
    naive_dt = time.perf_counter() - t0
    naive_fps = seen / naive_dt
    log(f"naive sequential spans: {naive_fps:.0f} fps ({seen} frames)")

    # mesh feed: n lockstep iterators (run_extract_mesh's block loop)
    readers = [open_block_reader(film, info, args.block, decode_workers=1)
               for _ in range(n)]
    iters = [r.blocks(beg, end, args.block)
             for r, (beg, end) in zip(readers, spans)]
    t0 = time.perf_counter()
    seen = 0
    exhausted = [False] * n
    while not all(exhausted):
        for i in range(n):
            if exhausted[i]:
                continue
            nxt = next(iters[i], None)
            if nxt is None:
                exhausted[i] = True
                continue
            seen += len(nxt[1])
    mesh_dt = time.perf_counter() - t0
    mesh_fps = seen / mesh_dt
    for r in readers:
        r.close()
    log(f"mesh host feed ({n} spans): {mesh_fps:.0f} fps "
        f"({seen} frames)")

    print(json.dumps({
        "metric": "mesh_host_feed_decode_fps",
        "spans": n,
        "naive_fps": round(naive_fps, 1),
        "mesh_fps": round(mesh_fps, 1),
        "speedup": round(mesh_fps / naive_fps, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
