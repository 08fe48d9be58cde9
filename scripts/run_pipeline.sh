#!/bin/bash
# End-to-end pipeline launcher for one film on one TPU host.
#
# Replaces the reference's SLURM array template
# (/root/reference/scripts/extract.sh): the 100-way CPU/GPU shard fan-out
# collapses into a single-chip run; set N_SHARDS>1 only when splitting a
# film across multiple TPU hosts (each host runs its shard range, the
# shared filesystem collects shard files, then one host merges).
#
# Usage: scripts/run_pipeline.sh <film.mp4> <out_dir> [actors_dir]
set -euo pipefail

FILM=${1:?usage: run_pipeline.sh film.mp4 out_dir [actors_dir]}
OUT=${2:?usage: run_pipeline.sh film.mp4 out_dir [actors_dir]}
ACTORS=${3:-}

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

# build native helpers if missing
if [ ! -f "$REPO/native/libfacerec_decode.so" ]; then
  make -C "$REPO/native"
fi

ARGS=(--filmfile "$FILM" --out-path "$OUT")
if [ -n "$ACTORS" ]; then
  ARGS+=(--actors-dir "$ACTORS")
fi
exec python -u -m facerec_tpu.pipeline.orchestrate "${ARGS[@]}"
