"""Regenerate the committed CI probe checkpoint fixture.

1. Train the probe on-chip at the pinned budget (the recorded command —
   1062 s wall on one v5e, mostly tunnel compile; docs/DESIGN.md
   "Pinned CI quality budget"):

     python -m facerec_tpu.tools.selfcheck --out /tmp/sc_probe \
         --film-width 384 --film-height 288 --detector-size 384 \
         --identities 3 --film-frames 180

2. Convert the orbax checkpoint to the committed f16 single-file
   fixture:

     python scripts/make_probe_fixture.py /tmp/sc_probe/detector.npz

Writes tests/data/probe_detector_w96.npz.  The gates in
tests/test_probe_quality.py are calibrated against the CPU deploy of
THIS file — recalibrate them (run the test, read the printed scores)
whenever the fixture is regenerated.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from facerec_tpu.models.weights import load_params, save_params_npz


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    src = os.path.abspath(sys.argv[1])
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data",
        "probe_detector_w96.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    variables = load_params(src)
    save_params_npz(dst, variables, cast=np.float16)
    print(f"wrote {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
