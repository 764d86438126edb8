"""Output-parity harness: PSNR between two videos / frame folders.

Used to score this framework's output against reference frames (BASELINE
target: PSNR >= 30 vs reference output at config 1). Run:

    python tools/psnr.py out_ours.mp4 out_reference.mp4 [--max-frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak**2 / mse))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args()

    from live2diff_tpu.utils.io import read_video_frames

    a = read_video_frames(args.ours, args.max_frames)
    b = read_video_frames(args.reference, args.max_frames)
    n = min(len(a), len(b))
    scores = [psnr(a[i], b[i]) for i in range(n)]
    print(json.dumps({
        "metric": "psnr_vs_reference",
        "value": round(float(np.mean(scores)), 2),
        "unit": "dB",
        "per_frame_min": round(float(np.min(scores)), 2),
        "frames": n,
    }))


if __name__ == "__main__":
    # direct-invocation convenience only: importing this module must not
    # let repo-root modules shadow site-packages (ADVICE r4)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
