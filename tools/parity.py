"""One-command output-parity harness: weights dir + reference frames -> PSNR.

Builds the full pipeline from a style config against a weights directory,
streams the input video through it exactly like the CLI (8-frame warmup,
stream-batch lag handling, reference test.py:159-207 semantics), and emits
one JSON line scoring the output against reference frames:

    python tools/parity.py <input-video> <config.yaml> \
        --reference <reference-output-video-or-frame-dir> \
        [--weights-dir /path/to/models-root] [--require-weights] \
        [--prompt ...] [--height 512 --width 512] [--output ours.mp4]

BASELINE target: PSNR >= 30 dB vs the reference implementation's output at
config 1. ``--require-weights`` exits non-zero when any weight artifact is
missing (otherwise missing artifacts run randomly initialised and are
reported in the JSON — useful for plumbing checks without weights, where a
self-comparison must give PSNR = inf).
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


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="parity", description=__doc__)
    p.add_argument("video", help="input video file, GIF, or frame directory")
    p.add_argument("config", help="style config YAML")
    p.add_argument("--reference", default=None,
                   help="reference output video/frame dir to score against; "
                   "omit to only run the pipeline and report missing weights")
    p.add_argument("--weights-dir", default=None,
                   help="directory the config's relative model paths resolve "
                   "against (the reference repo layout: models/, models/loras/...)")
    p.add_argument("--require-weights", action="store_true",
                   help="fail (exit 3) if any weight artifact is missing")
    p.add_argument("--prompt", default="")
    p.add_argument("--output", default=None, help="also write our output video")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--no-tiny-vae", action="store_true")
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight model on CPU (plumbing check)")
    return p


def run(args) -> dict:
    """Build, stream, score. Returns the result dict (also printed as JSON)."""
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from live2diff_tpu.utils.image import frames_to_uint8
    from live2diff_tpu.utils.io import read_video_frames, write_video
    from live2diff_tpu.wrapper import WARMUP_FRAMES, StreamV2VWrapper

    config = os.path.abspath(args.config)
    video = os.path.abspath(args.video)
    reference = os.path.abspath(args.reference) if args.reference else None
    output = os.path.abspath(args.output) if args.output else None

    frames = read_video_frames(video, args.max_frames)
    if len(frames) <= WARMUP_FRAMES:
        raise SystemExit(f"need more than {WARMUP_FRAMES} frames, got {len(frames)}")

    kwargs = {}
    if args.tiny:
        args.height = args.width = 64
        kwargs["unet_overrides"] = dict(
            block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
            norm_num_groups=4, motion_num_attention_heads=2,
        )
        kwargs["dtype"] = "float32"
    if args.kv_cache:
        kwargs["kv_cache_dtype"] = args.kv_cache

    cwd = os.getcwd()
    if args.weights_dir:
        os.chdir(args.weights_dir)  # config paths are relative to the models root
    try:
        stream = StreamV2VWrapper(
            config, height=args.height, width=args.width,
            use_tiny_vae=not args.no_tiny_vae,
            use_depth=not args.no_depth and not args.tiny,
            output_type="pt", seed=args.seed, **kwargs,
        )
    finally:
        os.chdir(cwd)

    missing = list(getattr(stream.built, "missing_artifacts", []))
    if args.require_weights and missing:
        print(json.dumps({"error": "missing weight artifacts", "missing": missing}))
        raise SystemExit(3)

    stream.prepare(args.prompt, frames[:WARMUP_FRAMES])
    outputs = []
    lag = stream.batch_size - 1  # stream-batch output lag (ref test.py:169-174)
    for i, frame in enumerate(frames[WARMUP_FRAMES:]):
        out = stream(frame)
        if i >= lag:
            outputs.append(out * 2.0 - 1.0)
    ours = frames_to_uint8(outputs)

    if output:
        write_video(output, ours, fps=16)

    result = {
        "metric": "psnr_vs_reference",
        "unit": "dB",
        "frames": len(ours),
        "missing_artifacts": len(missing),
    }
    if missing:
        result["missing_sample"] = missing[:4]
    if reference:
        ref = read_video_frames(reference, args.max_frames)
        n = min(len(ours), len(ref))
        if n == 0:
            raise SystemExit("no overlapping frames to score")
        scores = [psnr(ours[i], np.asarray(ref[i])) for i in range(n)]
        result["value"] = round(float(np.mean(scores)), 2)
        result["per_frame_min"] = round(float(np.min(scores)), 2)
        result["scored_frames"] = n
    else:
        result["value"] = None
    print(json.dumps(result))
    return result


def main(argv=None) -> int:
    run(build_argparser().parse_args(argv))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
