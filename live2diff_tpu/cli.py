"""Offline vid2vid CLI — the reference ``test.py`` equivalent.

Usage:
    python -m live2diff_tpu.cli <video> <config.yaml> [--prompt ...]
        [--height 512] [--width 512] [--max-frames N] [--output out.mp4]
        [--num-inference-steps N] [--t-index-list 30 40] [--strength S]
        [--tiny] (random tiny model for environments without weights)

Decodes the input video (mp4/gif/frame folder), runs the 8-frame warmup,
streams the remaining frames, and writes the output video plus a timing
report (EMA + mean±std), matching the reference CLI behaviour
(/root/reference/test.py:21-207).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="live2diff-tpu", description=__doc__)
    p.add_argument("video", help="input video file, GIF, or frame directory")
    p.add_argument("config", help="style config YAML")
    p.add_argument("--prompt", default="", help="subject prompt, inserted into the "
                   "config's prompt template")
    p.add_argument("--output", default=None)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--max-frames", type=int, default=-1)
    p.add_argument("--num-inference-steps", type=int, default=None)
    p.add_argument("--t-index-list", type=int, nargs="*", default=None)
    p.add_argument("--strength", type=float, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--no-tiny-vae", action="store_true")
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default=None,
                   help="KV-cache storage (int8: half HBM + bandwidth)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight model on CPU (smoke/demo mode)")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .utils.image import frames_to_uint8
    from .utils.io import read_video_frames, write_video
    from .wrapper import WARMUP_FRAMES, StreamV2VWrapper

    max_frames = None if args.max_frames in (-1, None) else args.max_frames
    frames = read_video_frames(args.video, max_frames)
    if len(frames) <= WARMUP_FRAMES:
        print(f"need more than {WARMUP_FRAMES} frames, got {len(frames)}", file=sys.stderr)
        return 2

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

    stream = StreamV2VWrapper(
        args.config,
        num_inference_steps=args.num_inference_steps,
        t_index_list=args.t_index_list,
        strength=args.strength,
        height=args.height,
        width=args.width,
        use_tiny_vae=not args.no_tiny_vae,
        use_depth=not args.no_depth and not args.tiny,
        output_type="pt",
        seed=args.seed,
        **kwargs,
    )

    print(f"warmup on {WARMUP_FRAMES} frames...", file=sys.stderr)
    warmup_out = stream.prepare(args.prompt, frames[:WARMUP_FRAMES])

    outputs = []
    lag = stream.batch_size - 1  # stream-batch output lag (test.py:169-174)
    for i, frame in enumerate(frames[WARMUP_FRAMES:]):
        out = stream(frame)
        if i >= lag:  # first `lag` outputs replay stale buffer content
            outputs.append(out * 2.0 - 1.0)
        print(f"\rframe {i + 1}/{len(frames) - WARMUP_FRAMES} "
              f"ema={stream.inference_time_ema*1000:.1f}ms", end="", file=sys.stderr)
    print(file=sys.stderr)

    out_path = args.output or (os.path.splitext(args.video)[0] + "_out.gif")
    if outputs:
        write_video(out_path, frames_to_uint8(outputs), fps=args.fps)

    t = stream.timing_summary()
    print(
        f"frames={len(outputs)} fps={t['fps']:.2f} "
        f"mean={t['mean_s']*1000:.1f}±{t['std_s']*1000:.1f}ms "
        f"ema={t['ema_s']*1000:.1f}ms -> {out_path}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
