"""Measure warm-start cost with and without AOT executable serialization.

Phase "prime": build the bench-default pipeline, compile both programs (via
the persistent cache when warm), serialize them into engines/aot.
Phase "load": fresh process path — build, deserialize executables, run
prepare + first frame, and report the split that matters for VERDICT item 4:
build_s / aot_load_s / prepare_s / first_step_s.

Usage:
  python tools/aot_probe.py prime [--height 512 --width 512]
  python tools/aot_probe.py load  [--height 512 --width 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def stage(msg):
    print(f"# [{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("phase", choices=["prime", "load"])
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--kv-cache", default="int8")
    p.add_argument("--spatial-qk", default="int8")
    p.add_argument("--steps", type=int, nargs="*", default=[30, 40])
    p.add_argument("--no-xla-cache", action="store_true",
                   help="load phase: disable the persistent XLA cache to "
                        "isolate what AOT alone provides")
    args = p.parse_args()

    os.environ["LIVE2DIFF_FLASH"] = "int8" if args.spatial_qk == "int8" else "dmajor"

    import jax
    import jax.numpy as jnp

    from live2diff_tpu import aot
    from live2diff_tpu.builder import build_pipeline, encode_prompt_for_pipeline
    from live2diff_tpu.wrapper import enable_compilation_cache

    if not args.no_xla_cache:
        enable_compilation_cache()

    config = {
        "num_inference_steps": 50,
        "t_index_list": list(args.steps),
        "noise_scheduler_kwargs": {
            "num_train_timesteps": 1000, "beta_start": 0.00085,
            "beta_end": 0.012, "beta_schedule": "linear",
        },
        "unet_additional_kwargs": {
            "cond_mapping": True,
            "motion_module_kwargs": {
                "num_attention_heads": 8,
                "temporal_position_encoding_max_len": 24,
                "attention_kwargs": {"window_size": 16, "sink_size": 8},
            },
        },
    }
    t0 = time.time()
    built = build_pipeline(config, height=args.height, width=args.width,
                           use_depth=True, dtype=jnp.bfloat16,
                           kv_cache_dtype=args.kv_cache, output_uint8=True)
    build_s = time.time() - t0
    stage(f"build {build_s:.1f}s")
    out = {"build_s": round(build_s, 1), "phase": args.phase}

    if args.phase == "prime":
        t0 = time.time()
        key = aot.save_executables(built.stream, "engines/aot")
        out["prime_s"] = round(time.time() - t0, 1)
        out["key"] = key
        stage(f"primed {key} in {out['prime_s']}s")
        for f in sorted(os.listdir("engines/aot")):
            if key and key in f:
                out[f.split("-")[-1]] = os.path.getsize(
                    os.path.join("engines/aot", f))
    else:
        t0 = time.time()
        hit = aot.load_executables(built.stream, "engines/aot")
        out["aot_hit"] = hit
        out["aot_load_s"] = round(time.time() - t0, 1)
        stage(f"aot load hit={hit} {out['aot_load_s']}s")
        prompt = encode_prompt_for_pipeline(built, "probe")
        rng = np.random.RandomState(0)
        warmup = rng.rand(8, args.height, args.width, 3).astype(np.float32) * 2 - 1
        t0 = time.time()
        state, _ = built.stream.prepare(warmup, prompt)
        out["prepare_s"] = round(time.time() - t0, 1)
        stage(f"prepare {out['prepare_s']}s")
        frame = (rng.rand(args.height, args.width, 3) * 255).astype(np.uint8)
        t0 = time.time()
        state, o = built.stream(state, frame)
        jax.block_until_ready(o)
        out["first_step_s"] = round(time.time() - t0, 1)
        out["total_to_first_frame_s"] = round(time.time() - _T0, 1)
        stage(f"first frame {out['first_step_s']}s; "
              f"total {out['total_to_first_frame_s']}s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
