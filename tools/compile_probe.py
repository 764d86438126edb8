"""Time the lowering + XLA compile of the stream programs in isolation.

The full-pipeline programs are the biggest compiles in the framework; this
probe times them per variant so compile-time regressions are bisectable:

    python tools/compile_probe.py --program step --kv-cache int8
    LIVE2DIFF_FLASH=smajor python tools/compile_probe.py --program step

Prints lower_s / compile_s and (optionally, --run N) device step time.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--steps", type=int, nargs="*", default=[30, 40])
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default="bf16")
    p.add_argument("--program", choices=["step", "warmup"], default="step")
    p.add_argument("--run", type=int, default=0, help="execute N timed iterations")
    p.add_argument("--cache", action="store_true", help="use the persistent compile cache")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from live2diff_tpu.builder import build_pipeline, encode_prompt_for_pipeline

    if args.cache:
        from live2diff_tpu.wrapper import enable_compilation_cache

        enable_compilation_cache()

    H, W = args.height, args.width
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
    built = build_pipeline(config, height=H, width=W, use_depth=True,
                           dtype=jnp.bfloat16, kv_cache_dtype=args.kv_cache)
    stream = built.stream
    prompt = encode_prompt_for_pipeline(built, "probe")
    stream.set_prompt(prompt)
    state = stream.init_state()
    print(f"build_s={time.time() - t0:.1f}", flush=True)

    if args.program == "step":
        fn = stream._jit_step
        frame = jnp.zeros((H, W, 3), jnp.float32)
        ex_args = (stream.params, state, frame, stream._prompt_embeds)
    else:
        fn = stream._jit_prepare
        warm = jnp.zeros((8, H, W, 3), jnp.float32)
        ex_args = (stream.params, state, warm, stream._prompt_embeds)

    t0 = time.time()
    lowered = fn.lower(*ex_args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"program={args.program} kv={args.kv_cache} "
          f"lower_s={t1 - t0:.1f} compile_s={t2 - t1:.1f}", flush=True)

    if args.run:
        out = compiled(*ex_args)
        jax.block_until_ready(out)
        if args.program == "step":
            state2, _ = out
            t0 = time.time()
            for _ in range(args.run):
                state2, o = compiled(stream.params, state2, frame, stream._prompt_embeds)
            jax.block_until_ready(o)
            dt = (time.time() - t0) / args.run
            print(f"step_ms={dt * 1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
