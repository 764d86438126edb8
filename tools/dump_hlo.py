"""Dump the optimized HLO of the fused frame step (TPU) for fusion forensics.

trace_step.py names the hot fusions; this prints their definitions so we can
see what XLA actually scheduled (weight repacks, dtype of conv transforms,
copies). Usage: python tools/dump_hlo.py [--grep PATTERN] [--height 512]
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--steps", type=int, nargs="*", default=[30, 40])
    p.add_argument("--grep", default=None,
                   help="print full definitions of fusions whose root line matches")
    p.add_argument("--out", default="/tmp/stream_step.hlo")
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from live2diff_tpu.builder import build_pipeline, encode_prompt_for_pipeline
    from live2diff_tpu.wrapper import enable_compilation_cache

    enable_compilation_cache()
    # identical config to trace_step.py / bench.py so the persistent cache hits
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
    built = build_pipeline(config, height=args.height, width=args.width,
                           use_depth=True, dtype=jnp.bfloat16,
                           kv_cache_dtype=args.kv_cache)
    stream = built.stream
    prompt = encode_prompt_for_pipeline(built, "hlo dump")
    stream.set_prompt(prompt)
    state = stream.init_state(seed=0)
    frame = jnp.zeros((args.height, args.width, 3), jnp.float32)

    lowered = stream._jit_step.lower(stream.params, state, frame,
                                     stream._prompt_embeds)
    txt = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {args.out}", file=sys.stderr)

    if args.grep:
        pat = re.compile(args.grep)
        lines = txt.splitlines()
        # print whole fusion computations whose name matches
        i = 0
        while i < len(lines):
            if pat.search(lines[i]) and ("fusion" in lines[i] or "ENTRY" in lines[i]):
                print(lines[i][:400])
            i += 1


if __name__ == "__main__":
    main()
