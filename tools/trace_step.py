"""Op-level TPU profile of the fused frame step.

Captures a jax.profiler trace of N streamed frames, then aggregates device
XPlane events by op name and prints the top time consumers — the
tool we use to find which UNet ops eat the frame budget (the TPU
counterpart of the reference's TensorRT layer-time IProfiler,
/root/reference/live2diff/acceleration/tensorrt/engine.py:130-140).

Usage: python tools/trace_step.py [--frames 8] [--height 512]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

import time

import numpy as np

sys.path.insert(0, ".")

_T0 = time.time()


def stage(msg):
    print(f"# [{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--steps", type=int, nargs="*", default=[30, 40])
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="/tmp/jax_trace_step")
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default="bf16")
    p.add_argument("--sessions", type=int, default=1,
                   help="trace the S-session MultiStream batched step instead "
                        "of the single-stream step (VERDICT r4 item 6: "
                        "utilization data for the batching claim)")
    p.add_argument("--spatial-qk", choices=["bf16", "int8"], default="bf16")
    args = p.parse_args()

    if args.spatial_qk == "int8":
        os.environ["LIVE2DIFF_FLASH"] = "int8"

    import jax
    import jax.numpy as jnp

    from live2diff_tpu.builder import build_pipeline, encode_prompt_for_pipeline
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
    stage("imports done, building")
    # output_uint8 + uint8 frames match bench.py's serving programs exactly,
    # so a bench-primed persistent cache serves this tool without recompiles
    built = build_pipeline(config, height=H, width=W, use_depth=True,
                           dtype=jnp.bfloat16, kv_cache_dtype=args.kv_cache,
                           output_uint8=True)
    stream = built.stream
    prompt = encode_prompt_for_pipeline(built, "trace")
    stage("built + prompt encoded")

    rng = np.random.RandomState(0)
    if args.sessions > 1:
        from live2diff_tpu.stream.multi import MultiStream

        S = args.sessions
        ms = MultiStream(stream, S)
        warmup = rng.rand(S, 8, H, W, 3).astype(np.float32) * 2 - 1
        pa = jnp.asarray(prompt)
        prompts = jnp.broadcast_to(pa.reshape(1, *pa.shape[-2:]), (S, *pa.shape[-2:]))
        state, _ = ms.prepare(warmup, prompts)
        stage("prepare done (multi)")
        frame = (rng.rand(S, H, W, 3) * 255).astype(np.uint8)
        step = lambda st, fr: ms(st, fr)  # noqa: E731
    else:
        warmup = rng.rand(8, H, W, 3).astype(np.float32) * 2 - 1
        state, _ = stream.prepare(warmup, prompt)
        stage("prepare done")
        frame = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        step = lambda st, fr: stream(st, fr)  # noqa: E731

    # compile + settle
    for _ in range(3):
        state, out = step(state, frame)
    jax.block_until_ready(out)
    stage("frame step warm")

    # compiled-program FLOP count -> exact MFU from the op-sum below
    try:
        jitted = (stream._jit_step if args.sessions == 1
                  else ms._jit_step_all)
        entries = jitted._cache_size() if hasattr(jitted, "_cache_size") else None
        ca = None
        import jax.stages  # noqa: F401
        # lower again purely for cost analysis (traced, not compiled: the
        # executable itself comes from the in-process jit cache)
        if args.sessions == 1:
            ca = jitted.lower(stream.params, state, jnp.asarray(frame),
                              stream._prompt_embeds).compile().cost_analysis()
        else:
            ca = jitted.lower(stream.params, state, jnp.asarray(frame),
                              ms._prompts).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if flops:
            print(f"program flops: {flops/1e9:.1f} GF "
                  f"({flops/1e9/max(args.sessions,1):.1f} GF/session)")
    except Exception as e:
        flops = 0.0
        print(f"# cost analysis unavailable: {e!r}")

    with jax.profiler.trace(args.out):
        for _ in range(args.frames):
            state, out = step(state, frame)
        jax.block_until_ready(out)

    # ---- parse newest trace file ----
    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {args.out}"
    pd = jax.profiler.ProfileData.from_file(paths[-1])

    per_op = collections.Counter()
    per_line = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            total = 0.0
            for ev in line.events:
                total += ev.duration_ns
                if line.name == "XLA Ops":
                    per_op[ev.name] += ev.duration_ns
            if total:
                per_line[line.name] = total
    for name, ns in per_line.items():
        print(f"line {name!r}: {ns/1e6/args.frames:.2f} ms/frame")
    opsum_ms = per_line.get("XLA Ops", 0.0) / 1e6 / args.frames
    if flops and opsum_ms:
        eff = flops / (opsum_ms / 1e3) / 1e12
        print(f"effective throughput: {eff:.1f} TF/s over the op-sum "
              f"({100*eff/197:.1f}% of v5e bf16 peak 197 TF/s)")
    print(f"top ops ('XLA Ops' line, {args.frames} frames):")
    for name, ns in per_op.most_common(args.top):
        print(f"{ns/1e6/args.frames:10.3f} ms/frame  {name[:110]}")

    # ---- aggregate by op family: strip %name.NNN suffix, bucket shapes ----
    import re

    fam = collections.Counter()
    fam_n = collections.Counter()
    for name, ns in per_op.items():
        m = re.match(r"%?([a-zA-Z_][\w\-]*?)(?:[._]\d+)*\s*=\s*(\S+?)\[([\d,]*)\]", name)
        if m:
            base, dt, shape = m.groups()
            key = f"{base} {dt}[{shape}]"
        else:
            key = name.split(" = ")[0].split(".")[0].lstrip("%")
        fam[key] += ns
        fam_n[key] += 1
    print(f"\nop families (summed over shapes, {args.frames} frames):")
    for key, ns in fam.most_common(args.top):
        print(f"{ns/1e6/args.frames:10.3f} ms/frame  x{fam_n[key]:<4d} {key[:100]}")

    coarse = collections.Counter()
    for key, ns in fam.items():
        coarse[key.split(" ")[0]] += ns
    print("\ncoarse buckets:")
    for key, ns in coarse.most_common(30):
        print(f"{ns/1e6/args.frames:10.3f} ms/frame  {key}")


if __name__ == "__main__":
    main()
