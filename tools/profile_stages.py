"""Per-stage TPU timing: where does the frame budget go?

Times each submodel of the streaming step in isolation (jitted separately):
TinyVAE encode, MiDaS depth, stream-batch UNet, TinyVAE decode — then the
fused `_frame_step` program, so fusion wins/losses are visible. Mirrors the
granularity of the reference's depth-vs-total EMA split
(/root/reference/live2diff/pipeline_stream_animation_depth.py:626-659) but
at full stage resolution.

Usage: python tools/profile_stages.py [--height 512] [--width 512]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--steps", type=int, nargs="*", default=[30, 40])
    p.add_argument("--trace", action="store_true", help="dump a jax.profiler trace of the fused step")
    p.add_argument("--skip-unet", action="store_true",
                   help="skip the standalone UNet jit (slowest compile); infer its cost as full-step minus codecs")
    args = p.parse_args()

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
    built = build_pipeline(config, height=H, width=W, use_depth=True, dtype=jnp.bfloat16)
    stream = built.stream
    prompt = encode_prompt_for_pipeline(built, "profile")

    rng = np.random.RandomState(0)
    warmup_frames = rng.rand(8, H, W, 3).astype(np.float32) * 2 - 1
    state, _ = stream.prepare(warmup_frames, prompt)
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 2 - 1)

    params = stream.params
    n = stream.num_steps
    lh, lw = stream.cfg.latent_height, stream.cfg.latent_width

    # isolated stages
    enc = jax.jit(lambda p, x: stream.vae_encode(p["vae"], x))
    dec = jax.jit(lambda p, z: stream.vae_decode(p["vae"], z))
    depth = jax.jit(lambda p, x: stream._encode_depth(p, x))
    x_t = jnp.zeros((n, lh, lw, 4), jnp.float32)
    d_lat = jnp.zeros((n, lh, lw, 4), jnp.float32)

    emb = stream._prompt_embeds

    t_enc = timeit(enc, params, frame[None])
    print(f"  vae_encode : {t_enc*1e3:8.2f} ms", flush=True)
    t_dec = timeit(dec, params, x_t[:1])
    print(f"  vae_decode : {t_dec*1e3:8.2f} ms", flush=True)
    t_depth = timeit(depth, params, frame[None])
    print(f"  depth(DPT) : {t_depth*1e3:8.2f} ms  (includes VAE-encode of depth map)", flush=True)

    t_unet = None
    if not args.skip_unet:
        def unet_only(p, x, d, st, emb):
            return stream._unet_apply(p, x, d, st, emb)

        unet_j = jax.jit(unet_only)
        t_unet = timeit(unet_j, params, x_t, d_lat, state, emb)
        print(f"  unet x{n}   : {t_unet*1e3:8.2f} ms", flush=True)

    # fused step, donated like production (state is re-usable across iters
    # because donation invalidates only the old buffer names, and timeit
    # discards outputs -> reuse the returned state)
    st = state
    for _ in range(3):
        st, out = stream._jit_step(params, st, frame, emb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        st, out = stream._jit_step(params, st, frame, emb)
    jax.block_until_ready(out)
    t_full = (time.perf_counter() - t0) / iters

    codecs = t_enc + t_dec + t_depth
    print(f"stage timings ({W}x{H}, {n} steps, bf16, TinyVAE, DPT-hybrid):")
    print(f"  codecs sum : {codecs*1e3:8.2f} ms")
    if t_unet is not None:
        print(f"  sum        : {(codecs+t_unet)*1e3:8.2f} ms")
    print(f"  fused step : {t_full*1e3:8.2f} ms ({1/t_full:.2f} fps)")
    print(f"  implied unet+state: {(t_full-codecs)*1e3:8.2f} ms")

    if args.trace:
        with jax.profiler.trace("/tmp/jax_trace"):
            for _ in range(3):
                out = full_j(params, state, frame, emb)
            jax.block_until_ready(out)
        print("trace written to /tmp/jax_trace")


if __name__ == "__main__":
    main()
