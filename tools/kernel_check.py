"""On-device Pallas kernel selftest: every custom kernel vs its XLA fallback.

The interpret-mode CPU tests (tests/test_attention_ops.py) prove kernel
*math*; they cannot catch real-TPU lowering bugs — layouts, VMEM limits,
tail-block OOB faults (the LN kernel fault fixed in round 1,
ops/norm.py:181-184, was exactly this class). This runs each kernel at
production shapes ON THE CHIP and compares against the same math in plain
XLA.

Usage:  python tools/kernel_check.py          # one JSON line, exit != 0 on fail
        from tools.kernel_check import run_all  # bench.py preamble

Exact-math kernels (bf16 in, fp32 accumulation — identical arithmetic to the
fallback) must agree to bf16 rounding noise. int8 variants are lossy by
design; their measured error is reported and gated loosely (they also carry
an end-to-end PSNR gate in bench.py --psnr-check).
"""

from __future__ import annotations

import json
import sys

import numpy as np

EXACT_TOL = 2.5e-2   # bf16 rounding noise, elementwise relative-to-range
INT8_TOL = 8e-2      # quantisation by design; see bench --psnr-check for e2e


def _relerr(got, want) -> float:
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    denom = float(np.max(np.abs(want))) + 1e-6
    return float(np.max(np.abs(got - want))) / denom


def _check(name, got, want, tol, results) -> None:
    err = _relerr(got, want)
    results[name] = {"max_rel_err": round(err, 6), "tol": tol, "ok": err <= tol}


def run_all(quick: bool = False) -> dict:
    """Run every kernel-vs-XLA comparison on the default backend."""
    import jax
    import jax.numpy as jnp

    from live2diff_tpu.ops import attention as attn_mod
    from live2diff_tpu.ops import norm as norm_mod
    from live2diff_tpu.ops.attention import dot_product_attention, stream_window_attention
    from live2diff_tpu.ops.conv import conv3x3_fused, conv3x3_s2_fused
    from live2diff_tpu.ops.flash_attention import (
        flash_self_attention,
        flash_self_attention_dmajor,
        flash_self_attention_int8,
    )

    results: dict = {}
    key = jax.random.PRNGKey(0)

    def rand(*shape, dtype=jnp.bfloat16, k=[key]):
        k[0], sub = jax.random.split(k[0])
        return jax.random.normal(sub, shape, dtype=jnp.float32).astype(dtype)

    # ---- spatial flash attention (64x64-latent UNet block: B=steps, D=40) --
    b, h, s, d = (1, 2, 2048, 40) if quick else (2, 8, 4096, 40)
    q, k_, v = rand(b, h, s, d), rand(b, h, s, d), rand(b, h, s, d)
    scale = d**-0.5

    def sdpa_ref(q, k_, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    want = np.asarray(jax.jit(sdpa_ref)(q, k_, v), np.float32)
    _check("flash_smajor", flash_self_attention(q, k_, v, scale=scale), want,
           EXACT_TOL, results)
    _check("flash_dmajor",
           flash_self_attention_dmajor(q, k_, v, scale=scale, block_k=min(s, 4096)),
           want, EXACT_TOL, results)
    _check("flash_int8",
           flash_self_attention_int8(q, k_, v, scale=scale, block_k=min(s, 4096)),
           want, INT8_TOL, results)

    if not quick:
        # 768x512's level-0 sequence (S=6144): exercises the non-default
        # divisor blocks (pick_block -> q512/k3072) that a fixed 4096 block
        # could not tile (see ops/flash_attention.py pick_block)
        s2 = 6144
        q2, k2, v2 = rand(2, h, s2, d), rand(2, h, s2, d), rand(2, h, s2, d)
        want2 = np.asarray(jax.jit(sdpa_ref)(q2, k2, v2), np.float32)
        _check("flash_dmajor_6144",
               flash_self_attention_dmajor(q2, k2, v2, scale=scale,
                                           block_k=min(s2, 4096)),
               want2, EXACT_TOL, results)
        _check("flash_int8_6144",
               flash_self_attention_int8(q2, k2, v2, scale=scale,
                                         block_k=min(s2, 4096)),
               want2, INT8_TOL, results)

    # ---- streaming temporal attention (THE kernel): bf16 + int8 cache -----
    # production shapes: steps=2, window=16, heads=8; [C=320, HW=4096] is the
    # largest cache layer, [C=1280, HW=256] the deepest
    shapes = [(320, 1024 if quick else 4096)] if quick else [(320, 4096), (1280, 256)]
    for c, hw in shapes:
        steps, window, heads = 2, 16, 8
        q = rand(steps, hw, c)
        cache = rand(steps, 2, window, c, hw)
        pe_q = rand(steps, c, dtype=jnp.float32)
        pe_k = rand(steps, window, c, dtype=jnp.float32)
        pe_v = rand(steps, window, c, dtype=jnp.float32)
        bias = jnp.where(
            jnp.arange(window)[None, :] < 12, 0.0, -jnp.inf
        ) * jnp.ones((steps, 1))

        # XLA fallback = same function with the TPU dispatch disabled
        orig = attn_mod._on_tpu
        try:
            attn_mod._on_tpu = lambda: False
            want = np.asarray(
                stream_window_attention(q, cache, pe_q, pe_k, pe_v, bias, heads),
                np.float32,
            )
            # int8 cache: quantise per-(slot, CHANNEL) like the pipeline does
            cf = np.asarray(cache, np.float32)  # [s,2,w,C,hw]
            sc = np.abs(cf).max(axis=4) / 127.0 + 1e-12  # [s,2,w,C]
            data8 = jnp.asarray(
                np.clip(np.round(cf / sc[..., None]), -127, 127).astype(np.int8))
            scales = jnp.asarray(sc.astype(np.float32))
            want_int8 = np.asarray(
                stream_window_attention(q, (data8, scales), pe_q, pe_k, pe_v,
                                        bias, heads), np.float32)
        finally:
            attn_mod._on_tpu = orig

        got = stream_window_attention(q, cache, pe_q, pe_k, pe_v, bias, heads)
        _check(f"stream_attn_bf16_c{c}_hw{hw}", got, want, EXACT_TOL, results)
        got8 = stream_window_attention(q, (data8, scales), pe_q, pe_k, pe_v, bias, heads)
        # same int8 cache both sides: dequant math must agree to bf16 noise
        _check(f"stream_attn_int8_c{c}_hw{hw}", got8, want_int8, EXACT_TOL, results)

    # ---- fused TAESD convs -------------------------------------------------
    res = 128 if quick else 512
    for name, cin, cout, hh in [("taesd_conv64", 64, 64, res)]:
        x = rand(1, hh, hh, cin)
        w = rand(3, 3, cin, cout) * 0.1
        bias_c = rand(cout, dtype=jnp.float32).astype(jnp.bfloat16)
        skip = rand(1, hh, hh, cout)

        def conv_ref(x, w, bias_c, skip=None, stride=1, relu=True):
            # torch-convention pad 1 both sides (== "SAME" only at stride 1;
            # at stride 2 XLA "SAME" pads (0,1) and samples different pixels)
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), w.astype(jnp.float32),
                (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias_c.astype(jnp.float32)
            if skip is not None:
                y = y + skip.astype(jnp.float32)
            if relu:
                y = jnp.maximum(y, 0.0)
            return y.astype(x.dtype)

        want = np.asarray(jax.jit(conv_ref)(x, w, bias_c, skip), np.float32)
        _check(name, conv3x3_fused(x, w, bias_c, skip=skip, relu=True), want,
               EXACT_TOL, results)
        want2 = np.asarray(
            jax.jit(lambda x, w, b: conv_ref(x, w, b, stride=2, relu=False))(
                x, w, bias_c), np.float32)
        _check(name + "_s2", conv3x3_s2_fused(x, w, bias_c, relu=False), want2,
               EXACT_TOL, results)

    # ---- GroupNorm / LayerNorm kernels ------------------------------------
    bb, t, c = (2, 1024, 320) if quick else (2, 4096, 320)
    x = rand(bb, t, c)
    g = rand(c, dtype=jnp.float32)
    be = rand(c, dtype=jnp.float32)
    want = np.asarray(
        norm_mod.group_norm_act.__wrapped__(x, g, be, 32, 1e-5, "silu")
        if hasattr(norm_mod.group_norm_act, "__wrapped__")
        else _gn_fallback(norm_mod, x, g, be), np.float32)
    got = norm_mod._group_norm_kernel(x, g, be, 32, 1e-5, "silu")
    _check("group_norm_silu", got, want, EXACT_TOL, results)

    # LN at the MiDaS ViT shape: 577 tokens -> non-multiple rows exercises
    # the tail-padding path (the round-1 fault class, ops/norm.py:181-184)
    n0, cl = 8 * 577, 768
    xl = rand(n0, cl)
    gl = rand(cl, dtype=jnp.float32)
    bl = rand(cl, dtype=jnp.float32)
    xf = np.asarray(xl, np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mean * mean
    want_ln = ((xf - mean) / np.sqrt(var + 1e-5) * np.asarray(gl)
               + np.asarray(bl))
    got_ln = norm_mod._layer_norm_kernel(xl, gl, bl, 1e-5)
    _check("layer_norm_vit577", got_ln, want_ln, EXACT_TOL, results)

    results["pass"] = all(v["ok"] for v in results.values() if isinstance(v, dict))
    return results


def _gn_fallback(norm_mod, x, g, be):
    """group_norm_act's XLA path, forced by disabling the kernel gate."""
    orig = norm_mod._GN_KERNEL
    try:
        norm_mod._GN_KERNEL = False
        return norm_mod.group_norm_act(x, g, be, 32, 1e-5, "silu")
    finally:
        norm_mod._GN_KERNEL = orig


def main() -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="smaller shapes")
    args = p.parse_args()
    results = run_all(quick=args.quick)
    print(json.dumps({"metric": "kernel_selftest", **results}))
    return 0 if results["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
