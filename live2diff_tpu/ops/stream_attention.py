"""Pallas TPU kernel for streaming temporal window attention.

The hot per-frame op of the motion modules: each spatial position (x head)
attends over its own 16-slot KV window. As plain XLA this is a batched
matvec, which TPU lowers to multiply+reduce — and with fp32 accumulation XLA
first *materialises fp32 copies of the whole KV-cache in HBM* (hundreds of
MB per layer per frame). This kernel reads the bf16 cache exactly once,
multiplies on the VPU, and keeps all fp32 softmax state in registers.

Math (identical to the reference's PE-relative streaming attention,
/root/reference/live2diff/animatediff/models/stream_motion_module.py:99-213,
after factoring the K positional encoding out of the cache):

    logits = scale * q_full . k_cache  +  extra     (extra = scale * q_full . pe_k + bias)
    probs  = softmax(logits)                        (fp32, per head)
    out    = probs . (v_cache + pe_v)               (pe_v added in-kernel, broadcast over HW)

Layout: ``[steps, 2, window, C, HW]`` — HW on lanes — is the cache's
*declared* shape throughout the framework, so the default major-to-minor
layout is exactly what this kernel requires: no jit-level layout pinning
(the compile service honors entry layouts nondeterministically) and no
whole-cache relayouts; only the few-MB per-frame K/V updates get transposed
into it on write.

Head separation runs on the MXU with a block-diagonal head mask:

    logits[h, p] = M^T @ (q * k_w)      M[c, h] = 1 iff channel c in head h
    out += (M @ probs_w) * (v_w + pe_v_w)

The whole 16-slot window fits one VMEM block at every UNet level (block_p
is sized so K+V double-buffered stay ~<=24 MB), so there is no online
softmax state — a static unroll over the window does everything in
registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, extra_ref, pev_ref, out_ref, *, scale, window, heads):
    q = q_ref[0]  # [C, bp] bf16
    c, bp = q.shape
    dh = c // heads
    ci = jax.lax.broadcasted_iota(jnp.int32, (heads, c), 1)
    hi = jax.lax.broadcasted_iota(jnp.int32, (heads, c), 0)
    mask_t = (ci // dh == hi).astype(q.dtype)  # [heads, C]
    mask_f = mask_t.T.astype(jnp.float32)  # [C, heads]

    logits = []
    for w in range(window):
        prod = k_ref[0, 0, w] * q  # [C, bp] bf16
        lw = jax.lax.dot_general(
            mask_t, prod, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [heads, bp]
        logits.append(lw + extra_ref[0, w])

    m = logits[0]
    for lw in logits[1:]:
        m = jnp.maximum(m, lw)
    ps = [jnp.exp(lw - m) for lw in logits]
    l = ps[0]
    for p in ps[1:]:
        l = l + p
    inv = 1.0 / l  # [heads, bp]

    acc = jnp.zeros((c, bp), jnp.float32)
    for w, p in enumerate(ps):
        pfull = jax.lax.dot_general(
            mask_f, p * inv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, bp]
        v_eff = v_ref[0, 0, w].astype(jnp.float32) + pev_ref[0][:, w : w + 1]  # [C, bp] + [C, 1]
        acc = acc + v_eff * pfull
    out_ref[0] = acc.astype(out_ref.dtype)


def _block_p(hw: int, c: int, window: int) -> int:
    budget = 24 * 1024 * 1024  # K+V double-buffered VMEM target
    bp = budget // (2 * 2 * window * c * 2)
    bp = max(64, 1 << (bp.bit_length() - 1))
    return min(bp, hw)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block_p"))
def stream_window_attention_kernel(
    q_t: jnp.ndarray,  # [steps, C, HW]  (transposed q_full)
    cache_t: jnp.ndarray,  # [steps, 2, window, C, HW] (swapaxes view of the cache)
    extra: jnp.ndarray,  # [steps, window, heads, HW] fp32
    pe_v_t: jnp.ndarray,  # [steps, C, window] fp32 (broadcast over HW in-kernel)
    scale: float,
    heads: int,
    block_p: int = 0,
):
    s, c, hw = q_t.shape
    window = cache_t.shape[2]
    bp = block_p or _block_p(hw, c, window)
    while hw % bp:
        bp //= 2
    grid = (s, hw // bp)

    kernel = functools.partial(_kernel, scale=scale, window=window, heads=heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, c, hw), q_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, bp), lambda si, pi: (si, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, c, bp), lambda si, pi: (si, 0, 0, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, c, bp), lambda si, pi: (si, 1, 0, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window, heads, bp), lambda si, pi: (si, 0, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, window), lambda si, pi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, bp), lambda si, pi: (si, 0, pi),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=56 * 1024 * 1024,
        ),
    )(q_t, cache_t, cache_t, extra, pe_v_t)


# ---------------------------------------------------------------------------
# int8 KV-cache variant
# ---------------------------------------------------------------------------


def _kernel_int8(
    q_ref, k_ref, v_ref, extra_ref, pev_ref, ks_ref, vs_ref, out_ref,
    *, scale, window, heads,
):
    """Same attention as ``_kernel`` over an int8 cache.

    Dequantisation is free even at per-(slot, CHANNEL) granularity: the K
    scales fold into the ``[heads, C]`` head-mask matmul operand (built per
    window slot from a [C] row — heads*C tiny VPU work, no [C, bp]-sized
    pass), and the V scales arrive in the same tiny ``[C, window]`` layout
    as ``pe_v``. The mask product is computed in f32 and rounded ONCE to
    bf16 for the MXU: scale-value rounding error ~2^-9 per channel,
    averaging out over the dh contraction — well under the int8
    quantisation noise itself.
    """
    q = q_ref[0]  # [C, bp] bf16
    c, bp = q.shape
    dh = c // heads
    ci = jax.lax.broadcasted_iota(jnp.int32, (heads, c), 1)
    hi = jax.lax.broadcasted_iota(jnp.int32, (heads, c), 0)
    mask_bool = ci // dh == hi  # [heads, C]
    mask_t = mask_bool.astype(q.dtype)
    mask_f = mask_t.T.astype(jnp.float32)  # [C, heads]

    ks = ks_ref[0]  # [C, window] f32 per-channel K scales
    mask_f32 = mask_bool.astype(jnp.float32)

    logits = []
    for w in range(window):
        prod = k_ref[0, 0, w].astype(q.dtype) * q  # int8 -> bf16, [C, bp]
        mw = (mask_f32 * (ks[:, w] * scale)[None, :]).astype(q.dtype)  # [heads, C]
        lw = jax.lax.dot_general(
            mw, prod, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [heads, bp]
        logits.append(lw + extra_ref[0, w])

    m = logits[0]
    for lw in logits[1:]:
        m = jnp.maximum(m, lw)
    ps = [jnp.exp(lw - m) for lw in logits]
    l = ps[0]
    for p in ps[1:]:
        l = l + p
    inv = 1.0 / l  # [heads, bp]

    acc = jnp.zeros((c, bp), jnp.float32)
    for w, p in enumerate(ps):
        pfull = jax.lax.dot_general(
            mask_f, p * inv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, bp]
        v_eff = (
            v_ref[0, 0, w].astype(jnp.float32) * vs_ref[0][:, w : w + 1]
            + pev_ref[0][:, w : w + 1]
        )  # [C, bp] + [C, 1]
        acc = acc + v_eff * pfull
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block_p"))
def stream_window_attention_kernel_int8(
    q_t: jnp.ndarray,  # [steps, C, HW]
    cache_data: jnp.ndarray,  # [steps, 2, window, C, HW] int8
    extra: jnp.ndarray,  # [steps, window, heads, HW] fp32
    pe_v_t: jnp.ndarray,  # [steps, C, window] fp32
    k_scales_t: jnp.ndarray,  # [steps, C, window] fp32 per-channel
    v_scales_c: jnp.ndarray,  # [steps, C, window] fp32 per-channel
    scale: float,
    heads: int,
    block_p: int = 0,
):
    s, c, hw = q_t.shape
    window = cache_data.shape[2]
    # int8 K+V halve the VMEM need per block vs bf16
    bp = block_p or min(hw, 2 * _block_p(hw, c, window))
    while hw % bp:
        bp //= 2
    grid = (s, hw // bp)

    kernel = functools.partial(_kernel_int8, scale=scale, window=window, heads=heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, c, hw), q_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, bp), lambda si, pi: (si, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, c, bp), lambda si, pi: (si, 0, 0, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, c, bp), lambda si, pi: (si, 1, 0, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window, heads, bp), lambda si, pi: (si, 0, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, window), lambda si, pi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, window), lambda si, pi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, window), lambda si, pi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, bp), lambda si, pi: (si, 0, pi),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=56 * 1024 * 1024,
        ),
    )(q_t, cache_data, cache_data, extra, pe_v_t, k_scales_t, v_scales_c)
