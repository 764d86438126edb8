"""Pallas TPU kernel for streaming temporal window attention.

The hot per-frame op of the motion modules: each spatial position (x head)
attends over its own 16-slot KV window. As plain XLA this is a batched
matvec, which TPU lowers to multiply+reduce — and with fp32 accumulation XLA
first *materialises fp32 copies of the whole KV-cache in HBM* (hundreds of
MB per layer per frame). This kernel reads the bf16 cache once, multiplies
on the VPU, and keeps all fp32 softmax state in registers/VMEM.

Math (identical to the reference's PE-relative streaming attention,
/root/reference/live2diff/animatediff/models/stream_motion_module.py:99-213,
after factoring the positional-encoding terms out of the cache):

    logits = scale * q_full . k_cache  +  extra          (extra = scale * q_full . pe_k + bias)
    probs  = softmax(logits)                             (fp32)
    out    = probs . v_cache                             (+ probs . pe_v, added by the caller)

Layout contract (chosen so every reshape outside is free):
    q_full : [steps, HW*heads, dh]          (PE-added queries, heads folded)
    cache  : [steps, 2, window, HW*heads, dh]  (k=index 0, v=index 1; PE-free)
    extra  : [steps, HW*heads, window] fp32
Returns (out, probs): [steps, HW*heads, dh], [steps, HW*heads, window] fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, extra_ref, out_ref, probs_ref, *, scale, window):
    """Static unroll over the (tiny) window; only lane-dim reductions, which
    Mosaic supports everywhere (cross-sublane multi_reductions do not lower)."""
    q = q_ref[0]  # [bp, dh] bf16

    # logits[p, w] = scale * sum_d q[p, d] * k[w, p, d]   (VPU, fp32 accumulate)
    cols = [
        jnp.sum((k_ref[0, 0, w] * q).astype(jnp.float32), axis=-1, keepdims=True)
        for w in range(window)
    ]
    logits = jnp.concatenate(cols, axis=-1) * scale + extra_ref[0]  # [bp, window] f32

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [bp, window] fp32

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # [bp, dh]
    for w in range(window):
        acc = acc + v_ref[0, 0, w].astype(jnp.float32) * p[:, w : w + 1]
    out_ref[0] = acc.astype(out_ref.dtype)
    probs_ref[0] = p


@functools.partial(jax.jit, static_argnames=("scale", "block_p"))
def stream_window_attention_kernel(
    q_full: jnp.ndarray,  # [steps, P, dh]  (P = HW * heads)
    cache: jnp.ndarray,  # [steps, 2, window, P, dh]
    extra: jnp.ndarray,  # [steps, P, window] fp32
    scale: float,
    block_p: int = 0,
):
    s, p_total, dh = q_full.shape
    window = cache.shape[2]
    if not block_p:
        # K+V blocks are [window, block_p, dh] with the lane dim padded to a
        # multiple of 128; keep the double-buffered working set inside the
        # scoped-VMEM budget at every head size (dh 40/80 pad 128, 160 pads 256)
        block_p = 512 if dh <= 64 else 256
    block_p = min(block_p, p_total)
    assert p_total % block_p == 0, (p_total, block_p)
    grid = (s, p_total // block_p)

    kernel = functools.partial(_kernel, scale=scale, window=window)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, p_total, dh), q_full.dtype),
            jax.ShapeDtypeStruct((s, p_total, window), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_p, dh), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, block_p, dh), lambda si, pi: (si, 0, 0, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, block_p, dh), lambda si, pi: (si, 1, 0, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_p, window), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_p, dh), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_p, window), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(q_full, cache, cache, extra)
