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

    logits = scale * q_full . k_cache  +  extra      (extra = scale * q_full . pe_k + bias)
    probs  = softmax(logits)                         (fp32, per head)
    out    = probs . v_cache                         (+ probs . pe_v, added by the caller)

Layout: the cache keeps the model's channel dim on lanes
(``[steps, 2, window, HW, C]``, C = heads*dh) — C is 128-aligned-ish for
every UNet level (320/640/1280), whereas a head-split dh=40 lane dim would
pad to 128 and waste ~3x HBM bandwidth on the cache read. Head separation
is done *inside* the kernel with a block-diagonal head mask on the MXU:

    logits[p, h] = (q * k_w) @ M        M[c, h] = 1 iff c in head h
    out += (probs_w @ M^T) * v_w

``extra`` and the returned ``probs`` pack (window, head) on lanes in
w-major order (lane = w*heads + h; 16*8 = 128 lanes for the production
config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, extra_ref, out_ref, probs_ref, *, scale, window, heads):
    q = q_ref[0]  # [bp, C] bf16
    extra = extra_ref[0]  # [bp, window*heads] fp32, lane = w*heads + h
    bp, c = q.shape
    dh = c // heads

    ci = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    mask = (ci // dh == hi).astype(q.dtype)  # [C, heads] block-diagonal
    mask_t = mask.T.astype(jnp.float32)  # [heads, C]

    # pass 1: per-slot logits (VPU multiply + tiny MXU mask-matmul)
    logits = []
    for w in range(window):
        prod = k_ref[0, 0, w] * q  # [bp, C] bf16
        lw = jnp.dot(prod, mask, preferred_element_type=jnp.float32) * scale
        logits.append(lw + extra[:, w * heads : (w + 1) * heads])  # [bp, heads]

    m = logits[0]
    for w in range(1, window):
        m = jnp.maximum(m, logits[w])
    ps = [jnp.exp(lw - m) for lw in logits]
    l = ps[0]
    for w in range(1, window):
        l = l + ps[w]
    inv = 1.0 / l  # [bp, heads]

    # pass 2: weighted V accumulation (fp32)
    acc = jnp.zeros((bp, c), jnp.float32)
    probs_cols = []
    for w in range(window):
        pw = ps[w] * inv  # [bp, heads] fp32
        probs_cols.append(pw)
        pfull = jnp.dot(pw, mask_t, preferred_element_type=jnp.float32)  # [bp, C]
        acc = acc + v_ref[0, 0, w].astype(jnp.float32) * pfull
    out_ref[0] = acc.astype(out_ref.dtype)
    probs_ref[0] = jnp.concatenate(probs_cols, axis=-1)  # [bp, window*heads]


def _block_p(hw: int, c_pad: int) -> int:
    # keep the double-buffered K+V working set ~<= 24 MB of VMEM
    budget = 24 * 1024 * 1024
    bp = budget // (16 * c_pad * 2 * 2 * 2)
    bp = max(64, 1 << (bp.bit_length() - 1))
    return min(bp, hw)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block_p"))
def stream_window_attention_kernel(
    q_full: jnp.ndarray,  # [steps, HW, C]
    cache: jnp.ndarray,  # [steps, 2, window, HW, C]
    extra: jnp.ndarray,  # [steps, HW, window*heads] fp32 (w-major lanes)
    scale: float,
    heads: int,
    block_p: int = 0,
):
    s, hw, c = q_full.shape
    window = cache.shape[2]
    c_pad = ((c + 127) // 128) * 128
    bp = block_p or _block_p(hw, c_pad)
    while hw % bp:
        bp //= 2
    grid = (s, hw // bp)
    wh = window * heads

    kernel = functools.partial(_kernel, scale=scale, window=window, heads=heads)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, hw, c), q_full.dtype),
            jax.ShapeDtypeStruct((s, hw, wh), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, bp, c), lambda si, pi: (si, 0, 0, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window, bp, c), lambda si, pi: (si, 1, 0, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, wh), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bp, c), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, wh), lambda si, pi: (si, pi, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=56 * 1024 * 1024,
        ),
    )(q_full, cache, cache, extra)
