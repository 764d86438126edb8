"""Pallas TPU flash attention for the UNet's spatial self-attention.

The hot spatial self-attentions run at S = 4096 (64x64 latents) and S = 1024
(32x32) with head_dim 40/80 — far too large to materialise the [H, S, S]
logits in HBM (1 GB fp32 at S=4096), and the XLA blockwise-scan fallback in
``ops/attention.py`` round-trips fp32 accumulators through HBM every chunk.
This kernel keeps the whole online-softmax state (m, l, acc) in VMEM scratch
and streams K/V tiles through the MXU, so HBM traffic is exactly
q + k + v + out.

Replaces what xformers' ``memory_efficient_attention`` / torch SDPA do for
the reference (/root/reference/live2diff/animatediff/models/attention.py:543-560)
— here as a first-party kernel instead of a vendored CUDA library.

Layout contract: ``[B, H, S, D]`` (callers transpose from the model's
``[B, S, H, D]``; XLA fuses that transpose into neighbouring ops). All block
sizes are static; S must divide by the chosen blocks (the public wrapper
asserts). fp32 softmax statistics, bf16 MXU matmuls with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane width of the m/l scratch rows (TPU vector lane count)
_LANES = 128
# "-inf" substitute: avoids NaN from exp(-inf - (-inf)) at masked-out rows
_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, kv_steps):
    """One (batch, head, q-tile, kv-tile) grid cell of online-softmax attention."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    m_prev = m_ref[...]  # [bq, LANES] (all lanes equal)
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # lane-broadcast
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])  # [bq, bk]
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0, 0]  # [bk, D]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, D]
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(ki == kv_steps - 1)
    def _store():
        l = l_ref[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _flash_kernel_dmajor(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                         *, scale, kv_steps):
    """D-major variant: operands are ``[D, S]`` tiles (head_dim on sublanes).

    The UNet's head_dim is 40/80 — as the minor (lane) dim it pads to 128
    lanes, so every q/k/v/out tile carries 1.6-3.2x phantom bytes through
    HBM and VMEM and the MXU chews zero lanes. With D on the *sublane* axis
    (40 and 80 are both 8-aligned) the tiles are dense. Softmax state is
    kept transposed too: logits are computed as ``k^T q -> [bk, bq]`` so the
    running max/sum reduce over sublanes and broadcast over lanes.
    """
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [D, bq]
    k = k_ref[0, 0]  # [D, bk]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bk, bq]

    m_prev = m_ref[...]  # [8, bq] (all rows equal)
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=0, keepdims=True)  # [1, bq]
    m_next = jnp.maximum(m_prev, m_curr)  # sublane-broadcast
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:1])  # [bk, bq]
    l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)

    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0, 0]  # [D, bk]
    pv = jax.lax.dot_general(
        v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, bq]
    acc_ref[...] = acc_ref[...] * alpha[:1] + pv

    @pl.when(ki == kv_steps - 1)
    def _store():
        l = l_ref[...][:1]  # [1, bq]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def pick_block(s: int, target: int, align: int = 128) -> int:
    """Largest block ≤ ``target`` that divides ``s`` and is lane-aligned.

    The spatial sequence length is resolution-dependent (512x512 -> 4096,
    768x512 -> 6144, ...); a fixed block size does not divide every
    resolution's S (6144 % 4096 != 0 was a live 768x512 failure). Callers
    guarantee ``s % align == 0`` via the dispatch gate (attention.py).
    """
    if s <= target:
        return s
    b = target - target % align
    while b > align and s % b:
        b -= align
    return b


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_self_attention_dmajor(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Unmasked SDPA, ``[B, H, S, D]`` in/out, D-major tiles internally."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = pick_block(sq, block_q)
    block_k = pick_block(sk, block_k)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    kv_steps = sk // block_k

    qt, kt, vt = (jnp.swapaxes(x, 2, 3) for x in (q, k, v))  # [B, H, D, S]
    grid = (b, h, sq // block_q, kv_steps)
    kernel = functools.partial(_flash_kernel_dmajor, scale=scale, kv_steps=kv_steps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, d, block_q), lambda b, h, qi, ki: (b, h, 0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d, block_k), lambda b, h, qi, ki: (b, h, 0, ki),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d, block_k), lambda b, h, qi, ki: (b, h, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d, block_q), lambda b, h, qi, ki: (b, h, 0, qi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),  # running max (rows equal)
            pltpu.VMEM((8, block_q), jnp.float32),  # running sum
            pltpu.VMEM((d, block_q), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qt, kt, vt)
    return jnp.swapaxes(out, 2, 3)


def _flash_kernel_dmajor_int8(q_ref, k_ref, v_ref, o_ref, q8_ref, sq_ref,
                              m_ref, l_ref, acc_ref, *, scale, kv_steps):
    """D-major flash attention with IN-KERNEL int8 QK quantisation.

    q/k arrive bf16; each tile is quantised in VMEM right before the MXU
    (q once per q-tile at ki==0, cached in int8 scratch; k per kv step).
    This replaces the former host-graph pre-pass (f32 casts, K centring,
    rounding, per-(b,h) scale reductions — ~6 full HBM passes and ~10 small
    ops per call, the `fusion f32[2,8]` swarm in the r4 trace) with a few
    VPU passes over data already resident in VMEM. Per-TILE symmetric
    scales are also strictly finer-grained than the old per-(b,h) global
    scales — outliers only cost their own tile resolution. V stays bf16 —
    probs quantisation is where accuracy actually goes."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        qf = q_ref[0, 0].astype(jnp.float32)  # [D, bq]
        s_q = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-12) / 127.0
        sq_ref[0] = s_q
        q8_ref[...] = jnp.round(qf * (1.0 / s_q)).astype(jnp.int8)

    kf = k_ref[0, 0].astype(jnp.float32)  # [D, bk]
    s_k = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-12) / 127.0
    k8 = jnp.round(kf * (1.0 / s_k)).astype(jnp.int8)

    s = jax.lax.dot_general(
        k8, q8_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (s_k * sq_ref[0] * scale)  # [bk, bq]

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=0, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:1])
    l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)

    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0, 0]  # [D, bk] bf16
    pv = jax.lax.dot_general(
        v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] = acc_ref[...] * alpha[:1] + pv

    @pl.when(ki == kv_steps - 1)
    def _store():
        l = l_ref[...][:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_self_attention_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Unmasked SDPA with int8 QK quantised per-tile IN the kernel,
    ``[B, H, S, D]`` in/out. fp32 softmax, bf16 PV. ~1% logit noise —
    comparable to the bf16 rounding the rest of the pipeline carries."""
    b, h, sq_len, d = q.shape
    sk_len = k.shape[2]
    block_q = pick_block(sq_len, block_q)
    block_k = pick_block(sk_len, block_k)
    assert sq_len % block_q == 0 and sk_len % block_k == 0, (
        sq_len, sk_len, block_q, block_k)
    kv_steps = sk_len // block_k

    qt, kt, vt = (jnp.swapaxes(x, 2, 3) for x in (q, k, v))  # [B, H, D, S]

    grid = (b, h, sq_len // block_q, kv_steps)
    kernel = functools.partial(
        _flash_kernel_dmajor_int8, scale=scale, kv_steps=kv_steps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, d, block_q), lambda b, h, qi, ki: (b, h, 0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d, block_k), lambda b, h, qi, ki: (b, h, 0, ki),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d, block_k), lambda b, h, qi, ki: (b, h, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d, block_q), lambda b, h, qi, ki: (b, h, 0, qi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((d, block_q), jnp.int8),      # quantised q tile
            pltpu.SMEM((1,), jnp.float32),           # q tile scale
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qt, kt, vt)
    return jnp.swapaxes(out, 2, 3)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Unmasked scaled-dot-product attention, ``[B, H, S, D]`` in and out."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = pick_block(sq, block_q)
    block_k = pick_block(sk, block_k)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    kv_steps = sk // block_k

    grid = (b, h, sq // block_q, kv_steps)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_steps=kv_steps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
