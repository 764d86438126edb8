"""Attention primitives.

Single entry point ``dot_product_attention`` in ``[..., S, H, D]`` layout so
the model code is kernel-agnostic. Three paths:

* small sequences: plain einsum + fp32 softmax (XLA fuses this fine);
* large sequences: blockwise online-softmax attention (lax.scan over KV
  chunks) — O(S·chunk) memory instead of O(S^2), runs on CPU and TPU. This
  is what keeps the 64x64-latent spatial self-attention (S=4096, and S_kv =
  8 frames x 4096 in warmup) inside HBM;
* TPU + large S: the Pallas flash-attention kernel (ops/flash_attention)
  can be enabled via ``use_flash``.

Replaces the reference's xformers / torch-SDPA / sliced-attention paths
(/root/reference/live2diff/animatediff/models/attention.py:465-560).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# materialised-logits budget above which the blockwise path kicks in
_MAX_DENSE_LOGITS = 1 << 24  # 16M logits (~64MB fp32)
_KV_CHUNK = 1024


def _dense_attention(q, k, v, bias, scale):
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def _blockwise_attention(q, k, v, bias, scale, chunk: int = _KV_CHUNK):
    """Online-softmax attention, scanning KV in chunks.

    q: [..., Sq, H, D]; k/v: [..., Sk, H, D]; bias broadcastable to
    [..., H, Sq, Sk]. fp32 accumulators; O(Sq * chunk) live logits.
    """
    sk = k.shape[-3]
    num_chunks = (sk + chunk - 1) // chunk
    pad = num_chunks * chunk - sk
    if pad:
        cfg = [(0, 0)] * k.ndim
        cfg[-3] = (0, pad)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
        if bias is not None:
            bcfg = [(0, 0)] * bias.ndim
            bcfg[-1] = (0, pad)
            bias = jnp.pad(bias, bcfg, constant_values=-jnp.inf)
        else:
            # mask out padded keys
            mask = jnp.arange(num_chunks * chunk) < sk
            bias = jnp.where(mask, 0.0, -jnp.inf)[None, None, :]

    # fold chunks into a leading scan axis: [..., C, chunk, H, D]
    def split_chunks(x):
        return jnp.moveaxis(
            x.reshape(*x.shape[:-3], num_chunks, chunk, *x.shape[-2:]), -4, 0
        )

    k_c = split_chunks(k)
    v_c = split_chunks(v)
    if bias is not None:
        bias = jnp.broadcast_to(
            bias, (*q.shape[:-3], q.shape[-2], q.shape[-3], k.shape[-3])
        )  # [..., H, Sq, Sk_padded]
        bias_c = jnp.moveaxis(
            bias.reshape(*bias.shape[:-1], num_chunks, chunk), -2, 0
        )  # [C, ..., H, Sq, chunk]
    else:
        bias_c = None

    q32 = q.astype(jnp.float32)
    acc_shape = (*q.shape[:-3], q.shape[-2], q.shape[-3], q.shape[-1])  # [..., H, Sq, D]
    m0 = jnp.full((*q.shape[:-3], q.shape[-2], q.shape[-3]), -jnp.inf, jnp.float32)
    l0 = jnp.zeros_like(m0)
    acc0 = jnp.zeros(acc_shape, jnp.float32)

    def body(carry, inputs):
        m, l, acc = carry
        if bias_c is not None:
            k_i, v_i, b_i = inputs
        else:
            (k_i, v_i), b_i = inputs, None
        s = jnp.einsum("...qhd,...khd->...hqk", q32, k_i.astype(jnp.float32)) * scale
        if b_i is not None:
            s = s + b_i.astype(jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "...hqk,...khd->...hqd", p, v_i.astype(jnp.float32)
        )
        return (m_new, l_new, acc_new), None

    xs = (k_c, v_c, bias_c) if bias_c is not None else (k_c, v_c)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [..., H, Sq, D]
    return jnp.swapaxes(out, -3, -2).astype(v.dtype)  # -> [..., Sq, H, D]


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: ``[..., Sq, H, D]``
      k, v: ``[..., Sk, H, D]``
      bias: additive attention bias broadcastable to ``[..., H, Sq, Sk]``
      scale: defaults to ``D**-0.5``

    Returns ``[..., Sq, H, D]`` in q's dtype; softmax in fp32.
    """
    dim = q.shape[-1]
    scale = dim**-0.5 if scale is None else scale

    batch = 1
    for s in q.shape[:-3]:
        batch *= s
    logits_size = batch * q.shape[-2] * q.shape[-3] * k.shape[-3]
    if logits_size <= _MAX_DENSE_LOGITS or k.shape[-3] <= _KV_CHUNK:
        return _dense_attention(q, k, v, bias, scale)
    return _blockwise_attention(q, k, v, bias, scale)
