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

import os

from typing import Optional

import jax
import jax.numpy as jnp

# materialised-logits budget above which the blockwise path kicks in
_MAX_DENSE_LOGITS = 1 << 24  # 16M logits (~64MB fp32)
_KV_CHUNK = 1024
# sequence length from which the Pallas flash kernel takes over on TPU
_FLASH_MIN_SEQ = 1024

_BACKEND = None


def _on_tpu() -> bool:
    global _BACKEND
    if _BACKEND is None:
        try:
            _BACKEND = jax.default_backend()
        except Exception:
            _BACKEND = "cpu"
    return _BACKEND == "tpu"


def _dense_attention(q, k, v, bias, scale):
    # bf16 MXU matmul with fp32 accumulation (preferred_element_type), never
    # fp32 operands: fp32 matmuls run at 1/8 MXU rate on TPU
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    ) * scale
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

    qs = jnp.swapaxes(q, -3, -2)  # [..., H, Sq, D], kept in input dtype for the MXU
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
        s = jnp.einsum(
            "...hqd,...khd->...hqk", qs, k_i, preferred_element_type=jnp.float32
        ) * scale
        if b_i is not None:
            s = s + b_i.astype(jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "...hqk,...khd->...hqd", p.astype(v_i.dtype), v_i,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    xs = (k_c, v_c, bias_c) if bias_c is not None else (k_c, v_c)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [..., H, Sq, D]
    return jnp.swapaxes(out, -3, -2).astype(v.dtype)  # -> [..., Sq, H, D]


def stream_window_attention(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,
    pe_q: jnp.ndarray,
    pe_k: jnp.ndarray,
    pe_v: jnp.ndarray,
    bias: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Windowed temporal attention of one new frame over the streaming KV-cache.

    The reference adds gathered positional encodings onto the cached K/V
    before attending (/root/reference/live2diff/animatediff/models/
    stream_motion_module.py:117-141). Done literally, that materialises two
    PE-shifted copies of the entire cache every frame (~2x cache bytes of
    extra HBM traffic per layer). Here the PE terms are factored out:

        logits = q_full . k_cache  +  q_full . pe_k        (exact expansion)
        out    = p . v_cache       +  p . pe_v

    so the cache is read PE-free exactly once and the PE corrections are
    tiny [HW, d] x [d, window] MXU matmuls. On TPU the cache-sized terms run
    in the Pallas kernel (ops/stream_attention.py) — everything else stays
    plain XLA.

    Args:
      q: ``[steps, HW, C]`` current frame's queries (PE-free).
      kv_cache: ``[steps, 2, window, C, HW]`` updated cache (new K/V already
        written at ``update_idx``; positions-on-lanes layout).
      pe_q: ``[steps, C]`` query PE row (the slot's own PE).
      pe_k, pe_v: ``[steps, window, C]`` gathered K/V PE rows.
      bias: ``[steps, window]`` additive visibility bias.
      heads: number of attention heads (C = heads * dim_head).

    Returns ``[steps, HW, C]`` in q's dtype.
    """
    s, hw, c = q.shape
    quantized = isinstance(kv_cache, tuple)
    cache_data = kv_cache[0] if quantized else kv_cache
    window = cache_data.shape[2]
    dh = c // heads
    scale = dh**-0.5 if scale is None else scale
    dt = q.dtype

    q_full = (q + pe_q[:, None, :]).astype(dt)
    qh = q_full.reshape(s, hw, heads, dh)
    pkh = pe_k.astype(dt).reshape(s, window, heads, dh)

    # hw >= 128: below that the cache slab is tiny (the fp32 materialisation
    # the kernel exists to avoid costs ~10 MB) and the sub-128 lane extent
    # makes XLA wrap every kernel call in full-cache relayout copies.
    if _on_tpu() and hw % 128 == 0:
        from .stream_attention import (
            stream_window_attention_kernel,
            stream_window_attention_kernel_int8,
        )

        # PE logits: real MXU matmul, [s, window, heads, hw] fp32 (few MB)
        pe_logits = jnp.einsum(
            "sphd,swhd->swhp", qh, pkh, preferred_element_type=jnp.float32
        )
        extra = pe_logits * scale + bias.astype(jnp.float32)[:, :, None, None]
        if quantized:
            scales = kv_cache[1]  # [s, 2, window, C] f32 per-(slot, channel)
            k_scales_c = jnp.swapaxes(scales[:, 0], 1, 2)  # [s, C, window]
            v_scales_c = jnp.swapaxes(scales[:, 1], 1, 2)  # [s, C, window]
            out_t = stream_window_attention_kernel_int8(
                jnp.swapaxes(q_full, 1, 2),
                cache_data,
                extra,
                jnp.swapaxes(pe_v, 1, 2).astype(jnp.float32),  # [s, C, window]
                k_scales_c.astype(jnp.float32),
                v_scales_c.astype(jnp.float32),
                scale=float(scale),
                heads=heads,
            )
        else:
            out_t = stream_window_attention_kernel(
                jnp.swapaxes(q_full, 1, 2),
                cache_data,
                extra,
                jnp.swapaxes(pe_v, 1, 2).astype(jnp.float32),  # [s, C, window]
                scale=float(scale),
                heads=heads,
            )
        return jnp.swapaxes(out_t, 1, 2).astype(dt)

    pvh = pe_v.astype(dt).reshape(s, window, heads, dh)
    pe_logits = jnp.einsum("sphd,swhd->spwh", qh, pkh, preferred_element_type=jnp.float32)
    extra = pe_logits * scale + bias.astype(jnp.float32)[:, None, :, None]
    if quantized:
        scales = kv_cache[1].astype(jnp.float32)  # [s, 2, window, C]
        dq = cache_data.astype(jnp.float32) * scales[..., None]
        dq = dq.reshape(s, 2, window, heads, dh, hw)
        kch = dq[:, 0].astype(dt)
        vch = dq[:, 1].astype(dt)
    else:
        kch = cache_data[:, 0].astype(dt).reshape(s, window, heads, dh, hw)
        vch = cache_data[:, 1].astype(dt).reshape(s, window, heads, dh, hw)
    logits = jnp.einsum(
        "sphd,swhdp->spwh", qh, kch, preferred_element_type=jnp.float32
    )
    logits = logits * scale + extra
    probs = jax.nn.softmax(logits, axis=-2)
    out = jnp.einsum(
        "spwh,swhdp->sphd", probs.astype(dt), vch,
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum("spwh,swhd->sphd", probs.astype(dt), pvh,
                           preferred_element_type=jnp.float32)
    return out.astype(dt).reshape(s, hw, c)


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

    # TPU + big self-attention: Pallas flash kernel (O(S) HBM traffic, VMEM
    # online-softmax state). Covers the 64x64/32x32-latent spatial attention.
    if (
        _on_tpu()
        and bias is None
        and q.ndim == 4
        and q.shape[-3] == k.shape[-3]
        and k.shape[-3] >= _FLASH_MIN_SEQ
        # lane-aligned S: the flash variants pick divisor-aligned block sizes
        # (pick_block), so any 128-multiple sequence length is tileable
        and q.shape[-3] % 128 == 0
        and k.shape[-3] % 128 == 0
    ):
        from .flash_attention import (
            flash_self_attention,
            flash_self_attention_dmajor,
            flash_self_attention_int8,
        )

        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))  # [B, H, S, D]
        # D-major tiles + single KV pass: measured 0.995 ms vs 1.130 for the
        # S-major q512/k1024 original at [2,8,4096,40] — ~137 TF/s at the
        # padded-depth MXU roofline, so bf16 layout work can't win more; the
        # int8-QK variant (2x MXU rate on the padded matmul) is the next
        # rung. LIVE2DIFF_FLASH=dmajor|smajor|int8 selects (A/B knob);
        # bench.py serves int8.
        variant = os.environ.get("LIVE2DIFF_FLASH", "dmajor")
        if variant == "smajor":
            out = flash_self_attention(qt, kt, vt, scale=scale)
        elif variant == "int8":
            out = flash_self_attention_int8(
                qt, kt, vt, scale=scale, block_k=min(k.shape[-3], 4096)
            )
        else:
            out = flash_self_attention_dmajor(
                qt, kt, vt, scale=scale, block_k=min(k.shape[-3], 4096)
            )
        return jnp.swapaxes(out, 1, 2)

    batch = 1
    for s in q.shape[:-3]:
        batch *= s
    logits_size = batch * q.shape[-2] * q.shape[-3] * k.shape[-3]
    if logits_size <= _MAX_DENSE_LOGITS or k.shape[-3] <= _KV_CHUNK:
        return _dense_attention(q, k, v, bias, scale)
    return _blockwise_attention(q, k, v, bias, scale)
