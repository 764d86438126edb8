"""Temporal motion modules: causal windowed attention over a streaming KV-cache.

This is the heart of the framework. Each motion module is a temporal
transformer whose self-attention runs along the frame axis in one of two
modes (one Flax module, a mode switch — the reference's parallel
streaming/warmup block files are an ONNX-export artifact, not semantics):

* ``warmup``: bidirectional attention over the 8 warmup frames; emits the
  PE-free K/V of those frames so the runtime can fill cache slots 0..7
  (parity: ``VersatileAttention``,
  /root/reference/live2diff/animatediff/models/motion_module.py:438-530).

* ``stream``: one new frame per denoising step; its K/V is written into the
  cache slot ``update_idx[step]``, and the query attends over the whole
  16-slot window under an additive visibility bias. Positional encoding is
  relative-ised: K/V are cached PE-free, and pre-projected PE rows
  (``pe @ W_{q,k,v}``) are gathered by ``pe_idx`` at attention time
  (parity: ``StreamTemporalAttention``,
  /root/reference/live2diff/animatediff/models/stream_motion_module.py:9-213).

Cache geometry: one array per attention layer, ``[steps, 2, window, HW, C]``
(2 = K and V; window-major so a slot write is one contiguous slab). Updates
are ``dynamic_update_slice`` on donated buffers — no reallocation, no host
round-trip, everything inside one compiled step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention, stream_window_attention
from .layers import FusedGroupNorm, FusedLayerNorm, GEGLUFeedForward, sinusoidal_table

# [steps, 2, window, C, HW] bf16 (window-major, positions on lanes), or — in
# int8 cache mode — a (data int8 [steps,2,window,C,HW], scales f32
# [steps,2,window,C]) tuple with symmetric per-(slot, CHANNEL) quantisation
# (absmax over spatial positions only — one outlier channel cannot collapse
# its neighbours' resolution; the kernel folds K scales into its head-mask
# matmul so the granularity is dequantisation-free).
# int8 halves both cache HBM capacity (3.0 GB/session at 512x512 -> 1.5 GB)
# and the stream-attention kernel's cache read bandwidth.
KVCache = Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]


def _quantize_kv(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantisation with per-channel scales.

    x: [..., C]; ``axes`` are the (spatial) axes to reduce the absmax over.
    Returns (int8 values, f32 scales with the reduced axes dropped).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    expand = scale
    for a in sorted(axes):
        expand = jnp.expand_dims(expand, a)
    q = jnp.clip(jnp.round(xf / expand), -127, 127).astype(jnp.int8)
    return q, scale


def write_kv_stream(
    cache: KVCache, k: jnp.ndarray, v: jnp.ndarray, update_idx: jnp.ndarray,
    heads: int = 8,
) -> KVCache:
    """Scatter the new frame's K/V into per-step cache slots.

    cache: [steps, 2, window, C, HW]; k, v: [steps, HW, C];
    update_idx: [steps] int32. Only the few-MB update is transposed into the
    cache's positions-on-lanes layout. The per-step dynamic_update_slice
    loop is unrolled (steps is 2..4) — vmap'ing it makes XLA emit a
    layout-normalising copy of the whole cache, the unrolled form updates in
    place under donation.

    In int8 cache mode K/V are quantised per (step, head) on write and the
    matching scale rows are scattered into the scale array.
    """
    if isinstance(cache, tuple):
        data, scales = cache
        steps = data.shape[0]
        k8, ks = _quantize_kv(k, (1,))  # [steps,HW,C] -> scales [steps,C]
        v8, vs = _quantize_kv(v, (1,))
        kv = jnp.stack([k8, v8], axis=1)  # [steps, 2, HW, C] int8
        kv = jnp.swapaxes(kv, -1, -2)  # [steps, 2, C, HW]
        sc = jnp.stack([ks, vs], axis=1)  # [steps, 2, C] f32
        for i in range(steps):
            data = jax.lax.dynamic_update_slice(
                data, kv[i : i + 1, :, None], (i, 0, update_idx[i], 0, 0)
            )
            scales = jax.lax.dynamic_update_slice(
                scales, sc[i : i + 1, :, None], (i, 0, update_idx[i], 0)
            )
        return (data, scales)

    steps = cache.shape[0]
    kv = jnp.stack([k, v], axis=1).astype(cache.dtype)  # [steps, 2, HW, C]
    kv = jnp.swapaxes(kv, -1, -2)  # [steps, 2, C, HW]
    for i in range(steps):
        cache = jax.lax.dynamic_update_slice(
            cache, kv[i : i + 1, :, None], (i, 0, update_idx[i], 0, 0)
        )
    return cache


def write_kv_warmup(
    cache: KVCache, k: jnp.ndarray, v: jnp.ndarray, step_idx, heads: int = 8
) -> KVCache:
    """Fill cache slots 0..F-1 of denoising-step row ``step_idx`` with warmup K/V.

    k, v: [HW, F, C] (F = number of warmup frames).
    """
    if isinstance(cache, tuple):
        data, scales = cache
        k8, ks = _quantize_kv(k, (0,))  # [HW,F,C] -> scales [F,C]
        v8, vs = _quantize_kv(v, (0,))
        kv = jnp.stack([k8, v8], axis=0)  # [2, HW, F, C]
        kv = jnp.transpose(kv, (0, 2, 3, 1))[None]  # [1, 2, F, C, HW]
        sc = jnp.stack([ks, vs], axis=0)[None]  # [1, 2, F, C]
        data = jax.lax.dynamic_update_slice(data, kv, (step_idx, 0, 0, 0, 0))
        scales = jax.lax.dynamic_update_slice(scales, sc, (step_idx, 0, 0, 0))
        return (data, scales)
    kv = jnp.stack([k, v], axis=0)  # [2, HW, F, C]
    kv = jnp.transpose(kv, (0, 2, 3, 1))[None]  # [1, 2, F, C, HW]
    return jax.lax.dynamic_update_slice(
        cache, kv.astype(cache.dtype), (step_idx, 0, 0, 0, 0)
    )


class TemporalAttention(nn.Module):
    """Temporal self-attention with dual warmup/stream behaviour."""

    query_dim: int
    heads: int = 8
    pe_max_len: int = 24
    window_size: int = 16
    sink_size: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, HW, F, C] (tokens along frame axis)
        kv_cache: Optional[KVCache],
        mode: str,
        attn_bias: Optional[jnp.ndarray] = None,  # [steps, window]
        pe_idx: Optional[jnp.ndarray] = None,  # [steps, window]
        update_idx: Optional[jnp.ndarray] = None,  # [steps]
        warmup_step_idx=None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        b, hw, f, c = hidden_states.shape
        inner = self.query_dim
        heads = self.heads
        dim_head = inner // heads

        dense = lambda name: nn.Dense(  # noqa: E731
            inner, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        to_q, to_k, to_v = dense("to_q"), dense("to_k"), dense("to_v")

        q = to_q(hidden_states)
        k = to_k(hidden_states)
        v = to_v(hidden_states)

        # pre-projected positional encodings (PE stays out of the cache).
        # NOTE: measured A/B (trace r4) — riding the PE rows on the token
        # gemm via concat LOSES ~2.5 ms/frame: the concat/slice forces
        # materialisation + reshapes that break XLA's fusions, costing far
        # more than these 16-row matmuls' weight re-reads. Keep them separate.
        pe = sinusoidal_table(self.pe_max_len, c, dtype=self.dtype)[: self.window_size]
        pe_q, pe_k, pe_v = to_q(pe), to_k(pe), to_v(pe)  # [window, C]

        def split_heads(x):
            return x.reshape(*x.shape[:-1], heads, dim_head)

        if mode == "clip":
            # training mode: plain bidirectional temporal attention over the
            # clip, no cache interaction (AnimateDiff-style motion training)
            q = q + pe_q[None, None, :f]
            k = k + pe_k[None, None, :f]
            v = v + pe_v[None, None, :f]
            out = dot_product_attention(split_heads(q), split_heads(k), split_heads(v))
            new_cache = kv_cache
        elif mode == "warmup":
            # cache the PE-free K/V of the warmup frames at slots 0..f-1
            cdt = kv_cache[0].dtype if isinstance(kv_cache, tuple) else kv_cache.dtype
            new_cache = write_kv_warmup(
                kv_cache,
                k[0] if isinstance(kv_cache, tuple) else k[0].astype(cdt),
                v[0] if isinstance(kv_cache, tuple) else v[0].astype(cdt),
                warmup_step_idx, heads=heads,
            )
            # bidirectional attention over the clip with absolute PE 0..f-1
            q = q + pe_q[None, None, :f]
            k = k + pe_k[None, None, :f]
            v = v + pe_v[None, None, :f]
            out = dot_product_attention(split_heads(q), split_heads(k), split_heads(v))
        elif mode == "stream":
            # f == 1: write this frame's K/V into its per-step slot
            assert f == 1, "stream mode processes one frame per denoising step"
            new_cache = write_kv_stream(kv_cache, k[:, :, 0], v[:, :, 0], update_idx, heads=heads)
            # gather PE rows: K/V by pe_idx, Q by its own slot's PE index
            k_pe = pe_k[pe_idx]  # [steps, window, C]
            v_pe = pe_v[pe_idx]
            q_pe_idx = jnp.take_along_axis(pe_idx, update_idx[:, None], axis=1)  # [steps, 1]
            q_pe = pe_q[q_pe_idx][:, 0]  # [steps, C]

            bias = attn_bias if attn_bias is not None else jnp.zeros(
                (q.shape[0], self.window_size), jnp.float32
            )
            out = stream_window_attention(
                q[:, :, 0], new_cache, q_pe, k_pe, v_pe, bias, heads,
            ).reshape(b, hw, 1, heads, dim_head)  # restore frame + head axes
        else:
            raise ValueError(f"unknown mode: {mode}")

        out = out.reshape(*out.shape[:-2], inner)
        out = nn.Dense(
            self.query_dim, use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype,
            name="to_out_0",
        )(out)
        return out, new_cache


class TemporalTransformerBlock(nn.Module):
    """Two temporal self-attentions + GEGLU feed-forward, all residual."""

    dim: int
    heads: int
    attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    pe_max_len: int = 24
    window_size: int = 16
    sink_size: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, HW, F, C]
        kv_caches: Sequence[KVCache],
        mode: str,
        attn_bias=None,
        pe_idx=None,
        update_idx=None,
        warmup_step_idx=None,
    ) -> Tuple[jnp.ndarray, Tuple[KVCache, ...]]:
        new_caches = []
        for i, _block_type in enumerate(self.attention_block_types):
            h = FusedLayerNorm(
                epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                site="temporal", name=f"norms_{i}",
            )(hidden_states)
            attn_out, new_cache = TemporalAttention(
                query_dim=self.dim, heads=self.heads, pe_max_len=self.pe_max_len,
                window_size=self.window_size, sink_size=self.sink_size,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"attention_blocks_{i}",
            )(h, kv_caches[i], mode, attn_bias, pe_idx, update_idx, warmup_step_idx)
            hidden_states = hidden_states + attn_out
            new_caches.append(new_cache)

        h = FusedLayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            site="temporal", name="ff_norm",
        )(hidden_states)
        hidden_states = hidden_states + GEGLUFeedForward(
            dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
        )(h)
        return hidden_states, tuple(new_caches)


class TemporalTransformer3DModel(nn.Module):
    """GroupNorm -> linear proj_in -> temporal blocks -> zero-init proj_out + residual.

    Input/output ``[B, F, H, W, C]``. The temporal axis is attention's
    sequence axis; spatial positions fold into the batch.
    """

    heads: int = 8
    num_layers: int = 1
    attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    norm_num_groups: int = 32
    pe_max_len: int = 24
    window_size: int = 16
    sink_size: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, F, H, W, C]
        kv_caches: Sequence[KVCache],
        mode: str,
        attn_bias=None,
        pe_idx=None,
        update_idx=None,
        warmup_step_idx=None,
    ) -> Tuple[jnp.ndarray, Tuple[KVCache, ...]]:
        b, f, height, width, channels = hidden_states.shape
        residual = hidden_states

        # per-frame GroupNorm statistics: fold frames into batch first
        x = FusedGroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6,
            dtype=self.dtype, param_dtype=self.param_dtype, site="motion_in", name="norm",
        )(hidden_states.reshape(b * f, height, width, channels))
        x = x.reshape(b, f, height, width, channels)
        x = nn.Dense(
            channels, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in"
        )(x)

        # [B, F, H, W, C] -> [B, HW, F, C]
        x = x.reshape(b, f, height * width, channels).transpose(0, 2, 1, 3)

        caches_per_block = len(self.attention_block_types)
        new_caches = []
        for i in range(self.num_layers):
            block_caches = kv_caches[i * caches_per_block : (i + 1) * caches_per_block]
            x, updated = TemporalTransformerBlock(
                dim=channels, heads=self.heads,
                attention_block_types=self.attention_block_types,
                pe_max_len=self.pe_max_len, window_size=self.window_size,
                sink_size=self.sink_size, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )(x, block_caches, mode, attn_bias, pe_idx, update_idx, warmup_step_idx)
            new_caches.extend(updated)

        x = x.transpose(0, 2, 1, 3).reshape(b, f, height, width, channels)
        x = nn.Dense(
            channels,
            kernel_init=nn.initializers.zeros,  # zero-init: fresh module is a no-op
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out",
        )(x)
        return x + residual, tuple(new_caches)


def num_caches_per_module(num_layers: int = 1, num_attention_blocks: int = 2) -> int:
    return num_layers * num_attention_blocks
