"""Spatial transformer blocks (per-frame self- + text-cross-attention).

Parity target: ``Transformer3DModel`` / ``BasicTransformerBlock`` in
/root/reference/live2diff/animatediff/models/attention.py:29-270 — the
standard SD-1.5 spatial transformer applied framewise over the video axis.
Re-designed channels-last for TPU; attention runs through
ops.attention.dot_product_attention so the kernel can be swapped.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import FusedGroupNorm, FusedLayerNorm
from .resnet import fold_frames, unfold_frames


class CrossAttention(nn.Module):
    """Multi-head attention with optional cross-attention source.

    q/k/v projections carry no bias, the output projection does (diffusers
    ``Attention`` defaults, used for all spatial attention in SD-1.5).

    ``cross_frame`` selects the reference's ``SparseCausalAttention``
    behaviour (/root/reference/live2diff/animatediff/models/attention.py:
    563-622): KEYS are taken from each video's frame 0 while VALUES stay
    per-frame — the reference computes ``former_frame_index`` and a frame-0
    value gather but comments both out, so frame-0-keys/own-values is the
    observable semantics and is what we replicate. Requires ``video_length``
    at call time; with video_length == 1 (stream mode) it degenerates to
    ordinary self-attention.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    cross_frame: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        video_length: Optional[int] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        dense = lambda feats, name, use_bias: nn.Dense(  # noqa: E731
            feats, use_bias=use_bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        q = dense(inner, "to_q", False)(hidden_states)
        k = dense(inner, "to_k", False)(ctx)
        v = dense(inner, "to_v", False)(ctx)

        if self.cross_frame:
            if video_length is None:
                raise ValueError("cross_frame attention requires video_length")
            if video_length > 1:
                bf, d, c = k.shape
                k = k.reshape(bf // video_length, video_length, d, c)
                k = jnp.broadcast_to(k[:, :1], k.shape).reshape(bf, d, c)

        def split_heads(x):
            return x.reshape(*x.shape[:-1], self.heads, self.dim_head)

        out = dot_product_attention(split_heads(q), split_heads(k), split_heads(v), bias=bias)
        out = out.reshape(*out.shape[:-2], inner)
        return dense(self.query_dim, "to_out_0", True)(out)


class BasicTransformerBlock(nn.Module):
    """LayerNorm -> self-attn -> LayerNorm -> cross-attn -> LayerNorm -> GEGLU FF."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    cross_frame_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden_states: jnp.ndarray, encoder_hidden_states: jnp.ndarray,
        video_length: Optional[int] = None,
    ) -> jnp.ndarray:
        from .layers import GEGLUFeedForward

        def ln(name):
            return FusedLayerNorm(
                epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                site="spatial", name=name,
            )

        h = ln("norm1")(hidden_states)
        hidden_states = hidden_states + CrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            cross_frame=self.cross_frame_attention,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn1",
        )(h, video_length=video_length)

        h = ln("norm2")(hidden_states)
        hidden_states = hidden_states + CrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn2",
        )(h, encoder_hidden_states)

        h = ln("norm3")(hidden_states)
        hidden_states = hidden_states + GEGLUFeedForward(
            dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
        )(h)
        return hidden_states


class Transformer3DModel(nn.Module):
    """Spatial transformer applied framewise over ``[B, F, H, W, C]``.

    GroupNorm -> 1x1 conv proj_in -> transformer blocks over H*W tokens ->
    1x1 conv proj_out -> residual. (SD-1.5 uses conv projections:
    use_linear_projection=False.)
    """

    heads: int
    dim_head: int
    num_layers: int = 1
    cross_attention_dim: int = 768
    cross_frame_attention: bool = False
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden_states: jnp.ndarray, encoder_hidden_states: jnp.ndarray
    ) -> jnp.ndarray:
        b, f, height, width, channels = hidden_states.shape
        inner = self.heads * self.dim_head
        residual = hidden_states

        x, _ = fold_frames(hidden_states)  # [BF, H, W, C]
        x = FusedGroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6,
            dtype=self.dtype, param_dtype=self.param_dtype, site="attn_in", name="norm",
        )(x)
        x = nn.Conv(
            inner, kernel_size=(1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj_in",
        )(x)
        x = x.reshape(b * f, height * width, inner)

        # text context repeats per frame
        ctx = jnp.repeat(encoder_hidden_states, f, axis=0)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                cross_frame_attention=self.cross_frame_attention,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )(x, ctx, video_length=f)

        x = x.reshape(b * f, height, width, inner)
        x = nn.Conv(
            channels, kernel_size=(1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj_out",
        )(x)
        return unfold_frames(x, f) + residual
