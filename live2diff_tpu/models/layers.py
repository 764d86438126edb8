"""Shared building blocks: time embeddings, positional encodings, feed-forward.

TPU-first conventions used throughout the model zoo:

* channels-last tensors — video activations are ``[B, F, H, W, C]`` so convs
  lower straight to XLA's NHWC path and the MXU;
* all shapes static; frame folding is a reshape, never a python loop;
* ``dtype`` (compute) and ``param_dtype`` are explicit; norms accumulate in
  float32 regardless of compute dtype.

Functional parity notes reference the layer semantics of
/root/reference/live2diff/animatediff/models/ (re-derived, not translated).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal diffusion-timestep features (diffusers ``Timesteps`` semantics).

    SD-1.5 uses flip_sin_to_cos=True, freq_shift=0
    (/root/reference/live2diff/animatediff/models/unet_depth_streaming.py:102).
    Computed in float32 for numerical fidelity at t≈1000.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting sinusoidal features to the UNet time channel."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1"
        )(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2"
        )(sample)
        return sample


def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """AnimateDiff temporal positional-encoding table ``[max_len, d_model]``.

    Interleaved sin/cos (even indices sin, odd cos), matching
    /root/reference/live2diff/animatediff/models/positional_encoding.py:12-17.
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    angles = position * div_term[None, :]
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : (d_model // 2)]))
    return pe.astype(dtype)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (diffusers ``FeedForward`` with activation_fn=geglu).

    Parameter names mirror the torch layout (net.0.proj, net.2) to keep the
    checkpoint converter mechanical.
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        proj = nn.Dense(
            inner * 2, dtype=self.dtype, param_dtype=self.param_dtype, name="net_0_proj"
        )(x)
        hidden, gate = jnp.split(proj, 2, axis=-1)
        x = hidden * nn.gelu(gate, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="net_2")(x)
        return x


class FusedGroupNorm(nn.Module):
    """GroupNorm over the trailing channel axis, fp32 statistics computed
    per leading-axis sample, with an optionally fused activation.

    Parameter pytree matches ``nn.GroupNorm`` (scale/bias of shape [C]) so
    checkpoint ingest is unchanged. On TPU this dispatches to the fused
    Pallas kernel (ops/norm.py); elsewhere it runs the same math in XLA.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: str = "none"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    site: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        from ..ops.norm import group_norm_act

        y = group_norm_act(
            x.reshape(x.shape[0], -1, c), scale, bias,
            groups=self.num_groups, eps=self.epsilon, act=self.act, site=self.site,
        )
        return y.reshape(x.shape).astype(self.dtype)


class FusedLayerNorm(nn.Module):
    """LayerNorm over the trailing axis with fp32 statistics (Pallas kernel
    on TPU). Parameter pytree matches ``nn.LayerNorm`` (scale/bias [C])."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    site: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        from ..ops.norm import layer_norm

        return layer_norm(x, scale, bias, eps=self.epsilon, site=self.site).astype(self.dtype)


def group_norm(
    num_groups: int = 32,
    epsilon: float = 1e-5,
    dtype: jnp.dtype = jnp.float32,
    param_dtype: jnp.dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.GroupNorm:
    """GroupNorm over the trailing channel axis with fp32 statistics."""
    return nn.GroupNorm(
        num_groups=num_groups,
        epsilon=epsilon,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "silu": nn.silu,
        "swish": nn.silu,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "gelu": nn.gelu,
        "relu": nn.relu,
    }[name]
