"""Framewise ("inflated") conv blocks for the 3D UNet, channels-last.

Video activations are ``[B, F, H, W, C]``. All "3D" ops here are 2D ops
applied framewise — the frame axis folds into batch with a reshape, which on
TPU lowers to the standard NHWC conv path (MXU) with zero layout cost.
Functional parity target: /root/reference/live2diff/animatediff/models/resnet.py
(InflatedConv3d, InflatedGroupNorm, ResnetBlock3D, Up/Downsample3D,
MappingNetwork) — re-designed, not translated.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FusedGroupNorm, get_activation


def fold_frames(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """[B, F, H, W, C] -> ([B*F, H, W, C], F)."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c), f


def unfold_frames(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B*F, H, W, C] -> [B, F, H, W, C]."""
    bf, h, w, c = x.shape
    return x.reshape(bf // f, f, h, w, c)


class InflatedConv(nn.Module):
    """2D conv applied framewise over [B, F, H, W, C]."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x, f = fold_frames(x)
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        return unfold_frames(x, f)


class InflatedGroupNorm(nn.Module):
    """GroupNorm over channels, framewise (per-frame statistics), fp32 stats.

    Frames fold into batch before normalisation so statistics never mix
    across the video axis (matching per-frame 2D GroupNorm semantics).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: str = "none"  # optionally fused activation ("silu")
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        folded, f = fold_frames(x)
        out = FusedGroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            act=self.act,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            site="resnet",
            name="norm",
        )(folded)
        return unfold_frames(out, f)


class ResnetBlock3D(nn.Module):
    """Pre-norm residual block with time-embedding injection.

    norm1 -> silu -> conv1 -> (+ time proj) -> norm2 -> silu -> conv2 -> +skip.
    Parity: /root/reference/live2diff/animatediff/models/resnet.py:156-259
    (default time_embedding_norm, output_scale_factor=1).
    """

    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    non_linearity: str = "swish"
    time_embedding_norm: str = "default"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray]) -> jnp.ndarray:
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        act = get_activation(self.non_linearity)

        fuse_act = self.non_linearity in ("swish", "silu")
        h = InflatedGroupNorm(
            num_groups=self.groups, epsilon=self.eps, dtype=self.dtype,
            act="silu" if fuse_act else "none",
            param_dtype=self.param_dtype, name="norm1",
        )(x)
        if not fuse_act:
            h = act(h)
        h = InflatedConv(
            out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="conv1"
        )(h)

        if temb is not None:
            t_channels = out_channels * (2 if self.time_embedding_norm == "scale_shift" else 1)
            t = nn.Dense(
                t_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="time_emb_proj"
            )(act(temb))
            # temb is per batch row: [B, C] -> broadcast over F, H, W
            t = t[:, None, None, None, :]
            if self.time_embedding_norm == "default":
                h = h + t

        fuse_act2 = fuse_act and self.time_embedding_norm != "scale_shift"
        h = InflatedGroupNorm(
            num_groups=self.groups, epsilon=self.eps, dtype=self.dtype,
            act="silu" if fuse_act2 else "none",
            param_dtype=self.param_dtype, name="norm2",
        )(h)

        if temb is not None and self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(t, 2, axis=-1)
            h = h * (1 + scale) + shift

        if not fuse_act2:
            h = act(h)
        h = InflatedConv(
            out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="conv2"
        )(h)

        use_shortcut = (
            (in_channels != out_channels) if self.use_in_shortcut is None else self.use_in_shortcut
        )
        if use_shortcut:
            x = InflatedConv(
                out_channels, kernel_size=(1, 1), padding=0,
                dtype=self.dtype, param_dtype=self.param_dtype, name="conv_shortcut",
            )(x)

        return (x + h) / self.output_scale_factor


class Downsample3D(nn.Module):
    """Strided-conv 2x spatial downsample, framewise."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return InflatedConv(
            self.features, strides=(2, 2), padding=1,
            dtype=self.dtype, param_dtype=self.param_dtype, name="op",
        )(x)


class Upsample3D(nn.Module):
    """Nearest-neighbour 2x spatial upsample + conv, framewise."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, output_size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        th, tw = output_size if output_size is not None else (h * 2, w * 2)
        if th % h == 0 and tw % w == 0:
            # nearest upsample = repeat along H and W (exact, integer factor)
            x = jnp.repeat(jnp.repeat(x, th // h, axis=2), tw // w, axis=3)
        else:
            # odd skip dims (resolution not divisible by 64): legacy-nearest
            # indexing src = floor(dst * in/out), matching the reference's
            # F.interpolate(mode="nearest") upsample_size path
            # (unet_depth_streaming.py:588-591, resnet.py Upsample3D)
            rows = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
            cols = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
            x = x[:, :, rows][:, :, :, cols]
        return InflatedConv(
            self.features, dtype=self.dtype, param_dtype=self.param_dtype, name="conv"
        )(x)


class MappingNetwork(nn.Module):
    """ControlNet-style depth-conditioning encoder with zero-init output conv.

    Parity: /root/reference/live2diff/animatediff/models/resnet.py:17-54.
    All convs stride 1 (the depth latent is already at latent resolution).
    """

    embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jnp.ndarray) -> jnp.ndarray:
        x = InflatedConv(
            self.block_out_channels[0], dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv_in",
        )(conditioning)
        x = nn.silu(x)
        blk = 0
        for i in range(len(self.block_out_channels) - 1):
            ch_in, ch_out = self.block_out_channels[i], self.block_out_channels[i + 1]
            x = InflatedConv(
                ch_in, dtype=self.dtype, param_dtype=self.param_dtype, name=f"blocks_{blk}"
            )(x)
            x = nn.silu(x)
            blk += 1
            x = InflatedConv(
                ch_out, dtype=self.dtype, param_dtype=self.param_dtype, name=f"blocks_{blk}"
            )(x)
            x = nn.silu(x)
            blk += 1
        # zero-initialised so a freshly-built depth branch is a no-op
        x = InflatedConv(
            self.embedding_channels,
            zero_init=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_out",
        )(x)
        return x
