"""VAE image codecs: SD-1.5 AutoencoderKL and the tiny distilled TAESD.

The reference uses diffusers' ``AutoencoderKL`` (bf16) and swaps in
``AutoencoderTiny`` ("madebyollin/taesd") for speed
(/root/reference/live2diff/utils/wrapper.py:462-470,
pipeline_animatediff_depth.py:267). Both are rebuilt here channels-last
([B, H, W, C]) so encode/decode compile to fused XLA NHWC conv pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# AutoencoderKL (SD-1.5)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEResnetBlock(nn.Module):
    """GroupNorm -> silu -> conv, twice, residual; no time embedding."""

    out_channels: Optional[int] = None
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        def gn(name):
            return nn.GroupNorm(
                num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                param_dtype=self.param_dtype, name=name,
            )

        h = gn("norm1")(x).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = gn("norm2")(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="group_norm",
        )(x).astype(self.dtype)
        x = x.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q, k, v = dense("to_q")(x), dense("to_k")(x), dense("to_v")(x)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = dense("to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class VAEEncoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for l in range(cfg.layers_per_block):
                x = VAEResnetBlock(
                    out_channels=out_ch, groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}_resnets_{l}", **kw,
                )(x)
            if i < len(cfg.block_out_channels) - 1:
                # asymmetric (0,1) pad then stride-2 conv, matching torch's
                # Downsample2D(padding=0) + F.pad((0,1,0,1))
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    name=f"down_blocks_{i}_downsamplers_0_conv", **kw,
                )(x)
        # mid
        ch = cfg.block_out_channels[-1]
        x = VAEResnetBlock(out_channels=ch, groups=cfg.norm_num_groups,
                           name="mid_block_resnets_0", **kw)(x)
        x = VAEAttention(groups=cfg.norm_num_groups, name="mid_block_attentions_0", **kw)(x)
        x = VAEResnetBlock(out_channels=ch, groups=cfg.norm_num_groups,
                           name="mid_block_resnets_1", **kw)(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="conv_norm_out")(x).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out", **kw)(x)
        return x


class VAEDecoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, name="conv_in", **kw)(z)
        x = VAEResnetBlock(out_channels=ch, groups=cfg.norm_num_groups,
                           name="mid_block_resnets_0", **kw)(x)
        x = VAEAttention(groups=cfg.norm_num_groups, name="mid_block_attentions_0", **kw)(x)
        x = VAEResnetBlock(out_channels=ch, groups=cfg.norm_num_groups,
                           name="mid_block_resnets_1", **kw)(x)

        reversed_ch = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(reversed_ch):
            for l in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(
                    out_channels=out_ch, groups=cfg.norm_num_groups,
                    name=f"up_blocks_{i}_resnets_{l}", **kw,
                )(x)
            if i < len(reversed_ch) - 1:
                b, h, w, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(out_ch, (3, 3), padding=1,
                            name=f"up_blocks_{i}_upsamplers_0_conv", **kw)(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="conv_norm_out")(x).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(x)
        return x


class AutoencoderKL(nn.Module):
    """SD-1.5 KL autoencoder. encode() returns the latent mean (the reference's
    ``retrieve_latents`` with a seeded generator effectively samples; we expose
    both — the stream runtime uses ``sample=False`` + its own noise injection).
    """

    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(config=self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = VAEEncoder(**kw)
        self.decoder = VAEDecoder(**kw)
        conv_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), name="quant_conv", **conv_kw)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv", **conv_kw)

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))


# ---------------------------------------------------------------------------
# TAESD (tiny autoencoder)
# ---------------------------------------------------------------------------


class FusedConv3x3(nn.Module):
    """3x3 SAME conv with optionally fused bias/skip/ReLU.

    Parameter pytree is identical to ``nn.Conv`` (kernel [3,3,Cin,Cout] +
    bias [Cout]) so torch->flax checkpoint ingest is unchanged. On TPU at
    streaming resolutions it dispatches to the Pallas kernel
    (ops/conv.py) — XLA's own batch-1 64-channel conv schedule runs ~30x
    off the memory bound; elsewhere it falls back to lax.conv.
    """

    features: int
    relu: bool = False
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            self.param_dtype,
        ).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            ).astype(self.dtype)
        else:
            bias = jnp.zeros((self.features,), self.dtype)

        from ..ops.attention import _on_tpu

        if (
            _on_tpu()
            and self.features % 32 == 0
            and x.shape[1] * x.shape[2] >= 128 * 128
        ):
            from ..ops.conv import conv3x3_fused

            return conv3x3_fused(x, kernel, bias, skip=skip, relu=self.relu)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        out = out + bias.astype(jnp.float32)
        if skip is not None:
            out = out + skip.astype(jnp.float32)
        if self.relu:
            out = nn.relu(out)
        return out.astype(self.dtype)


class FusedConv3x3S2(nn.Module):
    """3x3 stride-2 SAME conv (TAESD encoder downsample), kernel-dispatched.

    Param pytree matches ``nn.Conv(use_bias=False)`` so checkpoint ingest is
    unchanged. Keeping the downsample inside the Pallas kernel family avoids
    the XLA<->kernel layout boundary (a relayout copy of the full-res
    activation) and XLA's slow small-batch 64-channel conv schedule.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            self.param_dtype,
        ).astype(self.dtype)

        from ..ops.attention import _on_tpu

        if (
            _on_tpu()
            and self.features % 32 == 0
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[1] * x.shape[2] >= 128 * 128
        ):
            from ..ops.conv import conv3x3_s2_fused

            return conv3x3_s2_fused(
                x, kernel, jnp.zeros((self.features,), self.dtype)
            )

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out.astype(self.dtype)


class TinyBlock(nn.Module):
    """conv-relu-conv-relu-conv + skip, fused relu (TAESD block)."""

    n_out: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = FusedConv3x3(self.n_out, relu=True, name="conv_0", **kw)(x)
        h = FusedConv3x3(self.n_out, relu=True, name="conv_2", **kw)(h)
        if x.shape[-1] != self.n_out:
            x = nn.Conv(self.n_out, (1, 1), use_bias=False, name="skip", **kw)(x)
        return FusedConv3x3(self.n_out, relu=True, name="conv_4", **kw)(h, skip=x)


class TinyEncoder(nn.Module):
    latent_channels: int = 4
    hidden: int = 64
    num_blocks: Tuple[int, ...] = (1, 3, 3, 3)  # blocks per stage
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        layer = 0
        x = FusedConv3x3(self.hidden, name=f"layers_{layer}", **kw)(x)
        layer += 1
        for stage, n in enumerate(self.num_blocks):
            if stage > 0:
                x = FusedConv3x3S2(self.hidden, name=f"layers_{layer}", **kw)(x)
                layer += 1
            for _ in range(n):
                x = TinyBlock(self.hidden, name=f"layers_{layer}", **kw)(x)
                layer += 1
        x = nn.Conv(self.latent_channels, (3, 3), padding=1, name=f"layers_{layer}", **kw)(x)
        return x


class TinyDecoder(nn.Module):
    hidden: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.tanh(z / 3.0) * 3.0  # Clamp()
        layer = 1  # slot 0 is the Clamp in the torch Sequential numbering
        x = nn.Conv(self.hidden, (3, 3), padding=1, name=f"layers_{layer}", **kw)(x)
        layer += 1
        x = nn.relu(x)
        layer += 1  # ReLU slot
        for stage in range(3):
            for _ in range(3):
                x = TinyBlock(self.hidden, name=f"layers_{layer}", **kw)(x)
                layer += 1
            # nn.Upsample slot
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            layer += 1
            x = FusedConv3x3(self.hidden, use_bias=False,
                             name=f"layers_{layer}", **kw)(x)
            layer += 1
        x = TinyBlock(self.hidden, name=f"layers_{layer}", **kw)(x)
        layer += 1
        x = nn.Conv(3, (3, 3), padding=1, name=f"layers_{layer}", **kw)(x)
        return x


class TinyAutoencoder(nn.Module):
    """TAESD ("madebyollin/taesd"): 4-channel SD-latent codec, ~1% of KL cost.

    scaling_factor is 1.0 (it consumes/produces SD latents pre-scaled by
    0.18215, like diffusers ``AutoencoderTiny``).
    """

    latent_channels: int = 4
    hidden: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    scaling_factor: float = 1.0

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = TinyEncoder(
            latent_channels=self.latent_channels, hidden=self.hidden, **kw
        )
        self.decoder = TinyDecoder(hidden=self.hidden, **kw)

    def encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        del rng  # deterministic codec
        return self.encoder(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))
