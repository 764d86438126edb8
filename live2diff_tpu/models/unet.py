"""The inflated SD-1.5 UNet with depth conditioning and streaming motion modules.

One Flax module covers both the reference's ``UNet3DConditionStreamingModel``
and ``UNet3DConditionWarmupModel``
(/root/reference/live2diff/animatediff/models/unet_depth_streaming.py:35,
unet_depth_warmup.py:34): the architectures are identical, only the temporal
attention behaviour differs, so ``mode='warmup' | 'stream'`` switches it at
trace time — two compiled programs sharing one parameter pytree.

Layout: channels-last video ``[B, F, H, W, C]``. In stream mode B is the
denoising-step batch (stream batch, StreamDiffusion-style) and F == 1; in
warmup mode B == 1 and F == warmup frames.

KV-caches are a flat tuple, one ``[steps, 2, window, HW, C]`` array per
temporal attention layer (window-major so a slot write is one contiguous
slab and the Pallas stream-attention kernel can tile positions), threaded
functionally through the blocks and returned updated. The flat index order
is forward-traversal order (down blocks, then up blocks), matching the
reference's ``motion_module_idx`` assignment (unet_depth_streaming.py:252-281;
the reference's geometry is [steps, 2, HW, window, C] — same contents,
transposed for TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import Transformer3DModel
from .layers import TimestepEmbedding, timestep_embedding
from .motion import TemporalTransformer3DModel
from .resnet import Downsample3D, InflatedConv, InflatedGroupNorm, MappingNetwork, ResnetBlock3D, Upsample3D


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture config (SD-1.5 defaults + Live2Diff motion setup)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "DownBlock3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 8  # number of heads for spatial attention (SD-1.5 naming)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cond_mapping: bool = True  # depth conditioning branch
    # motion module setup (configs/base_config.yaml:14-28 in the reference)
    use_motion_module: bool = True
    motion_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    motion_num_attention_heads: int = 8
    motion_num_transformer_block: int = 1
    motion_attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    motion_pe_max_len: int = 24
    window_size: int = 16
    sink_size: int = 8
    # SparseCausalAttention (ref attention.py:563-622): spatial self-attn
    # keys from frame 0 (values per-frame). Off in every shipped ref config.
    unet_use_cross_frame_attention: bool = False

    @property
    def caches_per_module(self) -> int:
        return self.motion_num_transformer_block * len(self.motion_attention_block_types)

    def motion_module_layout(self) -> Tuple[Tuple[int, int], ...]:
        """(channels, resolution_divisor) of every motion module, traversal order."""
        layout = []
        for i in range(len(self.block_out_channels)):
            res = 2**i
            if self.use_motion_module and res in self.motion_module_resolutions:
                for _ in range(self.layers_per_block):
                    layout.append((self.block_out_channels[i], res))
        # mid block: no motion module (motion_module_mid_block=False)
        rev = list(reversed(self.block_out_channels))
        for i in range(len(self.block_out_channels)):
            res = 2 ** (len(self.block_out_channels) - 1 - i)
            if self.use_motion_module and res in self.motion_module_resolutions:
                for _ in range(self.layers_per_block + 1):
                    layout.append((rev[i], res))
        return tuple(layout)

    def num_caches(self) -> int:
        return len(self.motion_module_layout()) * self.caches_per_module

    def cache_shapes(
        self, latent_height: int, latent_width: int, num_steps: int
    ) -> Tuple[Tuple[int, ...], ...]:
        """Shape of each KV-cache array, flat traversal order.

        ``[steps, 2, window, C, HW]``: window-major (a slot write is one
        contiguous slab), spatial positions on lanes. This is exactly the
        layout the Pallas stream-attention kernel tiles over, so the default
        major-to-minor layout needs no pinning and no relayout copies; the
        per-frame K/V updates (a few MB) are transposed into it instead of
        the multi-GB cache. The kernel separates heads internally with a
        block-diagonal mask matmul.
        """
        # per-level spatial dims follow the UNet's stride-2 SAME convs
        # (ceil-halving), NOT integer division by 2**level — they differ once
        # an intermediate dim is odd (any resolution not divisible by 64)
        dims = {1: (latent_height, latent_width)}
        res = 1
        for _ in range(len(self.block_out_channels) - 1):
            h, w = dims[res]
            res *= 2
            dims[res] = (-(-h // 2), -(-w // 2))
        shapes = []
        for channels, res in self.motion_module_layout():
            h, w = dims[res]
            for _ in range(self.caches_per_module):
                shapes.append((num_steps, 2, self.window_size, channels, h * w))
        return tuple(shapes)

    def init_caches(
        self, latent_height: int, latent_width: int, num_steps: int, dtype=jnp.bfloat16
    ):
        """Zeroed KV-caches; ``dtype=jnp.int8`` selects the quantised cache
        layout (per-layer ``(int8 data, f32 per-(slot, CHANNEL) scales)``
        pairs — half the HBM capacity and stream-attention read bandwidth).

        Per-channel granularity (r5; was per-(slot, head)): the absmax is
        reduced over spatial positions only, so one outlier channel no
        longer collapses the resolution of its whole head — the published
        failure mode of int8 KV on real SD weights. The kernel folds the
        K scales into its head-mask matmul operand, so the finer
        granularity is dequantisation-free (ops/stream_attention.py)."""
        shapes = self.cache_shapes(latent_height, latent_width, num_steps)
        if dtype == jnp.int8:
            return tuple(
                (
                    jnp.zeros(s, dtype=jnp.int8),
                    jnp.ones((s[0], 2, s[2], s[3]), jnp.float32),
                )
                for s in shapes
            )
        return tuple(jnp.zeros(s, dtype=dtype) for s in shapes)

    # Reference config keys we accept but do not need to act on, because our
    # architecture fixes the only behavior the reference ever ships
    # (/root/reference/configs/base_config.yaml:8-28). Values are the sole
    # supported setting; anything else raises.
    _FIXED_KEYS = {
        "use_inflated_groupnorm": (True,),        # framewise GN is the only mode
        "unet_use_temporal_attention": (False,),  # never enabled in any ref config
        "motion_module_type": ("Streaming", "Vanilla"),  # one dual-mode module here
        "temporal_attention_dim_div": (1,),
        "temporal_position_encoding": (True,),
        "zero_initialize": (True,),               # proj_out zero-init is built in
        "attention_class_name": ("stream", "versatile"),
    }

    @classmethod
    def _check_keys(cls, section: str, d: dict, known: set) -> None:
        unknown = [k for k in d if k not in known and k not in cls._FIXED_KEYS]
        if unknown:
            raise ValueError(
                f"unknown {section} key(s) {unknown}: not part of the supported "
                f"reference config surface (base_config.yaml); known keys: "
                f"{sorted(known | set(cls._FIXED_KEYS))}"
            )
        for k, allowed in cls._FIXED_KEYS.items():
            if k in d and d[k] not in allowed:
                raise ValueError(
                    f"{section}.{k}={d[k]!r} is unsupported (supported: {allowed})."
                )

    @classmethod
    def from_reference_config(cls, cfg: dict, **overrides) -> "UNetConfig":
        """Build from a reference-style ``unet_additional_kwargs`` dict.

        Unknown keys raise (a typo'd config must fail loudly, not silently
        drop the option); recognised-but-fixed keys raise only when set to a
        value this framework does not implement.
        """
        ua = cfg.get("unet_additional_kwargs", cfg) or {}
        mm = ua.get("motion_module_kwargs", {}) or {}
        ak = mm.get("attention_kwargs", {}) or {}
        if "unet_additional_kwargs" in cfg:  # reference-shaped config: validate
            cls._check_keys("unet_additional_kwargs", ua, {
                "cond_mapping", "use_motion_module", "motion_module_resolutions",
                "motion_module_kwargs", "unet_use_cross_frame_attention",
            })
            cls._check_keys("motion_module_kwargs", mm, {
                "num_attention_heads", "num_transformer_block",
                "attention_block_types", "temporal_position_encoding_max_len",
                "attention_kwargs",
            })
            cls._check_keys("attention_kwargs", ak, {"window_size", "sink_size"})
        kw = dict(
            cond_mapping=ua.get("cond_mapping", True),
            use_motion_module=ua.get("use_motion_module", True),
            motion_module_resolutions=tuple(ua.get("motion_module_resolutions", (1, 2, 4, 8))),
            motion_num_attention_heads=mm.get("num_attention_heads", 8),
            motion_num_transformer_block=mm.get("num_transformer_block", 1),
            motion_attention_block_types=tuple(
                mm.get("attention_block_types", ("Temporal_Self", "Temporal_Self"))
            ),
            motion_pe_max_len=mm.get("temporal_position_encoding_max_len", 24),
            window_size=ak.get("window_size", 16),
            sink_size=ak.get("sink_size", 8),
            unet_use_cross_frame_attention=bool(
                ua.get("unet_use_cross_frame_attention") or False
            ),
        )
        kw.update(overrides)
        return cls(**kw)


class UNet3DConditionModel(nn.Module):
    """Depth-conditioned inflated UNet with streaming temporal attention."""

    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _motion_module(self, channels: int, name: str) -> TemporalTransformer3DModel:
        cfg = self.config
        return TemporalTransformer3DModel(
            heads=cfg.motion_num_attention_heads,
            num_layers=cfg.motion_num_transformer_block,
            attention_block_types=cfg.motion_attention_block_types,
            norm_num_groups=cfg.norm_num_groups,
            pe_max_len=cfg.motion_pe_max_len,
            window_size=cfg.window_size,
            sink_size=cfg.sink_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    def _spatial_transformer(self, channels: int, name: str) -> Transformer3DModel:
        cfg = self.config
        return Transformer3DModel(
            heads=cfg.attention_head_dim,
            dim_head=channels // cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            cross_frame_attention=cfg.unet_use_cross_frame_attention,
            norm_num_groups=cfg.norm_num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, h, w, 4]
        timesteps: jnp.ndarray,  # [B] int32
        encoder_hidden_states: jnp.ndarray,  # [B, 77, 768]
        depth_sample: Optional[jnp.ndarray],  # [B, F, h, w, 4]
        kv_caches: Sequence[jnp.ndarray],
        mode: str = "stream",
        attn_bias: Optional[jnp.ndarray] = None,
        pe_idx: Optional[jnp.ndarray] = None,
        update_idx: Optional[jnp.ndarray] = None,
        warmup_step_idx=None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        # --- time embedding ---
        t_emb = timestep_embedding(timesteps, ch0)  # fp32
        emb = TimestepEmbedding(
            time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))

        # --- input convs ---
        sample = InflatedConv(
            ch0, dtype=self.dtype, param_dtype=self.param_dtype, name="conv_in"
        )(sample)
        if cfg.cond_mapping and depth_sample is not None:
            depth_emb = MappingNetwork(
                embedding_channels=ch0, dtype=self.dtype, param_dtype=self.param_dtype,
                name="flow_conv_in",
            )(depth_sample)
            sample = sample + depth_emb

        new_caches = list(kv_caches)
        cache_cursor = 0
        cpm = cfg.caches_per_module

        def run_motion(x, mm):
            nonlocal cache_cursor
            block_caches = new_caches[cache_cursor : cache_cursor + cpm]
            x, updated = mm(
                x, block_caches, mode, attn_bias, pe_idx, update_idx, warmup_step_idx
            )
            new_caches[cache_cursor : cache_cursor + cpm] = list(updated)
            cache_cursor += cpm
            return x

        # --- down blocks ---
        res_stack = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            res = 2**i
            has_attn = block_type == "CrossAttnDownBlock3D"
            has_motion = cfg.use_motion_module and res in cfg.motion_module_resolutions
            for l in range(cfg.layers_per_block):
                sample = ResnetBlock3D(
                    out_channels=out_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"down_blocks_{i}_resnets_{l}",
                )(sample, emb)
                if has_attn:
                    sample = self._spatial_transformer(
                        out_ch, f"down_blocks_{i}_attentions_{l}"
                    )(sample, encoder_hidden_states)
                if has_motion:
                    sample = run_motion(
                        sample, self._motion_module(out_ch, f"down_blocks_{i}_motion_modules_{l}")
                    )
                res_stack.append(sample)
            if i < len(cfg.down_block_types) - 1:
                sample = Downsample3D(
                    out_ch, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"down_blocks_{i}_downsamplers_0",
                )(sample)
                res_stack.append(sample)

        # --- mid block ---
        mid_ch = cfg.block_out_channels[-1]
        sample = ResnetBlock3D(
            out_channels=mid_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block_resnets_0",
        )(sample, emb)
        sample = self._spatial_transformer(mid_ch, "mid_block_attentions_0")(
            sample, encoder_hidden_states
        )
        sample = ResnetBlock3D(
            out_channels=mid_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block_resnets_1",
        )(sample, emb)

        # --- up blocks ---
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = list(reversed(cfg.block_out_channels))[i]
            res = 2 ** (len(cfg.block_out_channels) - 1 - i)
            has_attn = block_type == "CrossAttnUpBlock3D"
            has_motion = cfg.use_motion_module and res in cfg.motion_module_resolutions
            for l in range(cfg.layers_per_block + 1):
                skip = res_stack.pop()
                sample = jnp.concatenate([sample, skip], axis=-1)
                sample = ResnetBlock3D(
                    out_channels=out_ch, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"up_blocks_{i}_resnets_{l}",
                )(sample, emb)
                if has_attn:
                    sample = self._spatial_transformer(
                        out_ch, f"up_blocks_{i}_attentions_{l}"
                    )(sample, encoder_hidden_states)
                if has_motion:
                    sample = run_motion(
                        sample, self._motion_module(out_ch, f"up_blocks_{i}_motion_modules_{l}")
                    )
            if i < len(cfg.up_block_types) - 1:
                # upsample to the NEXT skip's spatial dims (differs from 2x
                # when an intermediate dim is odd; ref forward_upsample_size,
                # unet_depth_streaming.py:588-591)
                sample = Upsample3D(
                    out_ch, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"up_blocks_{i}_upsamplers_0",
                )(sample, output_size=res_stack[-1].shape[2:4])

        assert cache_cursor == len(new_caches), (
            f"cache threading mismatch: used {cache_cursor} of {len(new_caches)}"
        )

        # --- output head ---
        sample = InflatedGroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, act="silu",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv_norm_out",
        )(sample)
        sample = InflatedConv(
            cfg.out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="conv_out"
        )(sample)
        return sample, tuple(new_caches)
