"""Load the reference's model code against a minimal diffusers shim.

The reference implementation (/root/reference/live2diff/animatediff/models/)
is pure torch + einops except for light diffusers scaffolding (ConfigMixin,
ModelMixin, FeedForward, Attention, Timesteps, ...). This package provides
just-enough implementations of those names so the reference's streaming and
warmup UNets can run on CPU — which lets tests/test_ref_parity.py check this
framework's numerics against the *actual* reference code with shared
weights, instead of only against our own re-derivation.

Nothing here ships in the framework; it is test scaffolding only. The shim
classes are written from the public diffusers API semantics (v0.25-era,
what the reference pins), not copied from either codebase.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REFERENCE_MODELS_DIR = "/root/reference/live2diff/animatediff/models"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_MODELS_DIR)


def install_diffusers_shim() -> None:
    """Register minimal 'diffusers' modules in sys.modules (idempotent)."""
    if "diffusers" in sys.modules and getattr(
        sys.modules["diffusers"], "__live2diff_tpu_shim__", False
    ):
        return
    if "diffusers" in sys.modules:  # a real diffusers install: use it
        return

    import math

    import torch
    import torch.nn.functional as F
    from torch import nn

    # -- configuration_utils ------------------------------------------------
    class _Config(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(name) from e

    class ConfigMixin:
        @property
        def config(self):
            return _Config(getattr(self, "_internal_dict", {}))

    def register_to_config(init):
        import functools
        import inspect

        sig = inspect.signature(init)

        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            init(self, *args, **kwargs)
            self._internal_dict = cfg

        return wrapper

    # -- models.modeling_utils ---------------------------------------------
    class ModelMixin(nn.Module):
        @property
        def dtype(self):
            return next(self.parameters()).dtype

        @property
        def device(self):
            return next(self.parameters()).device

    # -- models.attention ---------------------------------------------------
    class Attention(nn.Module):
        """Multi-head attention, diffusers parameter layout
        (to_q/to_k/to_v bias-optional, to_out = [Linear, Dropout])."""

        def __init__(
            self,
            query_dim,
            cross_attention_dim=None,
            heads=8,
            dim_head=64,
            dropout=0.0,
            bias=False,
            upcast_attention=False,
            **_unused,
        ):
            super().__init__()
            inner = heads * dim_head
            kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
            self.heads = heads
            self.scale = dim_head**-0.5
            self.upcast_attention = upcast_attention
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(kv_dim, inner, bias=bias)
            self.to_v = nn.Linear(kv_dim, inner, bias=bias)
            self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(dropout)])

        def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None, **_):
            ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
            q, k, v = self.to_q(hidden_states), self.to_k(ctx), self.to_v(ctx)
            b, n, _ = q.shape
            h = self.heads

            def split(x):
                return x.reshape(x.shape[0], x.shape[1], h, -1).transpose(1, 2)

            out = F.scaled_dot_product_attention(
                split(q), split(k), split(v), attn_mask=attention_mask
            )
            out = out.transpose(1, 2).reshape(b, n, -1)
            return self.to_out[1](self.to_out[0](out))

    class GEGLU(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2)

        def forward(self, x):
            hidden, gate = self.proj(x).chunk(2, dim=-1)
            return hidden * F.gelu(gate)

    class FeedForward(nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0, activation_fn="geglu", **_):
            super().__init__()
            if activation_fn != "geglu":  # the reference only ever uses geglu
                raise NotImplementedError(f"shim FeedForward: {activation_fn}")
            inner = int(dim * mult)
            self.net = nn.ModuleList(
                [GEGLU(dim, inner), nn.Dropout(dropout), nn.Linear(inner, dim_out or dim)]
            )

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class AdaLayerNorm(nn.Module):  # never constructed for SD-1.5 configs
        def __init__(self, *a, **k):
            raise NotImplementedError("shim AdaLayerNorm should never be constructed")

    # -- models.embeddings ---------------------------------------------------
    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift

        def forward(self, timesteps):
            half = self.num_channels // 2
            exponent = -math.log(10000.0) * torch.arange(
                half, dtype=torch.float32, device=timesteps.device
            )
            exponent = exponent / (half - self.downscale_freq_shift)
            emb = timesteps[:, None].float() * exponent.exp()[None, :]
            emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
            if self.flip_sin_to_cos:
                emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
            if self.num_channels % 2 == 1:
                emb = F.pad(emb, (0, 1))
            return emb

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu", out_dim=None, **_):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

        def forward(self, sample):
            return self.linear_2(self.act(self.linear_1(sample)))

    # -- schedulers (diffusers 0.25.0 LCMScheduler semantics) ----------------
    # Written from the public diffusers 0.25.0 API/behaviour (the version the
    # reference pins, setup.py:5): betas -> alphas_cumprod, the LCM
    # inference-timestep selection of set_timesteps, and the consistency
    # boundary scalings. Independent of live2diff_tpu.schedule on purpose —
    # this is the torch-side oracle our numpy re-derivation is tested against.
    class LCMScheduler:
        def __init__(
            self,
            num_train_timesteps=1000,
            beta_start=0.0001,
            beta_end=0.02,
            beta_schedule="linear",
            trained_betas=None,
            original_inference_steps=50,
            timestep_scaling=10.0,
            **unused_config,
        ):
            if trained_betas is not None:
                self.betas = torch.tensor(trained_betas, dtype=torch.float64)
            elif beta_schedule == "linear":
                self.betas = torch.linspace(
                    beta_start, beta_end, num_train_timesteps, dtype=torch.float64
                )
            elif beta_schedule == "scaled_linear":
                self.betas = (
                    torch.linspace(
                        beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=torch.float64,
                    )
                    ** 2
                )
            else:
                raise NotImplementedError(f"shim LCMScheduler: {beta_schedule}")
            self.alphas = 1.0 - self.betas
            self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
            self.num_train_timesteps = num_train_timesteps
            self.original_inference_steps = original_inference_steps
            self.timestep_scaling = timestep_scaling
            self.sigma_data = 0.5
            self.timesteps = None
            self._cfg = dict(
                num_train_timesteps=num_train_timesteps,
                beta_start=beta_start,
                beta_end=beta_end,
                beta_schedule=beta_schedule,
                trained_betas=trained_betas,
                original_inference_steps=original_inference_steps,
                timestep_scaling=timestep_scaling,
            )

        @property
        def config(self):
            return _Config(self._cfg)

        @classmethod
        def from_config(cls, config, **kwargs):
            known = (
                "num_train_timesteps", "beta_start", "beta_end", "beta_schedule",
                "trained_betas", "original_inference_steps", "timestep_scaling",
            )
            cfg = {k: config[k] for k in known if k in config}
            cfg.update(kwargs)
            return cls(**cfg)

        def set_timesteps(self, num_inference_steps, device=None, strength=1.0):
            import numpy as _np

            original_steps = self.original_inference_steps
            k = self.num_train_timesteps // original_steps
            lcm_origin_timesteps = (
                _np.asarray(list(range(1, int(original_steps * strength) + 1))) * k - 1
            )
            lcm_origin_timesteps = lcm_origin_timesteps[::-1].copy()
            inference_indices = _np.linspace(
                0, len(lcm_origin_timesteps), num=num_inference_steps, endpoint=False
            )
            inference_indices = _np.floor(inference_indices).astype(_np.int64)
            timesteps = lcm_origin_timesteps[inference_indices]
            self.timesteps = torch.from_numpy(timesteps).to(
                device=device, dtype=torch.long
            )

        def get_scalings_for_boundary_condition_discrete(self, timestep):
            scaled_t = timestep * self.timestep_scaling
            c_skip = self.sigma_data**2 / (scaled_t**2 + self.sigma_data**2)
            c_out = scaled_t / (scaled_t**2 + self.sigma_data**2) ** 0.5
            return c_skip, c_out

    # -- image_processor ------------------------------------------------------
    class VaeImageProcessor:
        """Shim scope: torch tensors already at target size, values in [0,1].
        (The full diffusers class also handles PIL/np and resizing — the
        parity tests feed pre-sized tensors, so only normalisation applies.)"""

        def __init__(self, vae_scale_factor=8, **_):
            self.vae_scale_factor = vae_scale_factor

        def preprocess(self, image, height=None, width=None):
            if not isinstance(image, torch.Tensor):
                raise NotImplementedError("shim VaeImageProcessor: tensor input only")
            if image.ndim == 3:
                image = image[None]
            return 2.0 * image - 1.0

    def retrieve_latents(encoder_output, generator=None, sample_mode="sample"):
        if hasattr(encoder_output, "latent_dist"):
            return encoder_output.latent_dist.sample(generator)
        if hasattr(encoder_output, "latents"):
            return encoder_output.latents
        raise AttributeError("Could not access latents of provided encoder_output")

    # -- utils ---------------------------------------------------------------
    class BaseOutput:
        def __getitem__(self, key):
            return getattr(self, key)

    import logging as _pylogging

    logging_mod = types.ModuleType("diffusers.utils.logging")
    logging_mod.get_logger = _pylogging.getLogger

    def is_xformers_available():
        return False

    # -- assemble module tree ------------------------------------------------
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    root = mod("diffusers", __live2diff_tpu_shim__=True,
               LCMScheduler=LCMScheduler)
    cfgu = mod("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
               register_to_config=register_to_config)
    models = mod("diffusers.models", ModelMixin=ModelMixin)
    mod("diffusers.image_processor", VaeImageProcessor=VaeImageProcessor)
    mod("diffusers.pipelines")
    mod("diffusers.pipelines.stable_diffusion")
    mod(
        "diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion_img2img",
        retrieve_latents=retrieve_latents,
    )
    attn = mod("diffusers.models.attention", Attention=Attention,
               FeedForward=FeedForward, AdaLayerNorm=AdaLayerNorm, GEGLU=GEGLU)
    proc = mod("diffusers.models.attention_processor", AttentionProcessor=object)
    emb = mod("diffusers.models.embeddings", Timesteps=Timesteps,
              TimestepEmbedding=TimestepEmbedding)
    mu = mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    loaders = mod("diffusers.loaders", UNet2DConditionLoadersMixin=type(
        "UNet2DConditionLoadersMixin", (), {}))
    utils = mod("diffusers.utils", BaseOutput=BaseOutput, logging=logging_mod)
    iu = mod("diffusers.utils.import_utils", is_xformers_available=is_xformers_available)
    sys.modules["diffusers.utils.logging"] = logging_mod

    root.configuration_utils = cfgu
    root.models = models
    root.loaders = loaders
    root.utils = utils
    models.attention = attn
    models.attention_processor = proc
    models.embeddings = emb
    models.modeling_utils = mu
    utils.import_utils = iu


def load_reference_models():
    """Import the reference model files as the synthetic package ``refanim``.

    Returns the dict of imported modules. Requires /root/reference and torch.
    """
    install_diffusers_shim()
    if "refanim" not in sys.modules:
        pkg = types.ModuleType("refanim")
        pkg.__path__ = [REFERENCE_MODELS_DIR]
        sys.modules["refanim"] = pkg
    names = (
        "attention", "motion_module", "stream_motion_module", "resnet",
        "unet_blocks_streaming", "unet_blocks_warmup",
        "unet_depth_streaming", "unet_depth_warmup",
    )
    return {n: importlib.import_module(f"refanim.{n}") for n in names}


REFERENCE_PKG_DIR = "/root/reference/live2diff"


def load_reference_stream_pipeline():
    """Import the reference's StreamAnimateDiffusionDepth module for CPU runs.

    Registers a synthetic ``live2diff`` package rooted at the reference tree
    (so ``live2diff.image_filter`` resolves to the real reference file) and
    stubs ``live2diff.animatediff.pipeline`` — the stream module only needs
    ``AnimationDepthPipeline`` as a type annotation; the tests inject a
    duck-typed pipe carrying refanim-built models instead of running the
    full (heavyweight) reference pipeline builder.
    """
    install_diffusers_shim()
    if "live2diff.pipeline_stream_animation_depth" in sys.modules:
        return sys.modules["live2diff.pipeline_stream_animation_depth"]

    pkg = types.ModuleType("live2diff")
    pkg.__path__ = [REFERENCE_PKG_DIR]
    sys.modules["live2diff"] = pkg

    anim = types.ModuleType("live2diff.animatediff")
    anim.__path__ = []
    pipe_mod = types.ModuleType("live2diff.animatediff.pipeline")
    pipe_mod.AnimationDepthPipeline = type("AnimationDepthPipeline", (), {})
    anim.pipeline = pipe_mod
    sys.modules["live2diff.animatediff"] = anim
    sys.modules["live2diff.animatediff.pipeline"] = pipe_mod

    return importlib.import_module("live2diff.pipeline_stream_animation_depth")
