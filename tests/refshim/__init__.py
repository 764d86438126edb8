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

    root = mod("diffusers", __live2diff_tpu_shim__=True)
    cfgu = mod("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
               register_to_config=register_to_config)
    models = mod("diffusers.models", ModelMixin=ModelMixin)
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
