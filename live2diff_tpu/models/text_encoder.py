"""CLIP ViT-L/14 text encoder (SD-1.5's conditioning model) in Flax.

Re-implements the torch ``CLIPTextModel`` the reference loads from the SD
checkpoint (/root/reference/live2diff/animatediff/pipeline/
pipeline_animatediff_depth.py:268-271), including NAI-style ``clip_skip``:
take the hidden state ``clip_skip`` layers before the end and re-apply the
final layer norm (reference ``_encode_prompt``,
pipeline_animatediff_depth.py:185-191).

Implemented natively (not via transformers' Flax port) so clip_skip, dtype
policy, and checkpoint ingest stay under framework control.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], cfg.num_heads, head_dim)

        out = dot_product_attention(split(q), split(k), split(v), bias=causal_bias)
        out = out.reshape(*x.shape)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config

        def ln(name):
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                                param_dtype=self.param_dtype, name=name)

        h = ln("layer_norm1")(x).astype(self.dtype)
        x = x + CLIPAttention(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                              name="self_attn")(h, causal_bias)
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns all hidden states so callers implement clip_skip."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
            self.param_dtype,
        )
        x = tok + pos[None, :s].astype(self.dtype)

        causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x, causal)
            hidden_states.append(x)
        return hidden_states

    def final_layer_norm_apply(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        """Standalone final LN application (used by clip_skip path)."""
        scale = params["params"]["final_layer_norm"]["scale"]
        bias = params["params"]["final_layer_norm"]["bias"]
        h32 = hidden.astype(jnp.float32)
        mean = h32.mean(-1, keepdims=True)
        var = h32.var(-1, keepdims=True)
        out = (h32 - mean) / jnp.sqrt(var + self.config.layer_norm_eps)
        return (out * scale + bias).astype(hidden.dtype)


class CLIPTextModelWithFinalNorm(nn.Module):
    """CLIPTextModel + owned final_layer_norm params, with clip_skip encode."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.text_model = CLIPTextModel(self.config, dtype=self.dtype,
                                        param_dtype=self.param_dtype)
        self.final_layer_norm = nn.LayerNorm(
            epsilon=self.config.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )

    def __call__(self, input_ids: jnp.ndarray, clip_skip: int = 0) -> jnp.ndarray:
        """Prompt embedding ``[B, S, hidden]``.

        clip_skip=0 (None in the reference): final layer + final LN.
        clip_skip=k>=1: hidden_states[-(k+1)] + final LN.
        """
        hidden_states = self.text_model(input_ids)
        idx = -(clip_skip + 1) if clip_skip >= 1 else -1
        h = hidden_states[idx]
        return self.final_layer_norm(h).astype(self.dtype)


def encode_prompt(
    model: CLIPTextModelWithFinalNorm,
    params,
    input_ids: np.ndarray,
    clip_skip: int = 1,
) -> jnp.ndarray:
    return model.apply(params, jnp.asarray(input_ids), clip_skip=clip_skip)
