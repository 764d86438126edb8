"""Torch checkpoint -> Flax parameter ingest.

Functional replacement for the reference's checkpoint plumbing
(/root/reference/live2diff/animatediff/converter/convert.py and the
``from_pretrained_2d`` loaders): every model's weights become a pure pytree
produced once at build time — LoRA/DreamBooth merges are parameter
transforms, not runtime hooks.

Design: each model family gets a *key translation* function mapping a torch
state-dict key to (flax_path_tuple, transform_kind). A single driver
assembles the nested Flax params dict and transposes tensors:

  conv    [O,I,kh,kw] -> kernel [kh,kw,I,O]
  linear  [O,I]       -> kernel [I,O]
  norm    weight/bias -> scale/bias
  embed   [V,D]       -> embedding
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import numpy as np

FlaxPath = Tuple[str, ...]
KeyMapResult = Optional[Tuple[FlaxPath, str]]


# ---------------------------------------------------------------------------
# generic machinery
# ---------------------------------------------------------------------------


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors / .ckpt / .pt / .bin file to numpy arrays.

    Torch pickles (live2diff.ckpt, dpt_hybrid_384.pt — the reference's two
    mandatory pickle artifacts, pipeline_animatediff_depth.py:279-290 and
    depth_utils.py:11-32) are read by a torch-free restricted unpickler
    (convert/torch_pickle.py); no torch install is required on the host.
    """
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    from .torch_pickle import load_torch_pickle

    sd = load_torch_pickle(path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a state-dict, got {type(sd).__name__}")
    return {k: np.asarray(v) for k, v in sd.items() if isinstance(v, np.ndarray)}


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (2, 3, 1, 0))
    if kind == "linear":
        return np.transpose(arr, (1, 0))
    return arr  # bias / norm param / embedding / raw


def _leaf_name(torch_key: str, kind: str) -> str:
    leaf = torch_key.rsplit(".", 1)[-1]
    if kind in ("conv", "linear") and leaf == "weight":
        return "kernel"
    if kind == "norm":
        return "scale" if leaf == "weight" else "bias"
    if kind == "embed":
        return "embedding"
    return leaf  # bias


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    key_map: Callable[[str], KeyMapResult],
    strict: bool = False,
) -> Tuple[dict, list]:
    """Run a key-translation over a torch state dict -> nested flax params.

    Returns (params_dict, skipped_keys). Unmapped keys are collected, not
    fatal (the reference tolerates missing/unexpected keys too,
    unet_depth_streaming.py:660-661).
    """
    params: dict = {}
    skipped = []
    for key, arr in sd.items():
        mapped = key_map(key)
        if mapped is None:
            skipped.append(key)
            continue
        path, kind = mapped
        if kind != "raw":  # "raw" paths already include the leaf param name
            path = path + (_leaf_name(key, kind),)
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        # only weight tensors need a layout transpose; biases/norm params don't
        needs_transform = path[-1] in ("kernel", "embedding")
        node[path[-1]] = _transform(np.asarray(arr), kind if needs_transform else "raw")
    if strict and skipped:
        raise KeyError(f"unmapped torch keys: {skipped[:10]} (+{max(0, len(skipped)-10)} more)")
    return params, skipped


def _seg(key: str) -> str:
    """'down_blocks.0.resnets.1' -> 'down_blocks_0_resnets_1'."""
    return key.replace(".", "_")


# ---------------------------------------------------------------------------
# UNet (diffusers SD-1.5 layout + AnimateDiff motion-module keys)
# ---------------------------------------------------------------------------

_RE_BLOCK_PREFIX = re.compile(
    r"^(down_blocks\.\d+|up_blocks\.\d+|mid_block)\.(resnets|attentions|motion_modules|downsamplers|upsamplers)\.(\d+)\.(.*)$"
)


def _map_resnet_tail(tail: str) -> KeyMapResult:
    # InflatedGroupNorm wraps the actual GroupNorm under a "norm" child
    m = re.match(r"^(norm[12])\.(weight|bias)$", tail)
    if m:
        return (m.group(1), "norm"), "norm"
    m = re.match(r"^(conv[12]|conv_shortcut)\.(weight|bias)$", tail)
    if m:
        return (m.group(1), "conv"), "conv"
    m = re.match(r"^time_emb_proj\.(weight|bias)$", tail)
    if m:
        return ("time_emb_proj",), "linear"
    return None


def _map_spatial_transformer_tail(tail: str) -> KeyMapResult:
    m = re.match(r"^norm\.(weight|bias)$", tail)
    if m:
        return ("norm",), "norm"
    m = re.match(r"^(proj_in|proj_out)\.(weight|bias)$", tail)
    if m:
        return (m.group(1),), "conv"
    m = re.match(r"^transformer_blocks\.(\d+)\.(.*)$", tail)
    if m:
        idx, rest = m.group(1), m.group(2)
        base = (f"transformer_blocks_{idx}",)
        m2 = re.match(r"^(attn[12])\.to_(q|k|v)\.weight$", rest)
        if m2:
            return base + (m2.group(1), f"to_{m2.group(2)}"), "linear"
        m2 = re.match(r"^(attn[12])\.to_out\.0\.(weight|bias)$", rest)
        if m2:
            return base + (m2.group(1), "to_out_0"), "linear"
        m2 = re.match(r"^(norm[123])\.(weight|bias)$", rest)
        if m2:
            return base + (m2.group(1),), "norm"
        m2 = re.match(r"^ff\.net\.0\.proj\.(weight|bias)$", rest)
        if m2:
            return base + ("ff", "net_0_proj"), "linear"
        m2 = re.match(r"^ff\.net\.2\.(weight|bias)$", rest)
        if m2:
            return base + ("ff", "net_2"), "linear"
    return None


def _map_motion_module_tail(tail: str) -> KeyMapResult:
    # strip the reference's VanillaTemporalModule wrapper level
    tail = tail.removeprefix("temporal_transformer.")
    m = re.match(r"^norm\.(weight|bias)$", tail)
    if m:
        return ("norm",), "norm"
    m = re.match(r"^(proj_in|proj_out)\.(weight|bias)$", tail)
    if m:
        return (m.group(1),), "linear"  # temporal transformer uses Linear projections
    m = re.match(r"^transformer_blocks\.(\d+)\.(.*)$", tail)
    if m:
        idx, rest = m.group(1), m.group(2)
        base = (f"transformer_blocks_{idx}",)
        m2 = re.match(r"^attention_blocks\.(\d+)\.to_(q|k|v)\.weight$", rest)
        if m2:
            return base + (f"attention_blocks_{m2.group(1)}", f"to_{m2.group(2)}"), "linear"
        m2 = re.match(r"^attention_blocks\.(\d+)\.to_out\.0\.(weight|bias)$", rest)
        if m2:
            return base + (f"attention_blocks_{m2.group(1)}", "to_out_0"), "linear"
        m2 = re.match(r"^attention_blocks\.(\d+)\.pos_encoder\.pe$", rest)
        if m2:
            return None  # PE is recomputed analytically, never stored
        m2 = re.match(r"^norms\.(\d+)\.(weight|bias)$", rest)
        if m2:
            return base + (f"norms_{m2.group(1)}",), "norm"
        m2 = re.match(r"^ff_norm\.(weight|bias)$", rest)
        if m2:
            return base + ("ff_norm",), "norm"
        m2 = re.match(r"^ff\.net\.0\.proj\.(weight|bias)$", rest)
        if m2:
            return base + ("ff", "net_0_proj"), "linear"
        m2 = re.match(r"^ff\.net\.2\.(weight|bias)$", rest)
        if m2:
            return base + ("ff", "net_2"), "linear"
    return None


def unet_key_map(key: str) -> KeyMapResult:
    # top-level
    m = re.match(r"^conv_in\.(weight|bias)$", key)
    if m:
        return ("conv_in", "conv"), "conv"
    m = re.match(r"^conv_out\.(weight|bias)$", key)
    if m:
        return ("conv_out", "conv"), "conv"
    m = re.match(r"^conv_norm_out\.(weight|bias)$", key)
    if m:
        return ("conv_norm_out", "norm"), "norm"
    m = re.match(r"^time_embedding\.(linear_[12])\.(weight|bias)$", key)
    if m:
        return ("time_embedding", m.group(1)), "linear"
    # depth mapping network
    m = re.match(r"^flow_conv_in\.conv_in\.(weight|bias)$", key)
    if m:
        return ("flow_conv_in", "conv_in", "conv"), "conv"
    m = re.match(r"^flow_conv_in\.blocks\.(\d+)\.(weight|bias)$", key)
    if m:
        return ("flow_conv_in", f"blocks_{m.group(1)}", "conv"), "conv"
    m = re.match(r"^flow_conv_in\.conv_out\.(weight|bias)$", key)
    if m:
        return ("flow_conv_in", "conv_out", "conv"), "conv"

    m = _RE_BLOCK_PREFIX.match(key)
    if m:
        block, kind, idx, tail = m.groups()
        if kind == "downsamplers":
            m2 = re.match(r"^conv\.(weight|bias)$", tail)
            if m2:
                return (f"{_seg(block)}_downsamplers_{idx}", "op", "conv"), "conv"
            return None
        if kind == "upsamplers":
            m2 = re.match(r"^conv\.(weight|bias)$", tail)
            if m2:
                return (f"{_seg(block)}_upsamplers_{idx}", "conv", "conv"), "conv"
            return None
        prefix = f"{_seg(block)}_{kind}_{idx}"
        if kind == "resnets":
            sub = _map_resnet_tail(tail)
        elif kind == "attentions":
            sub = _map_spatial_transformer_tail(tail)
        else:  # motion_modules
            sub = _map_motion_module_tail(tail)
        if sub is None:
            return None
        path, tkind = sub
        return (prefix,) + path, tkind
    return None


def unet_torch_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    params, skipped = convert_state_dict(sd, unet_key_map)
    return {"params": params}, skipped


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL layout)
# ---------------------------------------------------------------------------


def vae_key_map(key: str) -> KeyMapResult:
    m = re.match(r"^(quant_conv|post_quant_conv)\.(weight|bias)$", key)
    if m:
        return (m.group(1),), "conv"

    m = re.match(r"^(encoder|decoder)\.(.*)$", key)
    if not m:
        return None
    tower, tail = m.groups()

    m = re.match(r"^(conv_in|conv_out)\.(weight|bias)$", tail)
    if m:
        return (tower, m.group(1)), "conv"
    m = re.match(r"^conv_norm_out\.(weight|bias)$", tail)
    if m:
        return (tower, "conv_norm_out"), "norm"

    m = re.match(
        r"^(down_blocks\.\d+|up_blocks\.\d+|mid_block)\.(resnets|attentions)\.(\d+)\.(.*)$", tail
    )
    if m:
        block, kind, idx, rest = m.groups()
        prefix = f"{_seg(block)}_{kind}_{idx}"
        if kind == "resnets":
            m2 = re.match(r"^(norm[12])\.(weight|bias)$", rest)
            if m2:
                return (tower, prefix, m2.group(1)), "norm"
            m2 = re.match(r"^(conv[12]|conv_shortcut)\.(weight|bias)$", rest)
            if m2:
                return (tower, prefix, m2.group(1)), "conv"
        else:  # mid attention
            m2 = re.match(r"^group_norm\.(weight|bias)$", rest)
            if m2:
                return (tower, prefix, "group_norm"), "norm"
            m2 = re.match(r"^to_(q|k|v)\.(weight|bias)$", rest)
            if m2:
                return (tower, prefix, f"to_{m2.group(1)}"), "linear"
            m2 = re.match(r"^to_out\.0\.(weight|bias)$", rest)
            if m2:
                return (tower, prefix, "to_out_0"), "linear"
            # older checkpoints: query/key/value/proj_attn
            m2 = re.match(r"^(query|key|value|proj_attn)\.(weight|bias)$", rest)
            if m2:
                name = {"query": "to_q", "key": "to_k", "value": "to_v",
                        "proj_attn": "to_out_0"}[m2.group(1)]
                return (tower, prefix, name), "linear"
        return None

    m = re.match(r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.(weight|bias)$", tail)
    if m:
        return (tower, f"down_blocks_{m.group(1)}_downsamplers_0_conv"), "conv"
    m = re.match(r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.(weight|bias)$", tail)
    if m:
        return (tower, f"up_blocks_{m.group(1)}_upsamplers_0_conv"), "conv"
    return None


def vae_torch_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    params, skipped = convert_state_dict(sd, vae_key_map)
    return {"params": params}, skipped


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModel layout)
# ---------------------------------------------------------------------------


def clip_key_map(key: str) -> KeyMapResult:
    key = key.removeprefix("text_model.")
    m = re.match(r"^embeddings\.token_embedding\.weight$", key)
    if m:
        return ("text_model", "token_embedding"), "embed"
    m = re.match(r"^embeddings\.position_embedding\.weight$", key)
    if m:
        return ("text_model", "position_embedding"), "raw"
    m = re.match(r"^final_layer_norm\.(weight|bias)$", key)
    if m:
        return ("final_layer_norm",), "norm"
    m = re.match(r"^encoder\.layers\.(\d+)\.(.*)$", key)
    if m:
        idx, tail = m.groups()
        base = ("text_model", f"layers_{idx}")
        m2 = re.match(r"^self_attn\.(q|k|v|out)_proj\.(weight|bias)$", tail)
        if m2:
            return base + ("self_attn", f"{m2.group(1)}_proj"), "linear"
        m2 = re.match(r"^(layer_norm[12])\.(weight|bias)$", tail)
        if m2:
            return base + (m2.group(1),), "norm"
        m2 = re.match(r"^mlp\.(fc[12])\.(weight|bias)$", tail)
        if m2:
            return base + (f"mlp_{m2.group(1)}",), "linear"
    return None


def clip_torch_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    params, skipped = convert_state_dict(sd, clip_key_map)
    return {"params": params}, skipped


# ---------------------------------------------------------------------------
# TAESD (madebyollin layout: encoder.{i}... with nested Block convs)
# ---------------------------------------------------------------------------


def taesd_key_map(key: str) -> KeyMapResult:
    m = re.match(r"^(encoder|decoder)\.(\d+)\.(.*)$", key)
    if not m:
        return None
    tower, idx, tail = m.groups()
    base = (tower, f"layers_{idx}")
    m2 = re.match(r"^(weight|bias)$", tail)
    if m2:
        return base, "conv"  # plain conv layer
    m2 = re.match(r"^conv\.(\d+)\.(weight|bias)$", tail)
    if m2:
        return base + (f"conv_{m2.group(1)}",), "conv"
    m2 = re.match(r"^skip\.(weight|bias)$", tail)
    if m2:
        return base + ("skip",), "conv"
    return None


def taesd_torch_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    params, skipped = convert_state_dict(sd, taesd_key_map)
    return {"params": params}, skipped
