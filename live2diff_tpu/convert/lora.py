"""Model-level LoRA merging: params <- params + scale * (up @ down).

Functional equivalent of the reference's ``convert_lora_model_level``
(/root/reference/live2diff/animatediff/converter/convert_lora_safetensor_to_diffusers.py:22-101)
and of diffusers' fuse_lora for the LCM-LoRA: the merge happens once on the
torch-layout state dict before conversion to Flax, so the runtime never sees
LoRA at all. Handles linear LoRA, 1x1/3x3 conv LoRA (LoCon), and per-module
alpha scaling.

Supported key dialects:
* kohya/civitai: ``lora_unet_<module>_<path>.lora_up.weight`` / ``.lora_down.weight``
  / ``.alpha`` (prefixes ``lora_unet_`` / ``lora_te_``)
* diffusers/peft (LCM-LoRA): ``<module>.lora_A.weight`` (=down), ``lora_B`` (=up),
  also ``unet.<...>.lora_linear_layer.up.weight`` style.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _delta(up: np.ndarray, down: np.ndarray, scale: float) -> np.ndarray:
    """scale * up @ down, supporting conv kernels."""
    if up.ndim == 4:  # conv LoRA: up [O, r, 1, 1], down [r, I, kh, kw]
        o, r = up.shape[:2]
        _, i, kh, kw = down.shape
        delta = np.einsum("or,rikk->oikk", up.reshape(o, r), down) if (kh == kw == 1) else (
            np.tensordot(up.reshape(o, r), down, axes=(1, 0))
        )
        return scale * delta.reshape(o, i, kh, kw)
    return scale * (up @ down)


def _normalise_lora_keys(lora_sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Group LoRA tensors by module: {module_key: {up, down, alpha}}.

    module_key keeps the dialect prefix (lora_unet_/lora_te_/unet./text_encoder.)
    so the caller can route it to the right state dict.
    """
    groups: Dict[str, dict] = {}
    for key, val in lora_sd.items():
        m = re.match(r"^(.*)\.(lora_up\.weight|lora_B\.weight|lora_linear_layer\.up\.weight)$", key)
        if m:
            groups.setdefault(m.group(1), {})["up"] = val
            continue
        m = re.match(r"^(.*)\.(lora_down\.weight|lora_A\.weight|lora_linear_layer\.down\.weight)$", key)
        if m:
            groups.setdefault(m.group(1), {})["down"] = val
            continue
        m = re.match(r"^(.*)\.alpha$", key)
        if m:
            groups.setdefault(m.group(1), {})["alpha"] = float(np.asarray(val))
    return groups


def _resolve_target(
    module_key: str, unet_index: Dict[str, str], text_index: Dict[str, str]
) -> Tuple[str, str] | None:
    """Resolve a LoRA module key to ('unet'|'text', '<...>.weight' key).

    kohya keys flatten '.' to '_', so we match underscored module paths
    against an underscored index of the real state-dict keys.
    """
    candidates = []
    for prefix, which, index in (
        ("lora_unet_", "unet", unet_index),
        ("lora_te_", "text", text_index),
        ("unet.", "unet", unet_index),
        ("text_encoder.", "text", text_index),
    ):
        if module_key.startswith(prefix):
            flat = module_key[len(prefix):].replace(".", "_")
            # peft-style keys may carry a trailing ".base_layer" level
            flat = flat.removesuffix("_base_layer")
            target = index.get(flat)
            return (which, target) if target else None
        candidates.append((which, index))
    flat = module_key.replace(".", "_").removesuffix("_base_layer")
    for which, index in candidates:
        if flat in index:
            return which, index[flat]
    return None


def _flat_key_index(sd: Dict[str, np.ndarray]) -> Dict[str, str]:
    """underscored module path -> actual '.weight' key."""
    out = {}
    for k in sd:
        if k.endswith(".weight"):
            out[k[: -len(".weight")].replace(".", "_")] = k
    return out


def merge_lora_into_state_dict(
    unet_sd: Dict[str, np.ndarray],
    text_sd: Dict[str, np.ndarray],
    lora_sd: Dict[str, np.ndarray],
    lora_alpha: float = 1.0,
    collect: list = None,
) -> Tuple[int, int]:
    """Merge a LoRA into (unet_sd, text_sd) in place.

    Returns (num_merged, num_unmatched). When ``collect`` is a list, one
    record ``(which, target_key, up, down, unit)`` is appended per merged
    module (``unit = alpha / rank``; the fused delta is
    ``lora_alpha * unit * up @ down``) — the factors the runtime needs to
    re-strength the LoRA later without rebuilding (wrapper.update_lora_scale).
    """
    unet_index = _flat_key_index(unet_sd)
    text_index = _flat_key_index(text_sd)
    groups = _normalise_lora_keys(lora_sd)

    merged = unmatched = 0
    for module_key, parts in groups.items():
        if "up" not in parts or "down" not in parts:
            unmatched += 1
            continue
        resolved = _resolve_target(module_key, unet_index, text_index)
        if resolved is None:
            unmatched += 1
            continue
        which, target_key = resolved
        sd = unet_sd if which == "unet" else text_sd
        up = np.asarray(parts["up"], dtype=np.float32)
        down = np.asarray(parts["down"], dtype=np.float32)
        rank = down.shape[0] if down.ndim >= 2 else 1
        alpha = parts.get("alpha", float(rank))
        scale = lora_alpha * alpha / rank
        w = np.asarray(sd[target_key], dtype=np.float32)
        if up.ndim == 4 or w.ndim == 4:
            if up.ndim == 2:  # linear lora on conv weight (rare) — reshape
                up = up[:, :, None, None]
                down = down[:, :, None, None] if down.ndim == 2 else down
            sd[target_key] = (w + _delta(up, down, scale)).astype(sd[target_key].dtype)
        else:
            sd[target_key] = (w + scale * up @ down).astype(sd[target_key].dtype)
        if collect is not None:
            collect.append((which, target_key, up, down, alpha / rank))
        merged += 1
    return merged, unmatched


def lora_delta_state_dict(records, delta_alpha: float) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Torch-layout weight DELTAS for a strength change of ``delta_alpha``.

    records: the ``collect`` output of :func:`merge_lora_into_state_dict`.
    Returns (unet_deltas, text_deltas) keyed like the original state dicts;
    deltas transform to Flax layout exactly like weights (the converters'
    per-kind transforms are linear), so they can be converted and added to
    live parameters.
    """
    unet_d: Dict[str, np.ndarray] = {}
    text_d: Dict[str, np.ndarray] = {}
    for which, target_key, up, down, unit in records:
        scale = delta_alpha * unit
        d = _delta(up, down, scale) if (up.ndim == 4) else scale * (up @ down)
        tgt = unet_d if which == "unet" else text_d
        tgt[target_key] = (tgt.get(target_key, 0.0) + d).astype(np.float32)
    return unet_d, text_d
