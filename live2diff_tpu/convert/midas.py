"""MiDaS dpt_hybrid_384.pt -> Flax DPTDepthModel parameter ingest.

The checkpoint uses timm's vit_base_r50_s16_384 naming under ``pretrained.model``
plus the DPT ``scratch`` decoder. Key families:

  pretrained.model.patch_embed.backbone.stem.conv|norm        -> stem_*
  pretrained.model.patch_embed.backbone.stages.S.blocks.B.*   -> stages_S_blocks_B/*
  pretrained.model.patch_embed.proj                           -> patch_embed_proj
  pretrained.model.cls_token / pos_embed                      -> cls_token / pos_embed
  pretrained.model.blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
                                                              -> vit_blocks_N/*
  pretrained.act_postprocess{3,4}.{0.project.0,3,4}           -> postprocess*_readout/_proj/_down
  scratch.layerN_rn / scratch.refinenetN.* / scratch.output_conv.N
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from .torch_to_flax import KeyMapResult, convert_state_dict


def dpt_key_map(key: str) -> KeyMapResult:
    k = key
    # --- backbone stem ---
    m = re.match(r"^pretrained\.model\.patch_embed\.backbone\.stem\.conv\.weight$", k)
    if m:
        return ("stem_conv",), "conv"
    m = re.match(r"^pretrained\.model\.patch_embed\.backbone\.stem\.norm\.(weight|bias)$", k)
    if m:
        return ("stem_norm", "norm"), "norm"

    # --- resnet stages ---
    m = re.match(
        r"^pretrained\.model\.patch_embed\.backbone\.stages\.(\d+)\.blocks\.(\d+)\.(.*)$", k
    )
    if m:
        s, b, tail = m.groups()
        base = f"stages_{s}_blocks_{b}"
        m2 = re.match(r"^conv(\d)\.weight$", tail)
        if m2:
            return (base, f"conv{m2.group(1)}"), "conv"
        m2 = re.match(r"^norm(\d)\.(weight|bias)$", tail)
        if m2:
            n = m2.group(1)
            # norm1/norm2 live inside GNReLU wrappers; norm3 is a bare GroupNorm
            path = (base, f"norm{n}", "norm") if n in ("1", "2") else (base, "norm3")
            return path, "norm"
        m2 = re.match(r"^downsample\.conv\.weight$", tail)
        if m2:
            return (base, "downsample_conv"), "conv"
        m2 = re.match(r"^downsample\.norm\.(weight|bias)$", tail)
        if m2:
            return (base, "downsample_norm"), "norm"
        return None

    # --- vit embeddings ---
    if k == "pretrained.model.cls_token":
        return ("cls_token",), "raw"
    if k == "pretrained.model.pos_embed":
        return ("pos_embed",), "raw"
    m = re.match(r"^pretrained\.model\.patch_embed\.proj\.(weight|bias)$", k)
    if m:
        return ("patch_embed_proj",), "conv"

    # --- vit blocks ---
    m = re.match(r"^pretrained\.model\.blocks\.(\d+)\.(.*)$", k)
    if m:
        i, tail = m.groups()
        base = f"vit_blocks_{i}"
        table = {
            "norm1": ((base, "norm1"), "norm"),
            "norm2": ((base, "norm2"), "norm"),
            "attn.qkv": ((base, "attn_qkv"), "linear"),
            "attn.proj": ((base, "attn_proj"), "linear"),
            "mlp.fc1": ((base, "mlp_fc1"), "linear"),
            "mlp.fc2": ((base, "mlp_fc2"), "linear"),
        }
        for src, (path, kind) in table.items():
            if tail.startswith(src + "."):
                return path, kind
        return None

    # --- reassemble (act_postprocess) ---
    m = re.match(r"^pretrained\.act_postprocess(3|4)\.0\.project\.0\.(weight|bias)$", k)
    if m:
        return (f"postprocess{m.group(1)}_readout",), "linear"
    m = re.match(r"^pretrained\.act_postprocess(3|4)\.3\.(weight|bias)$", k)
    if m:
        return (f"postprocess{m.group(1)}_proj",), "conv"
    m = re.match(r"^pretrained\.act_postprocess4\.4\.(weight|bias)$", k)
    if m:
        return ("postprocess4_down",), "conv"

    # --- scratch decoder ---
    m = re.match(r"^scratch\.layer(\d)_rn\.weight$", k)
    if m:
        return (f"layer{m.group(1)}_rn",), "conv"
    m = re.match(r"^scratch\.refinenet(\d)\.out_conv\.(weight|bias)$", k)
    if m:
        return (f"refinenet{m.group(1)}", "out_conv"), "conv"
    m = re.match(r"^scratch\.refinenet(\d)\.resConfUnit(\d)\.conv(\d)\.(weight|bias)$", k)
    if m:
        return (
            f"refinenet{m.group(1)}", f"res_conv_unit{m.group(2)}", f"conv{m.group(3)}"
        ), "conv"
    m = re.match(r"^scratch\.output_conv\.(\d+)\.(weight|bias)$", k)
    if m:
        idx = int(m.group(1))
        name = {0: "head_conv1", 2: "head_conv2", 4: "head_conv3"}.get(idx)
        if name:
            return (name,), "conv"
    return None


def dpt_torch_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    params, skipped = convert_state_dict(sd, dpt_key_map)
    return {"params": params}, skipped
