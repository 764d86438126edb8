"""Enumerate-every-key ingest round trips for DPT (MiDaS) and TAESD.

Companion to tests/test_convert.py's UNet/VAE/CLIP coverage tests: a
synthetic torch state dict with the exact key names of the real
checkpoints (isl-org dpt_hybrid_384.pt / madebyollin taesd safetensors) is
generated at the flax tree's shapes, converted, and required to cover the
Flax init tree leaf-for-leaf with matching shapes — so the first contact
with real weights is not the first test of the key maps.
Reference checkpoint consumers: /root/reference/live2diff/animatediff/models/
depth_utils.py:11-32 (MidasDetector) and the TinyVAE path in
/root/reference/live2diff/utils/wrapper.py (use_tiny_vae).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from live2diff_tpu.convert.midas import dpt_key_map, dpt_torch_to_flax
from live2diff_tpu.convert.torch_to_flax import (
    _leaf_name,
    taesd_key_map,
    taesd_torch_to_flax,
)
from live2diff_tpu.models.midas import DPTDepthModel
from live2diff_tpu.models.vae import TinyAutoencoder

pytestmark = pytest.mark.fast


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def inverse_transform(arr: np.ndarray, flax_leaf: str) -> np.ndarray:
    if flax_leaf == "kernel" and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))
    if flax_leaf == "kernel" and arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


# ---------------------------------------------------------------------------
# DPT-hybrid (dpt_hybrid_384.pt key layout)
# ---------------------------------------------------------------------------


def dpt_torch_keys():
    pm = "pretrained.model"
    keys = [
        f"{pm}.cls_token", f"{pm}.pos_embed",
        f"{pm}.patch_embed.proj.weight", f"{pm}.patch_embed.proj.bias",
        f"{pm}.patch_embed.backbone.stem.conv.weight",
        f"{pm}.patch_embed.backbone.stem.norm.weight",
        f"{pm}.patch_embed.backbone.stem.norm.bias",
    ]
    for s, n_blocks in enumerate((3, 4, 9)):
        for b in range(n_blocks):
            p = f"{pm}.patch_embed.backbone.stages.{s}.blocks.{b}"
            for c in (1, 2, 3):
                keys.append(f"{p}.conv{c}.weight")
                keys += [f"{p}.norm{c}.weight", f"{p}.norm{c}.bias"]
            if b == 0:  # projection shortcut only in the first block per stage
                keys += [f"{p}.downsample.conv.weight",
                         f"{p}.downsample.norm.weight",
                         f"{p}.downsample.norm.bias"]
    for i in range(12):
        p = f"{pm}.blocks.{i}"
        for nm in ("norm1", "norm2"):
            keys += [f"{p}.{nm}.weight", f"{p}.{nm}.bias"]
        for nm in ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2"):
            keys += [f"{p}.{nm}.weight", f"{p}.{nm}.bias"]
    for i in (3, 4):
        keys += [f"pretrained.act_postprocess{i}.0.project.0.weight",
                 f"pretrained.act_postprocess{i}.0.project.0.bias",
                 f"pretrained.act_postprocess{i}.3.weight",
                 f"pretrained.act_postprocess{i}.3.bias"]
    keys += ["pretrained.act_postprocess4.4.weight",
             "pretrained.act_postprocess4.4.bias"]
    for i in (1, 2, 3, 4):
        keys.append(f"scratch.layer{i}_rn.weight")
        p = f"scratch.refinenet{i}"
        keys += [f"{p}.out_conv.weight", f"{p}.out_conv.bias"]
        for u in (1, 2):
            for c in (1, 2):
                keys += [f"{p}.resConfUnit{u}.conv{c}.weight",
                         f"{p}.resConfUnit{u}.conv{c}.bias"]
    for i in (0, 2, 4):
        keys += [f"scratch.output_conv.{i}.weight", f"scratch.output_conv.{i}.bias"]
    return keys


def test_dpt_converter_covers_flax_tree():
    model = DPTDepthModel()
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3)))
    )
    flax_leaves = flatten(params["params"])

    sd, covered, extra = {}, set(), set()
    for tk in dpt_torch_keys():
        mapped = dpt_key_map(tk)
        assert mapped is not None, f"converter cannot map torch key: {tk}"
        path, kind = mapped
        full = path + ((_leaf_name(tk, kind),) if kind != "raw" else ())
        if full in flax_leaves:
            covered.add(full)
            shape = flax_leaves[full].shape
        else:
            # refinenet4 takes no skip input, so its resConfUnit1 exists in
            # the torch checkpoint but not in the flax tree (midas.py:181)
            assert full[:2] == ("refinenet4", "res_conv_unit1"), \
                f"mapped path {full} (from {tk}) not in DPT flax tree"
            extra.add(full)
            shape = flax_leaves[("refinenet3",) + full[1:]].shape
        sd[tk] = inverse_transform(np.zeros(shape, np.float32), full[-1])

    missing = set(flax_leaves) - covered
    assert not missing, f"flax params not covered by torch keys: {sorted(missing)[:8]}"

    converted, skipped = dpt_torch_to_flax(sd)
    assert not skipped
    conv_leaves = flatten(converted["params"])
    assert set(conv_leaves) == set(flax_leaves) | extra
    for path in flax_leaves:
        assert conv_leaves[path].shape == flax_leaves[path].shape, path


# ---------------------------------------------------------------------------
# TAESD (madebyollin encoder.N / decoder.N Sequential layout)
# ---------------------------------------------------------------------------


def taesd_torch_keys():
    enc, layer = {0: "conv"}, 1
    for stage, n in enumerate((1, 3, 3, 3)):
        if stage > 0:
            enc[layer] = "down"      # stride-2 conv, bias=False
            layer += 1
        for _ in range(n):
            enc[layer] = "block"
            layer += 1
    enc[layer] = "conv"              # -> latent channels

    dec, layer = {1: "conv"}, 3      # slot 0 Clamp, slot 2 ReLU hold no params
    for _ in range(3):
        for _ in range(3):
            dec[layer] = "block"
            layer += 1
        layer += 1                   # nn.Upsample slot
        dec[layer] = "down"          # post-upsample conv, bias=False
        layer += 1
    dec[layer] = "block"
    dec[layer + 1] = "conv"

    keys = []
    for tower, layout in (("encoder", enc), ("decoder", dec)):
        for idx, kind in sorted(layout.items()):
            p = f"{tower}.{idx}"
            if kind == "conv":
                keys += [f"{p}.weight", f"{p}.bias"]
            elif kind == "down":
                keys.append(f"{p}.weight")
            else:  # Block: conv Sequential slots 0/2/4 (1/3 are ReLU)
                for c in (0, 2, 4):
                    keys += [f"{p}.conv.{c}.weight", f"{p}.conv.{c}.bias"]
    return keys


def test_taesd_converter_covers_flax_tree():
    vae = TinyAutoencoder()
    params = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    flax_leaves = flatten(params["params"])

    sd, covered = {}, set()
    for tk in taesd_torch_keys():
        mapped = taesd_key_map(tk)
        assert mapped is not None, f"converter cannot map torch key: {tk}"
        path, kind = mapped
        full = path + (_leaf_name(tk, kind),)
        assert full in flax_leaves, f"mapped path {full} (from {tk}) not in TAESD flax tree"
        covered.add(full)
        sd[tk] = inverse_transform(np.zeros(flax_leaves[full].shape, np.float32), full[-1])

    missing = set(flax_leaves) - covered
    assert not missing, f"flax params not covered by torch keys: {sorted(missing)[:8]}"

    converted, skipped = taesd_torch_to_flax(sd)
    assert not skipped
    conv_leaves = flatten(converted["params"])
    assert set(conv_leaves) == set(flax_leaves)
    for path in conv_leaves:
        assert conv_leaves[path].shape == flax_leaves[path].shape, path
