"""Checkpoint-ingest tests: torch->flax key mapping, LDM remap, LoRA merge.

No real weights exist in this environment, so fidelity is tested
structurally: a synthetic torch state dict in the exact diffusers/LDM/kohya
naming is generated for the tiny UNet config, converted, and required to
reproduce the Flax init tree leaf-for-leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np

from live2diff_tpu.convert.ldm import (
    convert_ldm_unet_keys,
    convert_ldm_vae_keys,
)
from live2diff_tpu.convert.lora import merge_lora_into_state_dict
from live2diff_tpu.convert.torch_to_flax import (
    clip_torch_to_flax,
    unet_torch_to_flax,
    vae_torch_to_flax,
)

import pytest

pytestmark = pytest.mark.fast
from live2diff_tpu.models.text_encoder import CLIPTextConfig, CLIPTextModelWithFinalNorm
from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig
from live2diff_tpu.models.vae import AutoencoderKL, VAEConfig
from live2diff_tpu.stream.state_machine import init_window_state, mask_to_bias


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def inverse_transform(arr: np.ndarray, flax_leaf: str) -> np.ndarray:
    """Flax param -> torch layout (inverse of converter transforms)."""
    if flax_leaf == "kernel" and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))
    if flax_leaf == "kernel" and arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def diffusers_unet_keys(cfg: UNetConfig):
    """Enumerate the torch (diffusers+AnimateDiff) key names for our config."""
    keys = ["conv_in.weight", "conv_in.bias", "conv_out.weight", "conv_out.bias",
            "conv_norm_out.weight", "conv_norm_out.bias"]
    for i in (1, 2):
        keys += [f"time_embedding.linear_{i}.weight", f"time_embedding.linear_{i}.bias"]
    keys += ["flow_conv_in.conv_in.weight", "flow_conv_in.conv_in.bias",
             "flow_conv_in.conv_out.weight", "flow_conv_in.conv_out.bias"]
    for b in range(6):
        keys += [f"flow_conv_in.blocks.{b}.weight", f"flow_conv_in.blocks.{b}.bias"]

    def resnet(prefix, has_shortcut):
        ks = []
        for name in ("norm1", "norm2"):
            ks += [f"{prefix}.{name}.weight", f"{prefix}.{name}.bias"]
        for name in ("conv1", "conv2"):
            ks += [f"{prefix}.{name}.weight", f"{prefix}.{name}.bias"]
        ks += [f"{prefix}.time_emb_proj.weight", f"{prefix}.time_emb_proj.bias"]
        if has_shortcut:
            ks += [f"{prefix}.conv_shortcut.weight", f"{prefix}.conv_shortcut.bias"]
        return ks

    def spatial(prefix):
        ks = [f"{prefix}.norm.weight", f"{prefix}.norm.bias"]
        for p in ("proj_in", "proj_out"):
            ks += [f"{prefix}.{p}.weight", f"{prefix}.{p}.bias"]
        tb = f"{prefix}.transformer_blocks.0"
        for attn in ("attn1", "attn2"):
            ks += [f"{tb}.{attn}.to_q.weight", f"{tb}.{attn}.to_k.weight",
                   f"{tb}.{attn}.to_v.weight", f"{tb}.{attn}.to_out.0.weight",
                   f"{tb}.{attn}.to_out.0.bias"]
        for n in ("norm1", "norm2", "norm3"):
            ks += [f"{tb}.{n}.weight", f"{tb}.{n}.bias"]
        ks += [f"{tb}.ff.net.0.proj.weight", f"{tb}.ff.net.0.proj.bias",
               f"{tb}.ff.net.2.weight", f"{tb}.ff.net.2.bias"]
        return ks

    def motion(prefix):
        tt = f"{prefix}.temporal_transformer"
        ks = [f"{tt}.norm.weight", f"{tt}.norm.bias"]
        for p in ("proj_in", "proj_out"):
            ks += [f"{tt}.{p}.weight", f"{tt}.{p}.bias"]
        tb = f"{tt}.transformer_blocks.0"
        for a in (0, 1):
            ab = f"{tb}.attention_blocks.{a}"
            ks += [f"{ab}.to_q.weight", f"{ab}.to_k.weight", f"{ab}.to_v.weight",
                   f"{ab}.to_out.0.weight", f"{ab}.to_out.0.bias"]
            ks += [f"{tb}.norms.{a}.weight", f"{tb}.norms.{a}.bias"]
        ks += [f"{tb}.ff_norm.weight", f"{tb}.ff_norm.bias",
               f"{tb}.ff.net.0.proj.weight", f"{tb}.ff.net.0.proj.bias",
               f"{tb}.ff.net.2.weight", f"{tb}.ff.net.2.bias"]
        return ks

    chans = cfg.block_out_channels
    for i in range(4):
        for l in range(2):
            in_ch = (chans[i - 1] if i > 0 else chans[0]) if l == 0 else chans[i]
            keys += resnet(f"down_blocks.{i}.resnets.{l}", in_ch != chans[i])
            if i < 3:
                keys += spatial(f"down_blocks.{i}.attentions.{l}")
            keys += motion(f"down_blocks.{i}.motion_modules.{l}")
        if i < 3:
            keys += [f"down_blocks.{i}.downsamplers.0.conv.weight",
                     f"down_blocks.{i}.downsamplers.0.conv.bias"]
    for j in range(2):
        keys += resnet(f"mid_block.resnets.{j}", False)
    keys += spatial("mid_block.attentions.0")
    for i in range(4):
        for l in range(3):
            keys += resnet(f"up_blocks.{i}.resnets.{l}", True)
            if i > 0:
                keys += spatial(f"up_blocks.{i}.attentions.{l}")
            keys += motion(f"up_blocks.{i}.motion_modules.{l}")
        if i < 3:
            keys += [f"up_blocks.{i}.upsamplers.0.conv.weight",
                     f"up_blocks.{i}.upsamplers.0.conv.bias"]
    return keys


TINY = UNetConfig(
    block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
    cross_attention_dim=12, norm_num_groups=4, motion_num_attention_heads=2,
)


@pytest.fixture(scope="module")
def tiny_unet_flax_params():
    unet = UNet3DConditionModel(config=TINY, dtype=jnp.float32)
    caches = TINY.init_caches(8, 8, 2, dtype=jnp.float32)
    mask, pe, upd = init_window_state(2)
    params = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 1, 8, 8, 4)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 7, 12)), jnp.zeros((2, 1, 8, 8, 4)),
            caches, "stream", mask_to_bias(mask), pe, upd,
        )
    )
    return flatten(params["params"])


def test_unet_converter_covers_flax_tree(tiny_unet_flax_params):
    flax_leaves = tiny_unet_flax_params
    torch_keys = diffusers_unet_keys(TINY)

    from live2diff_tpu.convert.torch_to_flax import unet_key_map, _leaf_name

    sd = {}
    covered = set()
    for tk in torch_keys:
        mapped = unet_key_map(tk)
        assert mapped is not None, f"converter cannot map torch key: {tk}"
        path, kind = mapped
        full = ("params",) if False else path + ((_leaf_name(tk, kind),) if kind != "raw" else ())
        assert full in flax_leaves, f"mapped path {full} (from {tk}) not in flax tree"
        covered.add(full)
        shape = flax_leaves[full].shape
        arr = np.random.RandomState(len(sd)).randn(*shape).astype(np.float32)
        sd[tk] = inverse_transform(arr, full[-1])

    # every flax param must be covered by the synthetic checkpoint
    missing = set(flax_leaves) - covered
    assert not missing, f"flax params not covered by torch keys: {sorted(missing)[:8]}"

    converted, skipped = unet_torch_to_flax(sd)
    assert not skipped
    conv_leaves = flatten(converted["params"])
    assert set(conv_leaves) == set(flax_leaves)
    for path in conv_leaves:
        assert conv_leaves[path].shape == flax_leaves[path].shape, path


# ---------------------------------------------------------------------------
# VAE + CLIP structural round trips
# ---------------------------------------------------------------------------


def test_vae_converter_covers_flax_tree():
    cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), norm_num_groups=4)
    vae = AutoencoderKL(config=cfg)
    params = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    flax_leaves = flatten(params["params"])

    keys = ["quant_conv.weight", "quant_conv.bias",
            "post_quant_conv.weight", "post_quant_conv.bias"]
    for tower, n_res, n_down in (("encoder", 2, True), ("decoder", 3, False)):
        keys += [f"{tower}.conv_in.weight", f"{tower}.conv_in.bias",
                 f"{tower}.conv_out.weight", f"{tower}.conv_out.bias",
                 f"{tower}.conv_norm_out.weight", f"{tower}.conv_norm_out.bias"]
        blocks = "down_blocks" if n_down else "up_blocks"
        chans = cfg.block_out_channels if n_down else tuple(reversed(cfg.block_out_channels))
        for i in range(4):
            for j in range(n_res):
                prefix = f"{tower}.{blocks}.{i}.resnets.{j}"
                for nm in ("norm1", "norm2"):
                    keys += [f"{prefix}.{nm}.weight", f"{prefix}.{nm}.bias"]
                for nm in ("conv1", "conv2"):
                    keys += [f"{prefix}.{nm}.weight", f"{prefix}.{nm}.bias"]
                in_ch = chans[i - 1] if (i > 0 and j == 0) else chans[i]
                if in_ch != chans[i]:
                    keys += [f"{prefix}.conv_shortcut.weight", f"{prefix}.conv_shortcut.bias"]
            if n_down and i < 3:
                keys += [f"{tower}.down_blocks.{i}.downsamplers.0.conv.weight",
                         f"{tower}.down_blocks.{i}.downsamplers.0.conv.bias"]
            if not n_down and i < 3:
                keys += [f"{tower}.up_blocks.{i}.upsamplers.0.conv.weight",
                         f"{tower}.up_blocks.{i}.upsamplers.0.conv.bias"]
        for j in (0, 1):
            prefix = f"{tower}.mid_block.resnets.{j}"
            for nm in ("norm1", "norm2"):
                keys += [f"{prefix}.{nm}.weight", f"{prefix}.{nm}.bias"]
            for nm in ("conv1", "conv2"):
                keys += [f"{prefix}.{nm}.weight", f"{prefix}.{nm}.bias"]
        ab = f"{tower}.mid_block.attentions.0"
        keys += [f"{ab}.group_norm.weight", f"{ab}.group_norm.bias"]
        for nm in ("to_q", "to_k", "to_v"):
            keys += [f"{ab}.{nm}.weight", f"{ab}.{nm}.bias"]
        keys += [f"{ab}.to_out.0.weight", f"{ab}.to_out.0.bias"]

    from live2diff_tpu.convert.torch_to_flax import vae_key_map, _leaf_name

    sd, covered = {}, set()
    for tk in keys:
        mapped = vae_key_map(tk)
        assert mapped is not None, f"unmapped VAE key {tk}"
        path, kind = mapped
        full = path + (_leaf_name(tk, kind),)
        assert full in flax_leaves, f"{full} (from {tk}) not in VAE flax tree"
        covered.add(full)
        sd[tk] = inverse_transform(
            np.zeros(flax_leaves[full].shape, np.float32), full[-1]
        )
    assert set(flax_leaves) == covered, sorted(set(flax_leaves) - covered)[:8]
    converted, skipped = vae_torch_to_flax(sd)
    assert not skipped
    assert set(flatten(converted["params"])) == set(flax_leaves)


def test_clip_converter_structure():
    cfg = CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                         intermediate_size=32, max_position_embeddings=10)
    model = CLIPTextModelWithFinalNorm(config=cfg)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10), jnp.int32))
    )
    flax_leaves = flatten(params["params"])

    keys = ["text_model.embeddings.token_embedding.weight",
            "text_model.embeddings.position_embedding.weight",
            "text_model.final_layer_norm.weight", "text_model.final_layer_norm.bias"]
    for i in range(2):
        p = f"text_model.encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            keys += [f"{p}.self_attn.{nm}.weight", f"{p}.self_attn.{nm}.bias"]
        for nm in ("layer_norm1", "layer_norm2"):
            keys += [f"{p}.{nm}.weight", f"{p}.{nm}.bias"]
        for nm in ("fc1", "fc2"):
            keys += [f"{p}.mlp.{nm}.weight", f"{p}.mlp.{nm}.bias"]

    from live2diff_tpu.convert.torch_to_flax import clip_key_map, _leaf_name

    sd, covered = {}, set()
    for tk in keys:
        mapped = clip_key_map(tk)
        assert mapped is not None, tk
        path, kind = mapped
        full = path + ((_leaf_name(tk, kind),) if kind != "raw" else ())
        assert full in flax_leaves, f"{full} from {tk}"
        covered.add(full)
        sd[tk] = inverse_transform(np.zeros(flax_leaves[full].shape, np.float32), full[-1])
    assert covered == set(flax_leaves), sorted(set(flax_leaves) - covered)[:8]
    converted, skipped = clip_torch_to_flax(sd)
    assert not skipped


# ---------------------------------------------------------------------------
# LDM remap
# ---------------------------------------------------------------------------


def test_ldm_unet_remap_representative_keys():
    sd = {
        "model.diffusion_model.time_embed.0.weight": np.zeros(1),
        "model.diffusion_model.input_blocks.0.0.weight": np.zeros(1),
        "model.diffusion_model.input_blocks.1.0.in_layers.0.weight": np.zeros(1),
        "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": np.zeros(1),
        "model.diffusion_model.input_blocks.3.0.op.weight": np.zeros(1),
        "model.diffusion_model.input_blocks.4.0.skip_connection.weight": np.zeros(1),
        "model.diffusion_model.middle_block.0.emb_layers.1.weight": np.zeros(1),
        "model.diffusion_model.middle_block.1.proj_in.weight": np.zeros(1),
        "model.diffusion_model.output_blocks.2.1.conv.weight": np.zeros(1),
        "model.diffusion_model.output_blocks.5.2.conv.weight": np.zeros(1),
        "model.diffusion_model.output_blocks.5.1.norm.weight": np.zeros(1),
        "model.diffusion_model.output_blocks.11.0.out_layers.3.weight": np.zeros(1),
        "model.diffusion_model.out.0.weight": np.zeros(1),
        "model.diffusion_model.out.2.weight": np.zeros(1),
    }
    out = convert_ldm_unet_keys(sd)
    expected = {
        "time_embedding.linear_1.weight",
        "conv_in.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "down_blocks.1.resnets.0.conv_shortcut.weight",
        "mid_block.resnets.0.time_emb_proj.weight",
        "mid_block.attentions.0.proj_in.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "up_blocks.1.upsamplers.0.conv.weight",
        "up_blocks.1.attentions.2.norm.weight",
        "up_blocks.3.resnets.2.conv2.weight",
        "conv_norm_out.weight",
        "conv_out.weight",
    }
    assert set(out) == expected


def test_ldm_vae_remap_representative_keys():
    sd = {
        "first_stage_model.encoder.down.0.block.0.norm1.weight": np.zeros(1),
        "first_stage_model.encoder.down.1.downsample.conv.weight": np.zeros(1),
        "first_stage_model.encoder.mid.attn_1.q.weight": np.zeros((4, 4, 1, 1)),
        "first_stage_model.decoder.up.3.block.0.nin_shortcut.weight": np.zeros(1),
        "first_stage_model.decoder.up.1.upsample.conv.weight": np.zeros(1),
        "first_stage_model.decoder.mid.block_2.conv1.weight": np.zeros(1),
        "first_stage_model.quant_conv.weight": np.zeros(1),
        "first_stage_model.encoder.norm_out.weight": np.zeros(1),
    }
    out = convert_ldm_vae_keys(sd)
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in out
    assert "encoder.down_blocks.1.downsamplers.0.conv.weight" in out
    assert out["encoder.mid_block.attentions.0.to_q.weight"].shape == (4, 4)
    assert "decoder.up_blocks.0.resnets.0.conv_shortcut.weight" in out  # up reversed
    assert "decoder.up_blocks.2.upsamplers.0.conv.weight" in out
    assert "decoder.mid_block.resnets.1.conv1.weight" in out
    assert "quant_conv.weight" in out
    assert "encoder.conv_norm_out.weight" in out


# ---------------------------------------------------------------------------
# LoRA merge
# ---------------------------------------------------------------------------


def test_lora_merge_linear_and_conv():
    rng = np.random.RandomState(0)
    unet_sd = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            rng.randn(8, 8).astype(np.float32),
        "down_blocks.0.resnets.0.conv1.weight": rng.randn(8, 4, 3, 3).astype(np.float32),
    }
    text_sd = {
        "text_model.encoder.layers.0.self_attn.q_proj.weight":
            rng.randn(8, 8).astype(np.float32),
    }
    w_lin = unet_sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"].copy()
    w_conv = unet_sd["down_blocks.0.resnets.0.conv1.weight"].copy()
    w_te = text_sd["text_model.encoder.layers.0.self_attn.q_proj.weight"].copy()

    up, down = rng.randn(8, 2).astype(np.float32), rng.randn(2, 8).astype(np.float32)
    cup = rng.randn(8, 2, 1, 1).astype(np.float32)
    cdown = rng.randn(2, 4, 3, 3).astype(np.float32)
    tup, tdown = rng.randn(8, 2).astype(np.float32), rng.randn(2, 8).astype(np.float32)

    lora_sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha": np.float32(2.0),
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": cup,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": cdown,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": tup,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": tdown,
    }
    merged, unmatched = merge_lora_into_state_dict(unet_sd, text_sd, lora_sd, lora_alpha=0.5)
    assert merged == 3 and unmatched == 0

    # linear: alpha=2, rank=2 -> scale = 0.5 * 2/2 = 0.5
    np.testing.assert_allclose(
        unet_sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"],
        w_lin + 0.5 * up @ down, rtol=1e-5,
    )
    # conv: no alpha key -> alpha defaults to rank -> scale = 0.5
    expected_conv = w_conv + 0.5 * np.einsum("or,rikl->oikl", cup[:, :, 0, 0], cdown)
    np.testing.assert_allclose(
        unet_sd["down_blocks.0.resnets.0.conv1.weight"], expected_conv, rtol=1e-5
    )
    np.testing.assert_allclose(
        text_sd["text_model.encoder.layers.0.self_attn.q_proj.weight"],
        w_te + 0.5 * tup @ tdown, rtol=1e-5,
    )
