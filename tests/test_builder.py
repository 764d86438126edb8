"""Builder weight-path tests: LCM-LoRA auto-fuse + textual-inversion wiring.

The reference fuses the LCM-LoRA unconditionally
(/root/reference/live2diff/utils/wrapper.py:421-426,451-452) and applies
textual inversions from ``third_party_dict``
(/root/reference/live2diff/animatediff/converter/convert.py:64-96); these
tests pin both behaviours on synthetic checkpoints so the weight path is
exercised end-to-end without real weights.
"""

import numpy as np
import pytest
from safetensors.numpy import save_file

from live2diff_tpu.builder import build_pipeline, encode_prompt_for_pipeline

from test_convert import TINY, diffusers_unet_keys, flatten, inverse_transform

pytestmark = pytest.mark.fast


def _write_synthetic_base(base_dir, cfg):
    """Write a full synthetic SD-1.5-layout unet safetensors for `cfg`."""
    import jax
    import jax.numpy as jnp

    from live2diff_tpu.convert.torch_to_flax import _leaf_name, unet_key_map
    from live2diff_tpu.models.unet import UNet3DConditionModel
    from live2diff_tpu.stream.state_machine import init_window_state, mask_to_bias

    unet = UNet3DConditionModel(config=cfg, dtype=jnp.float32)
    caches = cfg.init_caches(8, 8, 2, dtype=jnp.float32)
    mask, pe, upd = init_window_state(2)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 1, 8, 8, 4)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 7, cfg.cross_attention_dim)), jnp.zeros((2, 1, 8, 8, 4)),
            caches, "stream", mask_to_bias(mask), pe, upd,
        )
    )
    leaves = flatten(shapes["params"])
    sd = {}
    for tk in diffusers_unet_keys(cfg):
        path, kind = unet_key_map(tk)
        full = path + ((_leaf_name(tk, kind),) if kind != "raw" else ())
        arr = np.random.RandomState(len(sd)).randn(*leaves[full].shape).astype(np.float32)
        sd[tk] = np.ascontiguousarray(inverse_transform(arr, full[-1]))
    (base_dir / "unet").mkdir(parents=True)
    save_file(sd, str(base_dir / "unet" / "diffusion_pytorch_model.safetensors"))


@pytest.fixture(scope="module")
def base_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sd15")
    _write_synthetic_base(d, TINY)
    return d


def _tiny_cfg(base_dir, **extra):
    cfg = {
        "pretrained_model_path": str(base_dir),
        "motion_module_path": str(base_dir / "absent-motion.ckpt"),
        "num_inference_steps": 50,
        "t_index_list": [0, 16],
        "third_party_dict": {},
    }
    cfg.update(extra)
    return cfg


TINY_OVERRIDES = dict(
    block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
    cross_attention_dim=12, norm_num_groups=4, motion_num_attention_heads=2,
)


def test_lcm_lora_auto_fused_into_unet(base_model_dir, tmp_path):
    # conv LoRA on conv_in in kohya dialect, rank 2
    rs = np.random.RandomState(0)
    lora_sd = {
        "lora_unet_conv_in.lora_up.weight": rs.randn(8, 2, 1, 1).astype(np.float32),
        "lora_unet_conv_in.lora_down.weight": rs.randn(2, 4, 3, 3).astype(np.float32),
        "lora_unet_conv_in.alpha": np.asarray(2.0, np.float32),
    }
    lcm_path = tmp_path / "lcm-lora.safetensors"
    save_file(lora_sd, str(lcm_path))

    kw = dict(
        height=64, width=64, use_depth=False, use_tiny_vae=True,
        unet_overrides=TINY_OVERRIDES,
    )
    cfg = _tiny_cfg(base_model_dir)
    plain = build_pipeline(dict(cfg), use_lcm_lora=False, **kw)
    fused = build_pipeline(dict(cfg), use_lcm_lora=True, lcm_lora_path=str(lcm_path), **kw)

    k_plain = np.asarray(plain.unet_params["params"]["conv_in"]["conv"]["kernel"], np.float32)
    k_fused = np.asarray(fused.unet_params["params"]["conv_in"]["conv"]["kernel"], np.float32)
    assert not np.allclose(k_plain, k_fused), "LCM-LoRA was not fused into the UNet"
    # delta magnitude sanity: alpha/rank * up@down, not garbage overwrite
    assert np.isfinite(k_fused).all()
    # untouched params identical
    n_plain = np.asarray(plain.unet_params["params"]["conv_out"]["conv"]["kernel"])
    n_fused = np.asarray(fused.unet_params["params"]["conv_out"]["conv"]["kernel"])
    np.testing.assert_array_equal(n_plain, n_fused)


def test_lcm_lora_default_path_reported_missing(base_model_dir):
    built = build_pipeline(
        _tiny_cfg(base_model_dir), height=64, width=64, use_depth=False,
        unet_overrides=TINY_OVERRIDES,
    )
    assert any("lcm-lora-sdv1-5" in m for m in built.missing_artifacts), (
        "default LCM-LoRA path should be attempted and reported missing"
    )


def test_runtime_lora_rescale_matches_build_time_fuse(base_model_dir, tmp_path):
    """wrapper.update_lora_scale must land on the same weights a fresh build
    at that strength produces — the reference's unfuse->refuse flow without
    the rebuild (ref pipeline/loader.py:9-68)."""
    import jax.numpy as jnp

    from live2diff_tpu.wrapper import StreamV2VWrapper

    rs = np.random.RandomState(3)
    lora_sd = {
        "lora_unet_conv_in.lora_up.weight": rs.randn(8, 2, 1, 1).astype(np.float32),
        "lora_unet_conv_in.lora_down.weight": rs.randn(2, 4, 3, 3).astype(np.float32),
        "lora_unet_conv_in.alpha": np.asarray(2.0, np.float32),
    }
    lpath = tmp_path / "style-lora.safetensors"
    save_file(lora_sd, str(lpath))

    kw = dict(
        height=64, width=64, use_depth=False, use_text_encoder=False,
        unet_overrides=TINY_OVERRIDES, dtype="float32",
    )
    cfg = _tiny_cfg(base_model_dir)

    w = StreamV2VWrapper(dict(cfg), lora_dict={str(lpath): 0.5}, **kw)
    assert any("style-lora" in k for k in w.built.lora_runtime)

    def conv_in_kernel(built):
        return np.asarray(
            built.stream.params["unet"]["params"]["conv_in"]["conv"]["kernel"],
            np.float32,
        )

    # re-strength 0.5 -> 1.25 at runtime; compare against a fresh fuse at 1.25
    n = w.update_lora_scale("style-lora.safetensors", 1.25)
    assert n >= 1
    from live2diff_tpu.builder import build_pipeline

    fresh = build_pipeline(dict(cfg), lora_dict={str(lpath): 1.25},
                           height=64, width=64, use_depth=False,
                           unet_overrides=TINY_OVERRIDES, dtype=jnp.float32)
    np.testing.assert_allclose(
        conv_in_kernel(w.built), conv_in_kernel(fresh), rtol=1e-5, atol=1e-6)

    # back to 0 == LoRA removed entirely
    w.update_lora_scale("style-lora.safetensors", 0.0)
    plain = build_pipeline(dict(cfg), height=64, width=64, use_depth=False,
                           unet_overrides=TINY_OVERRIDES, dtype=jnp.float32)
    np.testing.assert_allclose(
        conv_in_kernel(w.built), conv_in_kernel(plain), rtol=1e-5, atol=1e-6)

    # unknown / ambiguous names fail loudly
    import pytest as _pytest

    with _pytest.raises(KeyError):
        w.update_lora_scale("no-such-lora", 1.0)


def test_textual_inversion_wired_from_third_party_dict(base_model_dir, tmp_path):
    ti_path = tmp_path / "easynegative.safetensors"
    vecs = np.random.RandomState(1).randn(2, 768).astype(np.float32)
    save_file({"emb_params": vecs}, str(ti_path))

    built = build_pipeline(
        _tiny_cfg(
            base_model_dir,
            third_party_dict={"text_embedding_dict": {"easynegative": str(ti_path)}},
        ),
        height=64, width=64, use_depth=False, use_text_encoder=True,
        use_lcm_lora=False, unet_overrides=TINY_OVERRIDES,
    )
    # tokens registered (multi-vector -> numbered tokens)
    assert "easynegative_0" in built.tokenizer.encoder
    assert "easynegative_1" in built.tokenizer.encoder
    # embedding table grew by two rows holding the TI vectors
    table = np.asarray(
        built.text_params["params"]["text_model"]["token_embedding"]["embedding"]
    )
    # params are stored in the compute dtype (bf16) — compare at bf16 precision
    np.testing.assert_allclose(table[-2:].astype(np.float32), vecs, rtol=1e-2, atol=1e-2)
    # and the prompt path still runs with the new token present
    emb = encode_prompt_for_pipeline(built, "easynegative_0 portrait")
    assert emb.shape == (1, 77, 768)
