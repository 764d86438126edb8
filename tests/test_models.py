"""Shape/smoke tests for the model zoo on tiny configs (CPU, fp32)."""

import jax
import jax.numpy as jnp
import numpy as np

from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig
from live2diff_tpu.models.vae import AutoencoderKL, TinyAutoencoder, VAEConfig
from live2diff_tpu.stream.state_machine import init_window_state, mask_to_bias
import pytest

pytestmark = pytest.mark.slow

TINY = UNetConfig(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    motion_num_attention_heads=2,
)


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet3DConditionModel(config=TINY, dtype=jnp.float32)
    steps, lh, lw = 2, 16, 16
    caches = TINY.init_caches(lh, lw, steps, dtype=jnp.float32)
    sample = jnp.zeros((steps, 1, lh, lw, 4))
    depth = jnp.zeros_like(sample)
    t = jnp.array([399, 159], dtype=jnp.int32)
    text = jnp.zeros((steps, 7, TINY.cross_attention_dim))
    mask, pe_idx, update_idx = init_window_state(steps)
    bias = mask_to_bias(mask)
    params = model.init(
        jax.random.PRNGKey(0), sample, t, text, depth, caches,
        "stream", bias, pe_idx, update_idx,
    )
    return model, params, (sample, t, text, depth, caches, bias, pe_idx, update_idx)


def test_motion_module_layout_counts():
    # 4 down blocks x 2 layers + 4 up blocks x 3 layers = 20 modules, 40 caches
    assert len(TINY.motion_module_layout()) == 20
    assert TINY.num_caches() == 40
    shapes = TINY.cache_shapes(16, 16, 2)
    assert shapes[0] == (2, 2, 16, 8, 256)  # [steps, kv, window, C, HW]
    assert shapes[-1] == (2, 2, 16, 8, 256)
    # mid-resolution block: 16/4=4 -> hw=16... check one deep cache
    assert (2, 2, 16, 16, 16) in shapes


def test_unet_stream_forward(tiny_unet):
    model, params, args = tiny_unet
    sample, t, text, depth, caches, bias, pe_idx, update_idx = args
    out, new_caches = model.apply(
        params, sample, t, text, depth, caches, "stream", bias, pe_idx, update_idx
    )
    assert out.shape == sample.shape
    assert len(new_caches) == 40
    assert all(c.shape == o.shape for c, o in zip(new_caches, caches))
    assert np.isfinite(np.asarray(out)).all()
    # caches must have been written at update_idx slots
    c0 = np.asarray(new_caches[0])  # [steps, kv, window, HW, C]
    assert np.abs(c0[0, :, 8]).sum() > 0  # row 0 writes slot 8


def test_unet_warmup_forward(tiny_unet):
    model, params, args = tiny_unet
    _, _, text, _, caches, _, _, _ = args
    f = 8
    sample = jnp.ones((1, f, 16, 16, 4)) * 0.1
    depth = jnp.zeros_like(sample)
    t = jnp.array([399], dtype=jnp.int32)
    out, new_caches = model.apply(
        params, sample, t, text[:1], depth, caches, "warmup",
        None, None, None, 1,
    )
    assert out.shape == sample.shape
    c0 = np.asarray(new_caches[0])  # [steps, kv, window, HW, C]
    # warmup writes slots 0..7 of step-row 1 only
    assert np.abs(c0[1, :, :8]).sum() > 0
    assert np.abs(c0[0]).sum() == 0


def test_unet_depth_branch_is_zero_init(tiny_unet):
    """A fresh MappingNetwork must be a no-op (zero-init out conv)."""
    model, params, args = tiny_unet
    sample, t, text, depth, caches, bias, pe_idx, update_idx = args
    out1, _ = model.apply(
        params, sample, t, text, depth, caches, "stream", bias, pe_idx, update_idx
    )
    out2, _ = model.apply(
        params, sample, t, text, depth + 123.0, caches, "stream", bias, pe_idx, update_idx
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), norm_num_groups=4)
    vae = AutoencoderKL(config=cfg)
    x = jnp.zeros((2, 64, 64, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (2, 8, 8, 4)
    y = vae.apply(params, z, method=vae.decode)
    assert y.shape == (2, 64, 64, 3)


def test_tiny_vae_roundtrip_shapes():
    vae = TinyAutoencoder(hidden=8)
    x = jnp.zeros((1, 64, 64, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 8, 8, 4)
    y = vae.apply(params, z, method=vae.decode)
    assert y.shape == (1, 64, 64, 3)


# ---------------------------------------------------------------------------
# strict reference-config validation (VERDICT r2 item 6)
# ---------------------------------------------------------------------------

_REF_UA = {
    "cond_mapping": True,
    "use_inflated_groupnorm": True,
    "use_motion_module": True,
    "motion_module_resolutions": [1, 2, 4, 8],
    "unet_use_cross_frame_attention": False,
    "unet_use_temporal_attention": False,
    "motion_module_type": "Streaming",
    "motion_module_kwargs": {
        "num_attention_heads": 8,
        "num_transformer_block": 1,
        "attention_block_types": ["Temporal_Self", "Temporal_Self"],
        "temporal_position_encoding": True,
        "temporal_position_encoding_max_len": 24,
        "temporal_attention_dim_div": 1,
        "zero_initialize": True,
        "attention_class_name": "stream",
        "attention_kwargs": {"window_size": 16, "sink_size": 8},
    },
}


def _ref_cfg(**ua_overrides):
    import copy

    ua = copy.deepcopy(_REF_UA)
    ua.update(ua_overrides)
    return {"unet_additional_kwargs": ua}


def test_full_reference_base_config_accepted():
    # every key the reference's base_config.yaml:8-28 ships must parse
    cfg = UNetConfig.from_reference_config(_ref_cfg())
    assert cfg.window_size == 16 and cfg.sink_size == 8
    assert cfg.motion_num_attention_heads == 8


def test_typo_key_fails_loudly():
    import pytest

    with pytest.raises(ValueError, match="use_inflated_groupnrom"):
        UNetConfig.from_reference_config(_ref_cfg(use_inflated_groupnrom=True))


def test_unknown_motion_module_key_fails():
    import copy, pytest

    ua = copy.deepcopy(_REF_UA)
    ua["motion_module_kwargs"]["casual_mask"] = True  # typo of a hypothetical key
    with pytest.raises(ValueError, match="casual_mask"):
        UNetConfig.from_reference_config({"unet_additional_kwargs": ua})


def test_unknown_attention_key_fails():
    import copy, pytest

    ua = copy.deepcopy(_REF_UA)
    ua["motion_module_kwargs"]["attention_kwargs"]["widnow_size"] = 16
    with pytest.raises(ValueError, match="widnow_size"):
        UNetConfig.from_reference_config({"unet_additional_kwargs": ua})


def test_cross_frame_attention_config_roundtrip():
    """unet_use_cross_frame_attention: true selects SparseCausalAttention."""
    cfg = UNetConfig.from_reference_config(
        _ref_cfg(unet_use_cross_frame_attention=True)
    )
    assert cfg.unet_use_cross_frame_attention is True
    cfg_off = UNetConfig.from_reference_config(_ref_cfg())
    assert cfg_off.unet_use_cross_frame_attention is False


def test_unsupported_fixed_value_fails():
    import pytest

    with pytest.raises(ValueError, match="use_inflated_groupnorm"):
        UNetConfig.from_reference_config(_ref_cfg(use_inflated_groupnorm=False))


def test_shipped_configs_all_validate():
    # the six style configs + base must pass the strict surface
    import pathlib

    from live2diff_tpu.config import load_config

    cfg_dir = pathlib.Path(__file__).resolve().parents[1] / "configs"
    for path in sorted(cfg_dir.glob("*.yaml")):
        cfg = load_config(str(path))
        UNetConfig.from_reference_config(dict(cfg))
