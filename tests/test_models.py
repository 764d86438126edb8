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
