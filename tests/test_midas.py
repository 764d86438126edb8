"""DPT-hybrid smoke tests on a reduced config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from live2diff_tpu.models.midas import DPTConfig, DPTDepthModel
import pytest

pytestmark = pytest.mark.slow


def test_dpt_tiny_forward():
    cfg = DPTConfig(
        image_size=96, patch_grid=6, vit_hidden=16, vit_layers=4, vit_heads=2,
        vit_mlp=32, hooks=(1, 3), resnet_layers=(1, 1, 1), features=8,
    )
    model = DPTDepthModel(config=cfg)
    x = jnp.zeros((1, 96, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    depth = model.apply(params, jnp.ones((2, 96, 96, 3)) * 0.5)
    assert depth.shape == (2, 96, 96)
    assert np.isfinite(np.asarray(depth)).all()
    assert (np.asarray(depth) >= 0).all()  # non_negative head


def test_dpt_full_config_param_shapes():
    """Full-size config must build the real parameter tree (no forward)."""
    cfg = DPTConfig()
    model = DPTDepthModel(config=cfg)
    x = jnp.zeros((1, 384, 384, 3))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    p = params["params"]
    assert p["pos_embed"].shape == (1, 24 * 24 + 1, 768)
    assert p["patch_embed_proj"]["kernel"].shape == (1, 1, 1024, 768)
    assert "vit_blocks_11" in p
    assert "refinenet1" in p and "stages_2_blocks_8" in p
