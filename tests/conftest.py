"""Test env: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon before conftest runs, so we override the platform via
jax.config (effective because backends initialise lazily) — this keeps the
suite off the TPU tunnel and makes startup ~2s instead of ~60s.

Compiles dominate the suite's wall time, so the JAX persistent compilation
cache is enabled at a repo-local dir: re-runs (and the second pipeline
build inside one run) load executables from disk instead of recompiling.
"""

import os

# must be set before the first backend initialisation
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# the CPU AOT loader logs a spurious machine-feature-mismatch ERROR for every
# cache hit (XLA tuning pseudo-features like +prefer-no-scatter are compared
# against real host features); same-host caching is safe, silence it
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_tests")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


TINY_H = TINY_W = 64  # latent 8x8 (minimum: motion modules exist down to res/8)


@pytest.fixture(scope="session")
def tiny_pipeline():
    """One tiny random-weight StreamDiffusionDepth shared by the whole run.

    The pipeline object is stateless (stream state is passed explicitly), so
    sharing it across modules is safe and saves one full prepare+step compile
    per module that needs an end-to-end pipeline.
    """
    from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig
    from live2diff_tpu.models.vae import TinyAutoencoder
    from live2diff_tpu.schedule import LCMSchedule
    from live2diff_tpu.stream.pipeline import StreamConfig, StreamDiffusionDepth
    from live2diff_tpu.stream.state_machine import init_window_state, mask_to_bias

    ucfg = UNetConfig(
        block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
        cross_attention_dim=12, norm_num_groups=4, motion_num_attention_heads=2,
    )
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.float32)
    sched = LCMSchedule.create(50, t_index_list=[30, 40])
    scfg = StreamConfig(height=TINY_H, width=TINY_W, vae_scaling=1.0,
                        cache_dtype=jnp.float32)

    n = sched.num_steps
    lh, lw = scfg.latent_height, scfg.latent_width
    caches = ucfg.init_caches(lh, lw, n, dtype=jnp.float32)
    mask, pe_idx, update_idx = init_window_state(n)
    unet_params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((n, 1, lh, lw, 4)), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 7, 12)), jnp.zeros((n, 1, lh, lw, 4)),
        caches, "stream", mask_to_bias(mask), pe_idx, update_idx,
    )

    vae = TinyAutoencoder(hidden=8)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, TINY_H, TINY_W, 3)))
    return StreamDiffusionDepth(
        unet, unet_params, sched, scfg,
        lambda p, x: vae.apply(p, x, method=vae.encode),
        lambda p, z: vae.apply(p, z, method=vae.decode),
        depth_fn=None, vae_params=vae_params,
    )
