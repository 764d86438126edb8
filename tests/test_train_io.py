"""Training-side I/O: the clip data pipeline and checkpoint/resume.

The reference is inference-only, so these pin OUR training subsystem's
contracts: clip windowing/shuffling/batch shapes, and a save->restore
round-trip of the full TrainState (params + AdamW moments + step + rng)
that resumes to bit-identical training trajectories.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("vids")
    rs = np.random.RandomState(0)
    # one frame-folder "video" of 20 frames, one of 6 (too short for clip 8)
    long_dir = root / "long"
    long_dir.mkdir()
    for i in range(20):
        imageio.imwrite(str(long_dir / f"{i:03d}.png"),
                        (rs.rand(32, 32, 3) * 255).astype(np.uint8))
    short_dir = root / "short"
    short_dir.mkdir()
    for i in range(6):
        imageio.imwrite(str(short_dir / f"{i:03d}.png"),
                        np.zeros((32, 32, 3), np.uint8))
    return root


def test_clip_dataset_windows_and_batches(video_root):
    from live2diff_tpu.parallel.data import ClipDataset, clip_windows

    assert clip_windows(20, 8, 8) == [(0, 8), (8, 16)]
    assert clip_windows(6, 8, 8) == []

    ds = ClipDataset(str(video_root), clip_len=8, stride=8, height=64, width=64)
    # only the long video contributes: 2 windows
    assert len(ds) == 2
    clip = ds.clip(0)
    assert clip.shape == (8, 64, 64, 3)
    assert clip.dtype == np.float32
    assert -1.0 <= clip.min() and clip.max() <= 1.0

    it = ds.batches(batch_size=2, seed=1)
    batch = next(it)
    assert batch.shape == (2, 8, 64, 64, 3)
    # deterministic shuffling per seed
    it2 = ds.batches(batch_size=2, seed=1)
    np.testing.assert_array_equal(batch, next(it2))


def test_train_state_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig
    from live2diff_tpu.parallel.checkpoint import (
        latest_step_dir,
        restore_train_state,
        save_train_state,
    )
    from live2diff_tpu.parallel.train import TrainState, make_optimizer, make_train_step

    cfg = UNetConfig(
        block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
        cross_attention_dim=12, norm_num_groups=4, motion_num_attention_heads=2,
    )
    unet = UNet3DConditionModel(config=cfg, dtype=jnp.float32)
    b, frames, latent = 2, 2, 8
    batch = {
        "latents": jnp.ones((b, frames, latent, latent, 4), jnp.float32) * 0.1,
        "text": jnp.zeros((b, 7, cfg.cross_attention_dim), jnp.float32),
        "depth": jnp.zeros((b, frames, latent, latent, 4), jnp.float32),
    }
    dummy_caches = tuple(jnp.zeros((0,), jnp.float32) for _ in range(cfg.num_caches()))
    params = unet.init(
        jax.random.PRNGKey(0), batch["latents"], jnp.zeros((b,), jnp.int32),
        batch["text"], batch["depth"], dummy_caches, "clip", None, None, None,
    )
    optimizer = make_optimizer()
    # the train step DONATES its TrainState: keep an undonated copy of the
    # params tree to build the restore template from
    params0 = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params), rng=jax.random.PRNGKey(1))
    step_fn = make_train_step(unet, optimizer)

    state, _ = step_fn(state, batch)  # one step so moments are non-trivial

    path = save_train_state(str(tmp_path / "ckpt" / "step_1"), state)
    template = TrainState(step=jnp.zeros((), jnp.int32), params=params0,
                          opt_state=optimizer.init(params0), rng=jax.random.PRNGKey(9))
    restored = restore_train_state(path, template)

    assert int(restored.step) == 1
    # resuming must continue the EXACT trajectory: same next-step loss
    s_a, loss_a = step_fn(restored, batch)
    # reload again for the comparison run (step_fn donates its input)
    restored2 = restore_train_state(path, template)
    s_b, loss_b = step_fn(restored2, batch)
    assert float(loss_a) == float(loss_b)
    np.testing.assert_array_equal(np.asarray(s_a.rng), np.asarray(s_b.rng))

    assert latest_step_dir(str(tmp_path / "ckpt")) == path
    assert latest_step_dir(str(tmp_path / "nope")) is None
