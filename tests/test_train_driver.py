"""End-to-end trainer driver: overfit a tiny motion module, checkpoint, resume.

VERDICT r4 item 5: the train step existed but nothing drove it — no
clips->latents encode, no caption path, no loop, and the only test asserted
the loss was *finite*. This suite runs `python -m live2diff_tpu.train --tiny`
semantics in-process (main() returns the loss history) and asserts the loss
actually DROPS on a fixed synthetic clip, then that a fresh Trainer restores
the saved TrainState.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_train_driver_overfits_and_resumes(tmp_path):
    from live2diff_tpu import train as T

    ckpt = str(tmp_path / "ckpts")
    stats = T.main([
        "--tiny", "--steps", "20", "--lr", "1e-3", "--log-every", "0",
        "--ckpt-dir", ckpt, "--save-every", "0", "--batch", "2",
    ])
    assert stats["steps"] == 20
    assert np.isfinite(stats["losses"]).all()
    assert stats["loss_tail_mean"] < stats["loss_head_mean"], (
        f"loss did not drop: head {stats['loss_head_mean']:.5f} -> "
        f"tail {stats['loss_tail_mean']:.5f}")

    # resume: a fresh Trainer must come back at step 20 with the trained
    # params (not the random init), and fit() must be a no-op at the target
    cfg = T.TrainerConfig(tiny=True, steps=20, lr=1e-3, ckpt_dir=ckpt,
                          resume=True, log_every=0)
    tr = T.Trainer(cfg)
    assert int(tr.state.step) == 20
    st = tr.fit()
    assert st["steps"] == 0

    # trained params differ from a fresh init (the motion modules moved)
    fresh = T.Trainer(T.TrainerConfig(tiny=True, steps=1, log_every=0))
    import jax

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        tr.state.params, fresh.state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_synthetic_clip_is_deterministic():
    from live2diff_tpu.train import TrainerConfig, synthetic_clips

    cfg = TrainerConfig(tiny=True)
    a = next(synthetic_clips(cfg))
    b = next(synthetic_clips(cfg))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (cfg.batch, cfg.clip_len, cfg.height, cfg.width, 3)
    assert np.abs(a).max() <= 1.0 + 1e-6
