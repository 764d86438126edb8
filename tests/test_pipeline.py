"""End-to-end stream runtime tests on a tiny random-weight pipeline (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

H = W = 64  # latent 8x8 (minimum: motion modules exist down to res/8)


pytestmark = pytest.mark.slow

# tiny_pipeline is the session-scoped fixture from conftest.py


def test_prepare_and_stream(tiny_pipeline):
    pipe = tiny_pipeline
    rng = np.random.RandomState(0)
    warmup = rng.rand(8, H, W, 3).astype(np.float32) * 2 - 1
    prompt = jnp.asarray(rng.randn(1, 7, 12), dtype=jnp.float32)

    state, warmup_out = pipe.prepare(warmup, prompt)
    assert warmup_out.shape == (8, H, W, 3)
    assert np.isfinite(warmup_out).all()
    # warmup must fill the sink slots of every step row in every cache
    c0 = np.asarray(state.kv_caches[0])
    assert np.abs(c0[:, :, :, :8, :]).sum() > 0

    outs = []
    for t in range(4):
        frame = rng.rand(H, W, 3).astype(np.float32) * 2 - 1
        state, out = pipe(state, frame)
        outs.append(np.asarray(out))
    assert all(o.shape == (H, W, 3) for o in outs)
    assert all(np.isfinite(o).all() for o in outs)
    assert int(state.frame_idx) == 4
    # outputs must vary frame to frame (stream state is advancing)
    assert np.abs(outs[1] - outs[0]).max() > 1e-6


def test_stream_step_is_deterministic_given_state(tiny_pipeline):
    pipe = tiny_pipeline
    rng = np.random.RandomState(1)
    warmup = rng.rand(8, H, W, 3).astype(np.float32) * 2 - 1
    prompt = jnp.asarray(rng.randn(1, 7, 12), dtype=jnp.float32)
    frame = rng.rand(H, W, 3).astype(np.float32) * 2 - 1

    state_a, _ = pipe.prepare(warmup, prompt, seed=7)
    state_b, _ = pipe.prepare(warmup, prompt, seed=7)
    _, out_a = pipe(state_a, frame)
    _, out_b = pipe(state_b, frame)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0)


def test_burst_matches_sequential_steps(tiny_pipeline):
    """stream_burst (lax.scan, one dispatch) must reproduce N sequential
    __call__ steps exactly: same outputs, same advanced state."""
    pipe = tiny_pipeline
    rng = np.random.RandomState(5)
    warmup = rng.rand(8, H, W, 3).astype(np.float32) * 2 - 1
    prompt = jnp.asarray(rng.randn(1, 7, 12), dtype=jnp.float32)
    frames = rng.rand(4, H, W, 3).astype(np.float32) * 2 - 1

    state_seq, _ = pipe.prepare(warmup, prompt, seed=3)
    seq_outs = []
    for f in frames:
        state_seq, out = pipe(state_seq, f)
        seq_outs.append(np.asarray(out))

    state_b, _ = pipe.prepare(warmup, prompt, seed=3)
    state_b, burst_outs = pipe.stream_burst(state_b, frames)
    burst_outs = np.asarray(burst_outs)

    assert burst_outs.shape == (4, H, W, 3)
    np.testing.assert_allclose(burst_outs, np.stack(seq_outs), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(state_b.update_idx), np.asarray(state_seq.update_idx))
    np.testing.assert_array_equal(
        np.asarray(state_b.rng), np.asarray(state_seq.rng))
    assert int(state_b.frame_idx) == 4


def test_batched_encode_matches_separate(tiny_pipeline):
    """The fused frame+depth VAE encode must equal the two-call encode.

    The step batches ``concat([frame, depth3])`` through ONE vae_encode
    (batch-1 full-res convs are the worst MXU shape); this pins that fusion
    to the reference's separate encode_image/encode_depth semantics
    (pipeline_stream_animation_depth.py:517-571)."""
    import jax

    pipe = tiny_pipeline
    rs = np.random.RandomState(11)
    frames = jnp.asarray(rs.rand(2, H, W, 3).astype(np.float32) * 2 - 1)
    rng = jax.random.PRNGKey(5)

    # stub depth: luminance of the resized input (shape contract of MiDaS)
    def depth_fn(params, x384):
        return x384.mean(axis=-1)

    old_fn, old_p = pipe.depth_fn, pipe.params["depth"]
    pipe.depth_fn = depth_fn
    try:
        x_t, depth_lat = pipe._encode_frame_and_depth(pipe.params, rng, frames)
        x_t_ref = pipe._encode_image(pipe.params, rng, frames)
        depth_ref = pipe._encode_depth(pipe.params, frames)
    finally:
        pipe.depth_fn, pipe.params["depth"] = old_fn, old_p

    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_t_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_lat), np.asarray(depth_ref), atol=1e-5)


def test_pipelined_client_matches_sync(tiny_pipeline):
    """PipelinedStream.map must produce the same outputs as the sync loop,
    in order, for both float32 and uint8 inputs."""
    from live2diff_tpu.stream.client import PipelinedStream

    pipe = tiny_pipeline
    rs = np.random.RandomState(7)
    prompt = jnp.asarray(rs.randn(1, 7, 12).astype(np.float32))
    warmup = rs.rand(8, H, W, 3).astype(np.float32) * 2 - 1
    frames8 = [(rs.rand(H, W, 3) * 255).astype(np.uint8) for _ in range(6)]

    state, _ = pipe.prepare(warmup, prompt, seed=3)
    sync_outs = []
    for f in frames8:
        state, out = pipe(state, f)
        sync_outs.append(np.asarray(out))

    state2, _ = pipe.prepare(warmup, prompt, seed=3)
    ps = PipelinedStream(pipe, state2, max_in_flight=2)
    pipe_outs = [np.asarray(o) for o in ps.map(iter(frames8))]

    assert len(pipe_outs) == len(sync_outs)
    for a, b in zip(sync_outs, pipe_outs):
        np.testing.assert_allclose(a, b, atol=1e-5)
