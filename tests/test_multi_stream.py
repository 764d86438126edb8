"""Multi-session batched serving must match per-session streaming exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from live2diff_tpu.stream.multi import MultiStream

H = W = 64


pytestmark = pytest.mark.slow


@pytest.fixture(scope="session")
def pipe(tiny_pipeline):
    return tiny_pipeline


def test_batched_sessions_match_individual(pipe):
    rng = np.random.RandomState(0)
    S = 2
    warmups = rng.rand(S, 8, H, W, 3).astype(np.float32) * 2 - 1
    prompts = jnp.asarray(rng.randn(S, 7, 12), jnp.float32)
    frames = rng.rand(2, S, H, W, 3).astype(np.float32) * 2 - 1

    # batched
    multi = MultiStream(pipe, S)
    states, _ = multi.prepare(warmups, prompts, seeds=[3, 4])
    outs_batched = []
    for t in range(2):
        states, out = multi(states, frames[:, :][t])
        outs_batched.append(np.asarray(out))

    # individual sessions
    for s in range(S):
        state, _ = pipe.prepare(warmups[s], prompts[s][None], seed=3 + s)
        for t in range(2):
            state, out = pipe(state, frames[t, s])
        np.testing.assert_allclose(
            outs_batched[1][s], np.asarray(out), rtol=2e-4, atol=2e-4,
            err_msg=f"session {s} batched != individual",
        )


def test_incremental_admission_matches_bulk_prepare(pipe):
    """prepare_session (dynamic user admission) == bulk prepare()."""
    rng = np.random.RandomState(1)
    S = 2
    warmups = rng.rand(S, 8, H, W, 3).astype(np.float32) * 2 - 1
    prompts = jnp.asarray(rng.randn(S, 7, 12), jnp.float32)
    frame = rng.rand(S, H, W, 3).astype(np.float32) * 2 - 1

    bulk = MultiStream(pipe, S)
    states_b, _ = bulk.prepare(warmups, prompts, seeds=[3, 4])
    states_b, out_b = bulk(states_b, frame)

    inc = MultiStream(pipe, S)
    states_i = None
    # admit sessions one at a time, out of order, like server slot admission
    for slot, seed in ((1, 4), (0, 3)):
        states_i, _ = inc.prepare_session(
            states_i, slot, warmups[slot], prompts[slot], seed=seed
        )
    states_i, out_i = inc(states_i, frame)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_i), rtol=2e-4, atol=2e-4,
        err_msg="incremental admission diverged from bulk prepare",
    )


def test_idle_slot_state_unchanged(pipe):
    """A session masked inactive must come out of a batched round with its
    state bit-identical (VERDICT r4 item 9: idle demo slots advanced their
    KV windows on replayed frames)."""
    import jax

    rng = np.random.RandomState(2)
    S = 2
    warmups = rng.rand(S, 8, H, W, 3).astype(np.float32) * 2 - 1
    prompts = jnp.asarray(rng.randn(S, 7, 12), jnp.float32)
    multi = MultiStream(pipe, S)
    states, _ = multi.prepare(warmups, prompts, seeds=[3, 4])

    before = jax.tree_util.tree_map(np.asarray, states)
    frames = rng.rand(S, H, W, 3).astype(np.float32) * 2 - 1
    states, out = multi(states, frames, active=np.array([True, False]))

    after = jax.tree_util.tree_map(np.asarray, states)
    flat_b, _ = jax.tree_util.tree_flatten(before)
    flat_a, _ = jax.tree_util.tree_flatten(after)
    changed = [not np.array_equal(b[0], a[0]) for b, a in zip(flat_b, flat_a)]
    assert any(changed), "active slot 0 did not step"
    for i, (b, a) in enumerate(zip(flat_b, flat_a)):
        np.testing.assert_array_equal(
            b[1], a[1], err_msg=f"idle slot 1 leaf {i} changed")

    # the idle slot, fed later, must match a never-idled session exactly
    states, out = multi(states, frames, active=np.array([False, True]))
    state1, _ = pipe.prepare(warmups[1], prompts[1][None], seed=4)
    state1, out1 = pipe(state1, frames[1])
    np.testing.assert_allclose(
        np.asarray(out)[1], np.asarray(out1), rtol=2e-4, atol=2e-4,
        err_msg="idle-then-fed session diverged from an un-idled one",
    )


def test_program_cache_shared_across_instances():
    """Two MultiStream instances over the same pipeline must share compiled
    programs (jax.jit caches by function identity; per-instance vmap
    wrappers re-traced AND re-compiled the batched step — ~90 s each on
    CPU, worse on-chip when a server resizes its session pool)."""
    from live2diff_tpu.stream import multi as M

    class FakeStream:  # only the attributes _programs_for touches
        def _frame_step(self, params, state, frame, prompt):
            return state, frame

        def _warmup_denoise(self, params, state, frames, prompt):
            return state, frames

    s = FakeStream()
    a = M.MultiStream(s, 2)
    b = M.MultiStream(s, 2)
    assert a._jit_step_masked is b._jit_step_masked
    assert a._jit_step_all is b._jit_step_all
    assert a._jit_prepare is b._jit_prepare
    assert a._write_slot is b._write_slot
    c = M.MultiStream(s, 3)
    assert c._jit_step_all is not a._jit_step_all  # different S = different program
    # cache is weak on the stream: no leak when the pipeline dies
    import weakref
    ref = weakref.ref(s)
    del s, a, b, c
    import gc
    gc.collect()
    assert ref() is None
