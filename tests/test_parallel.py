"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from live2diff_tpu.parallel.mesh import make_mesh, shard_params
from live2diff_tpu.parallel.train import train_step_dryrun
import pytest

pytestmark = pytest.mark.slow


def test_mesh_shapes():
    n = len(jax.devices())
    assert n == 8, f"conftest should give 8 cpu devices, got {n}"
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "tp")


def test_train_step_dryrun_8dev():
    loss = train_step_dryrun(8)
    assert np.isfinite(loss)


def test_mesh_2dev_sharding_specs():
    """2-device mesh factorization + shard specs, without recompiling the
    full fwd+bwd train step (the 8-dev test already executes it; compiling
    it twice cost ~100 s of the slow tier for no extra coverage — the
    tp=2 regex coverage is pinned by test_tp_rules_match_real_unet_tree)."""
    mesh = make_mesh(2)
    assert mesh.devices.size == 2
    x = jnp.zeros((4, 8))
    sharded = shard_params({"attn1": {"to_q": {"kernel": x}}}, mesh)
    assert sharded["attn1"]["to_q"]["kernel"].shape == (4, 8)


def test_stream_step_tp_dryrun():
    from live2diff_tpu.parallel.infer import stream_step_tp_dryrun

    assert np.isfinite(stream_step_tp_dryrun(8))


def test_multi_session_dp_dryrun():
    from live2diff_tpu.parallel.infer import multi_session_dp_dryrun

    assert np.isfinite(multi_session_dp_dryrun(8))


def test_tp_rules_match_real_unet_tree():
    """The _TP_RULES regexes must actually hit the flagship UNet's params.

    A silent regex-vs-tree drift degrades to full replication with zero
    errors; this pins the coverage: ≥90% of attention/feed-forward matmul
    bytes in the full SD-1.5 + motion-module tree get a tp axis (at tp=2,
    which divides every head/hidden dim in the architecture).
    """
    from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig
    from live2diff_tpu.parallel import mesh as pmesh

    cfg = UNetConfig()  # flagship architecture, real param names
    unet = UNet3DConditionModel(config=cfg, dtype=jnp.bfloat16)
    caches = tuple(
        jax.ShapeDtypeStruct(s, jnp.bfloat16)
        for s in cfg.cache_shapes(8, 8, 2)
    )
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 1, 8, 8, 4), jnp.bfloat16),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 7, cfg.cross_attention_dim), jnp.bfloat16),
            jnp.zeros((2, 1, 8, 8, 4), jnp.bfloat16),
            tuple(jnp.zeros(c.shape, c.dtype) for c in caches),
            "stream",
            jnp.zeros((2, 16), jnp.bfloat16),
            jnp.zeros((2, 16), jnp.int32),
            jnp.zeros((2,), jnp.int32),
        )
    )

    old_sizes = dict(pmesh._MESH_SIZES)
    pmesh._MESH_SIZES = {"dp": 4, "tp": 2}
    try:
        flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
        hit_b = miss_b = 0
        missed = []
        for path_entries, leaf in flat:
            path = tuple(str(getattr(e, "key", e)) for e in path_entries)
            joined = "/".join(path)
            # attention + feed-forward projection matmuls: the tp targets
            is_target = leaf.ndim == 2 and path[-1] == "kernel" and any(
                seg in joined for seg in ("attn1", "attn2", "attention_blocks", "/ff/", "ff_")
            ) and not any(seg in joined for seg in ("proj_in", "proj_out"))
            if not is_target:
                continue
            spec = pmesh.param_sharding_spec(path, leaf)
            nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            if any(ax is not None for ax in spec):
                hit_b += nbytes
            else:
                miss_b += nbytes
                missed.append(joined)
        assert hit_b + miss_b > 0, "no attention/ff kernels found — path drift"
        frac = hit_b / (hit_b + miss_b)
        assert frac >= 0.9, (
            f"only {frac:.0%} of attention/ff kernel bytes tp-sharded; "
            f"missed e.g. {missed[:5]}"
        )
    finally:
        pmesh._MESH_SIZES = old_sizes
