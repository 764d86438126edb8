"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from live2diff_tpu.parallel.mesh import make_mesh, shard_params
from live2diff_tpu.parallel.train import train_step_dryrun


def test_mesh_shapes():
    n = len(jax.devices())
    assert n == 8, f"conftest should give 8 cpu devices, got {n}"
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "tp")


def test_train_step_dryrun_8dev():
    loss = train_step_dryrun(8)
    assert np.isfinite(loss)


def test_train_step_dryrun_2dev():
    loss = train_step_dryrun(2)
    assert np.isfinite(loss)
