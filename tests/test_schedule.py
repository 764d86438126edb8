"""Golden tests for the LCM schedule math (vs hand-computed diffusers-0.25.0 semantics)."""

import numpy as np

from live2diff_tpu.schedule import (
    LCMSchedule,
    boundary_scalings,
    lcm_timesteps,
    make_betas,
    resolve_t_index_list,
)
import pytest

pytestmark = pytest.mark.fast


def test_linear_betas_match_reference_config():
    betas = make_betas(1000, 0.00085, 0.012, "linear")
    assert betas[0] == pytest.approx(0.00085)
    assert betas[-1] == pytest.approx(0.012)
    assert len(betas) == 1000
    # alphas_cumprod at t=0 is 1 - beta_0
    ac = np.cumprod(1 - betas)
    assert ac[0] == pytest.approx(1 - 0.00085)


def test_lcm_timesteps_full_schedule():
    # 50 steps over the 50-step LCM grid: descending 999, 979, ..., 19
    ts = lcm_timesteps(50)
    assert list(ts[:3]) == [999, 979, 959]
    assert ts[-1] == 19
    assert len(ts) == 50


def test_lcm_timesteps_subsampled():
    # diffusers 0.25.0: floor(linspace(0, 50, 4, endpoint=False)) = [0,12,25,37]
    ts = lcm_timesteps(4)
    assert list(ts) == [999, 759, 499, 259]


def test_t_index_selection_disney():
    # disneyPixar.yaml: num_inference_steps=50, t_index_list=[30, 36, 42]
    t_idx, ts = resolve_t_index_list(50, [30, 36, 42], None)
    subs = [ts[t] for t in t_idx]
    assert subs == [999 - 20 * 30, 999 - 20 * 36, 999 - 20 * 42] == [399, 279, 159]


def test_strength_resolution_pixart():
    # pixart.yaml: num_inference_steps=4, strength=0.6 -> keep last 2 timesteps
    t_idx, ts = resolve_t_index_list(4, None, 0.6)
    assert t_idx == [0, 1]
    assert list(ts) == [499, 259]


def test_boundary_scalings_formula():
    c_skip, c_out = boundary_scalings(np.array([399]))
    st = 3990.0
    assert c_skip[0] == pytest.approx(0.25 / (st**2 + 0.25))
    assert c_out[0] == pytest.approx(st / np.sqrt(st**2 + 0.25))


def test_schedule_create_consistency():
    sched = LCMSchedule.create(50, t_index_list=[30, 36, 42])
    assert sched.num_steps == 3
    assert list(sched.sub_timesteps) == [399, 279, 159]
    betas = make_betas()
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sched.alpha_prod_sqrt, np.sqrt(ac[[399, 279, 159]]), rtol=1e-6)
    np.testing.assert_allclose(
        sched.beta_prod_sqrt, np.sqrt(1 - ac[[399, 279, 159]]), rtol=1e-6
    )
    # x0-prediction identity: at any t, c_skip + c_out * anything is finite and
    # alpha^2 + beta^2 == 1
    np.testing.assert_allclose(
        sched.alpha_prod_sqrt**2 + sched.beta_prod_sqrt**2, 1.0, rtol=1e-5
    )


def test_schedule_from_config_dict():
    sched = LCMSchedule.from_config(
        {"num_train_timesteps": 1000, "beta_start": 0.00085, "beta_end": 0.012,
         "beta_schedule": "linear", "steps_offset": 1, "clip_sample": False},
        num_inference_steps=50,
        t_index_list=[25, 31, 37, 43],  # toonyou.yaml
    )
    assert sched.num_steps == 4
    assert list(sched.sub_timesteps) == [499, 379, 259, 139]
