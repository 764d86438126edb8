"""StreamV2VWrapper behaviour: prompt templating + frame-step pre-warm.

Pins two reference-parity behaviours on a tiny random-weight pipeline:

* ``update_prompt`` must expand the style prompt template exactly like
  ``prepare`` does (the reference feeds the templated text everywhere;
  /root/reference/live2diff/utils/wrapper.py:160-199,249-252) — a
  mid-stream prompt change must not silently drop the style prefix;
* ``prepare`` pre-compiles and dry-runs the per-frame program (the
  reference's warmup_engine dummy runs,
  /root/reference/live2diff/pipeline_stream_animation_depth.py:346-366)
  so the first user frame runs at steady-state latency.
"""

import numpy as np
import pytest

from live2diff_tpu.wrapper import StreamV2VWrapper

from live2diff_tpu.models.unet import UNetConfig

from test_builder import _tiny_cfg, _write_synthetic_base  # noqa: F401

pytestmark = pytest.mark.slow  # builds + compiles a pipeline

# cross_attention_dim must match the real CLIP encoder's 768-wide output —
# the wrapper always runs prompts through the text encoder
WRAPPER_OVERRIDES = dict(
    block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
    cross_attention_dim=768, norm_num_groups=4, motion_num_attention_heads=2,
)


@pytest.fixture(scope="module")
def wrapper_base_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sd15_768")
    _write_synthetic_base(d, UNetConfig(**WRAPPER_OVERRIDES))
    return d


@pytest.fixture(scope="module")
def wrapper(wrapper_base_dir):
    cfg = _tiny_cfg(wrapper_base_dir,
                    prompt_template="masterpiece, {}, best quality")
    return StreamV2VWrapper(
        cfg, height=64, width=64, use_depth=False, output_type="np",
        dtype="float32", unet_overrides=WRAPPER_OVERRIDES, seed=3,
    )


def test_update_prompt_uses_style_template(wrapper):
    """update_prompt must produce the same embedding prepare() would."""
    via_template = np.asarray(wrapper.encode_prompt("a cat"))

    wrapper.update_prompt("a cat")
    after_update = np.asarray(wrapper.stream._prompt_embeds)

    # stream broadcasts [1,77,768] -> [num_steps,77,768]
    np.testing.assert_array_equal(after_update[0], via_template[0])

    # and it must differ from the raw (untemplated) encoding
    from live2diff_tpu.builder import encode_prompt_for_pipeline

    raw = np.asarray(encode_prompt_for_pipeline(wrapper.built, "a cat"))
    assert not np.array_equal(after_update[0], raw[0])


def test_prepare_prewarms_frame_step(wrapper):
    frames = np.zeros((8, 64, 64, 3), np.float32)
    out = wrapper.prepare("a dog", frames)
    assert out.shape[-3:] == (64, 64, 3)

    # the dummy run compiled the per-frame program
    assert wrapper.first_step_warm_s > 0.0
    n_compiled = wrapper.stream._jit_step._cache_size()
    assert n_compiled >= 1

    # the first real frame must reuse the cached executable (no new trace)
    result = wrapper.img2img(np.zeros((64, 64, 3), np.float32))
    assert wrapper.stream._jit_step._cache_size() == n_compiled
    assert np.asarray(result).shape[-3:] == (64, 64, 3)


def test_prepare_warm_step_opt_out(wrapper_base_dir):
    cfg = _tiny_cfg(wrapper_base_dir)
    w = StreamV2VWrapper(
        cfg, height=64, width=64, use_depth=False, output_type="np",
        dtype="float32", unet_overrides=WRAPPER_OVERRIDES,
    )
    w.prepare("x", np.zeros((8, 64, 64, 3), np.float32), warm_step=False)
    assert w.first_step_warm_s == 0.0
