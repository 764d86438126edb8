"""Torch-free torch-pickle reader (convert/torch_pickle.py).

Round-trips real ``torch.save`` output in both the zip (>=1.6) and legacy
formats, covering the dtypes and layouts the two mandatory reference
artifacts use (live2diff.ckpt: fp32/fp16 motion-module weights under a
``state_dict`` key; dpt_hybrid_384.pt: fp32 DPT weights at top level).
"""

import pickle

import numpy as np
import pytest

from live2diff_tpu.convert.torch_pickle import load_torch_pickle
from live2diff_tpu.convert.torch_to_flax import load_state_dict_file

torch = pytest.importorskip("torch")


def _sample_state_dict():
    g = torch.Generator().manual_seed(0)
    return {
        "conv.weight": torch.randn(4, 3, 3, 3, generator=g),
        "conv.bias": torch.randn(4, generator=g),
        "attn.to_q.weight": torch.randn(8, 8, generator=g, dtype=torch.float32).half(),
        "norm.weight": torch.randn(8, generator=g).to(torch.bfloat16),
        "table.int": torch.arange(10, dtype=torch.int64),
        "flag": torch.tensor([True, False, True]),
    }


def _check(loaded, sd):
    assert set(loaded.keys()) == set(sd.keys())
    for k, v in sd.items():
        ref = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        got = loaded[k]
        assert isinstance(got, np.ndarray), k
        assert got.shape == ref.shape, k
        np.testing.assert_array_equal(got, ref, err_msg=k)


def test_zip_format_roundtrip(tmp_path):
    sd = _sample_state_dict()
    p = tmp_path / "model.pt"
    torch.save(sd, p)
    _check(load_torch_pickle(str(p)), sd)


def test_legacy_format_roundtrip(tmp_path):
    sd = _sample_state_dict()
    p = tmp_path / "model_legacy.pt"
    torch.save(sd, p, _use_new_zipfile_serialization=False)
    _check(load_torch_pickle(str(p)), sd)


def test_ckpt_with_state_dict_wrapper(tmp_path):
    # live2diff.ckpt shape: {"state_dict": {...}, "global_step": int, ...}
    inner = {"mm.weight": torch.randn(2, 2)}
    p = tmp_path / "live2diff_like.ckpt"
    torch.save({"state_dict": inner, "global_step": 1234}, p)
    out = load_state_dict_file(str(p))
    assert list(out.keys()) == ["mm.weight"]
    np.testing.assert_array_equal(out["mm.weight"], inner["mm.weight"].numpy())


def test_noncontiguous_and_shared_storage(tmp_path):
    # torch.save preserves views: transpose + slice share one storage with
    # strides/offset — the reader must honor stride/storage_offset
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {"t": base.t(), "s": base[1:3, 2:5], "base": base}
    p = tmp_path / "views.pt"
    torch.save(sd, p)
    out = load_torch_pickle(str(p))
    np.testing.assert_array_equal(out["t"], base.t().numpy())
    np.testing.assert_array_equal(out["s"], base[1:3, 2:5].numpy())


def test_unknown_global_is_inert_not_executed(tmp_path):
    # weights_only semantics: a pickle referencing os.system must not run it
    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned > /tmp/pwned_torch_pickle",))

    import zipfile

    p = tmp_path / "evil.pt"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    import os

    marker = "/tmp/pwned_torch_pickle"
    if os.path.exists(marker):
        os.remove(marker)
    out = load_torch_pickle(str(p))
    assert not os.path.exists(marker), "unpickler executed arbitrary code"
    assert not isinstance(out["x"], np.ndarray)  # degraded to placeholder


def test_non_tensor_entries_filtered(tmp_path):
    # the reference's live2diff.ckpt carries non-tensor keys ('grid', steps);
    # load_state_dict_file must drop them, as the reference filters them
    # (pipeline_animatediff_depth.py:286-288)
    sd = {"w": torch.ones(3), "epoch": 7, "note": "hello"}
    p = tmp_path / "mixed.ckpt"
    torch.save(sd, p)
    out = load_state_dict_file(str(p))
    assert list(out.keys()) == ["w"]
