"""tools/parity.py end-to-end: the one-command PSNR harness must run the
full build->warmup->stream->score path with only the weight files absent.

With random tiny weights and a fixed seed the pipeline is deterministic, so
scoring a second identical run against the first's output gives PSNR = inf
— proving frame alignment (warmup split + stream-batch lag) and the scoring
path, which is everything except the weights themselves.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")
import parity  # noqa: E402

pytestmark = pytest.mark.slow


def test_parity_self_psnr_is_inf(tmp_path):
    import imageio.v2 as imageio

    vid = tmp_path / "vid"
    vid.mkdir()
    rs = np.random.RandomState(0)
    for i in range(16):
        imageio.imwrite(
            str(vid / f"{i:03d}.png"), (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        )

    out1 = tmp_path / "run1"  # extensionless -> lossless PNG folder
    args = parity.build_argparser().parse_args(
        [str(vid), "configs/toonyou.yaml", "--tiny", "--seed", "7",
         "--output", str(out1)]
    )
    r1 = parity.run(args)
    assert r1["frames"] >= 3
    assert r1["missing_artifacts"] > 0  # no real weights in this environment
    assert r1["value"] is None

    args2 = parity.build_argparser().parse_args(
        [str(vid), "configs/toonyou.yaml", "--tiny", "--seed", "7",
         "--reference", str(out1)]
    )
    r2 = parity.run(args2)
    assert r2["scored_frames"] == r1["frames"]
    assert r2["value"] == float("inf"), f"self-PSNR {r2['value']} != inf"


def test_parity_require_weights_exits(tmp_path):
    import imageio.v2 as imageio

    vid = tmp_path / "vid"
    vid.mkdir()
    for i in range(10):
        imageio.imwrite(str(vid / f"{i:03d}.png"), np.zeros((64, 64, 3), np.uint8))
    args = parity.build_argparser().parse_args(
        [str(vid), "configs/toonyou.yaml", "--tiny", "--require-weights"]
    )
    with pytest.raises(SystemExit) as ei:
        parity.run(args)
    assert ei.value.code == 3


def test_psnr_scoring():
    a = np.zeros((4, 4, 3), np.uint8)
    assert parity.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 255
    assert 0 < parity.psnr(a, b) < 60
    assert json.loads(json.dumps({"v": parity.psnr(a, b)}))["v"] == parity.psnr(a, b)
