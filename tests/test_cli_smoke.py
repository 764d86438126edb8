"""Whole-CLI smoke: ``cli.py`` decode -> prepare -> stream -> video file,
then score the written video through ``tools/psnr.py`` — the full offline
vid2vid chain the reference's test.py provides (VERDICT r3 item 4: the CLI
main itself never ran in CI; tools/parity.py covers its own path but not
``python -m live2diff_tpu.cli``).

Two identical tiny runs must produce PSNR = inf between their outputs
(fixed seed, deterministic pipeline), proving decode, warmup split, lag
handling, the video writer, and the scoring tool end-to-end.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from live2diff_tpu import cli

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    import imageio.v2 as imageio

    vid = tmp_path_factory.mktemp("vid")
    rs = np.random.RandomState(0)
    base = rs.rand(64, 64, 3)
    for i in range(14):
        frame = np.clip(base + 0.05 * rs.rand(64, 64, 3), 0, 1)
        imageio.imwrite(str(vid / f"{i:03d}.png"), (frame * 255).astype(np.uint8))
    return vid


def test_cli_to_video_to_psnr(frame_dir, tmp_path):
    out1 = tmp_path / "a.gif"
    out2 = tmp_path / "b.gif"
    for out in (out1, out2):
        rc = cli.main([
            str(frame_dir), "configs/toonyou.yaml", "--tiny", "--seed", "11",
            "--output", str(out), "--prompt", "a cat",
        ])
        assert rc == 0
        assert out.exists() and out.stat().st_size > 0

    # score via the actual tools/psnr.py entry point (subprocess = the real
    # user command line)
    proc = subprocess.run(
        [sys.executable, "tools/psnr.py", str(out1), str(out2)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["metric"] == "psnr_vs_reference"
    assert result["frames"] >= 3
    # GIF palette quantisation is lossy-but-deterministic: identical runs
    # must produce IDENTICAL files -> infinite PSNR
    assert result["value"] == float("inf"), result


def test_cli_rejects_short_video(tmp_path):
    import imageio.v2 as imageio

    vid = tmp_path / "short"
    vid.mkdir()
    for i in range(4):
        imageio.imwrite(str(vid / f"{i}.png"), np.zeros((64, 64, 3), np.uint8))
    rc = cli.main([str(vid), "configs/toonyou.yaml", "--tiny"])
    assert rc == 2
