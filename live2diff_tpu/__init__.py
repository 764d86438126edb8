"""live2diff_tpu: a TPU-native streaming video-to-video diffusion framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
open-mmlab/Live2Diff (reference: /root/reference): an SD-1.5 UNet inflated
with causal temporal attention (8-frame warmup sink, 16-slot window,
multi-timestep streaming KV-cache), a MiDaS DPT-hybrid depth prior injected
through a ControlNet-style mapping network, LCM stream-batch denoising, and a
jit-compiled per-frame step replacing the reference's TensorRT path.
"""

__version__ = "0.1.0"

from .config import load_config  # noqa: F401
from .schedule import LCMSchedule  # noqa: F401

WARMUP_FRAMES = 8
WINDOW_SIZE = 16
