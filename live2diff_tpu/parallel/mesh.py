"""Device mesh and sharding rules.

The reference has no distributed layer beyond an optional
``torch.nn.DataParallel`` wrap (/root/reference/live2diff/utils/wrapper.py:152-153);
scaling here is free design space, done the TPU way: a ``jax.sharding.Mesh``
with (dp, tp) axes, GSPMD partitioning via NamedSharding, collectives over ICI.

* dp — data parallel: training clips / serving sessions.
* tp — tensor parallel: attention heads and MLP hidden dims; weight matrices
  shard on their wide dim so matmul partials reduce with one psum over ICI.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Default split: as much tp as divides the device count up to 8 (one ICI
    ring), the rest dp.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 1
        for cand in (8, 4, 2):
            if n % cand == 0:
                tp = cand
                break
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp ({dp}*{tp}) != devices ({n})"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names)


# --- parameter sharding rules -------------------------------------------------
#
# Matched against the '/'-joined flax param path. First match wins.
# Convention: shard the *wide* axis of each projection on tp so the
# activation stays replicated-in, sharded-out, and the pairing
# (to_q/k/v | fc1: out-dim) with (to_out | fc2: in-dim) needs exactly one
# psum per block, inserted automatically by GSPMD.

_TP_RULES: Sequence[Tuple[str, Tuple[Optional[str], ...]]] = (
    # attention qkv: [in, out] -> shard out (heads)
    (r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|attn_qkv)/kernel$", (None, "tp")),
    # attention output proj: [in, out] -> shard in (heads)
    (r"(to_out_0|out_proj|attn_proj)/kernel$", ("tp", None)),
    # MLP up / GEGLU: shard out
    (r"(net_0_proj|mlp_fc1|fc1|linear_1)/kernel$", (None, "tp")),
    # MLP down: shard in
    (r"(net_2|mlp_fc2|fc2|linear_2)/kernel$", ("tp", None)),
    # conv kernels [kh, kw, in, out]: shard out channels
    (r"(conv1|conv2|conv|op)/kernel$", (None, None, None, "tp")),
)


def param_sharding_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter."""
    joined = "/".join(str(p) for p in path)
    for pattern, spec in _TP_RULES:
        if re.search(pattern, joined):
            # only shard if the dim divides; GSPMD requires divisibility
            dims = tuple(
                axis if (axis is None or leaf.shape[i] % _axis_size(axis) == 0) else None
                for i, axis in enumerate(spec[: leaf.ndim])
            )
            if len(dims) == leaf.ndim:
                return P(*dims)
    return P()  # replicate


_MESH_SIZES = {}


def _axis_size(axis: str) -> int:
    return _MESH_SIZES.get(axis, 1)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to the tp rules."""
    global _MESH_SIZES
    _MESH_SIZES = dict(zip(mesh.axis_names, mesh.devices.shape))

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path_entries, leaf):
        path = tuple(
            e.key if hasattr(e, "key") else str(e) for e in path_entries
        )
        spec = param_sharding_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed = [place(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, placed)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/clip) axis on dp."""
    return NamedSharding(mesh, P("dp"))
