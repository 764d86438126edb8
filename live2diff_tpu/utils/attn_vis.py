"""Attention-map visualisation / window-state debug utilities.

Parity surface: the reference ships ``AttnMapVisualizer`` with a static
``visualize_attn_map(attn_map, save_path)`` renderer (its instance hooks are
empty stubs; /root/reference/live2diff/animatediff/models/attention.py:
624-648, dev-only, never wired into the pipeline). :func:`visualize_attn_map`
matches that renderer; the rest of this module adds the stream-runtime
diagnostics that are actually useful here: per-step window visibility /
PE / update-slot plots and per-module cache-slot energy, all computed from a
``StreamState`` without touching the hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def visualize_attn_map(attn_map: np.ndarray, save_path: str) -> None:
    """Render a single attention matrix with grid + colorbar (ref parity)."""
    from matplotlib import pyplot as plt

    attn_map = np.asarray(attn_map)
    plt.figure()
    plt.imshow(attn_map)
    ax = plt.gca()
    ax.set_xticks(np.arange(-0.5, attn_map.shape[0] - 1, 1))
    ax.set_yticks(np.arange(-0.5, attn_map.shape[1] - 1, 1))
    ax.set_xticklabels(np.arange(0, attn_map.shape[0], 1))
    ax.set_yticklabels(np.arange(0, attn_map.shape[1], 1))
    ax.grid(color="r", linestyle="-", linewidth=1)
    plt.colorbar()
    plt.savefig(save_path)
    plt.close()
    print(f"Saved to {save_path}")


def window_state_figure(state, save_path: Optional[str] = None):
    """Plot the streaming window state: visibility mask, PE indices, and
    update slots per denoising step — the attn_bias/pe_idx/update_idx
    machine the reference updates on host
    (pipeline_stream_animation_depth.py:403-438).
    """
    from matplotlib import pyplot as plt

    mask = np.asarray(state.attn_mask)
    pe = np.asarray(state.pe_idx)
    upd = np.asarray(state.update_idx)
    steps, window = mask.shape

    fig, axes = plt.subplots(1, 2, figsize=(2 + window * 0.45, 2 + steps * 0.5))
    axes[0].imshow(mask, cmap="Greens", vmin=0, vmax=1, aspect="auto")
    axes[0].set_title("visible slots")
    axes[1].imshow(pe, cmap="viridis", aspect="auto")
    axes[1].set_title("PE index per slot")
    for ax in axes:
        ax.set_xlabel("window slot")
        ax.set_ylabel("denoise step")
        ax.set_xticks(range(window))
        ax.set_yticks(range(steps))
    for s in range(steps):
        axes[0].plot(upd[s], s, "r*", markersize=14)
        for w in range(window):
            axes[1].text(w, s, str(pe[s, w]), ha="center", va="center",
                         color="w", fontsize=7)
    axes[0].plot([], [], "r*", label="next write slot")
    axes[0].legend(loc="upper right", fontsize=7)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        print(f"Saved to {save_path}")
    return fig


def cache_slot_energy(state) -> np.ndarray:
    """[num_modules, steps, window] L2 norm of each cache slot's K —
    shows sink persistence vs rolling eviction at a glance."""
    rows = []
    for cache in state.kv_caches:
        data = cache[0] if isinstance(cache, tuple) else cache  # int8: (data, scales)
        arr = np.asarray(data, np.float32)  # [steps, 2, window, C, HW]
        rows.append(np.sqrt((arr[:, 0] ** 2).mean(axis=(-1, -2))))
    return np.stack(rows)


def cache_energy_figure(state, save_path: Optional[str] = None):
    """Heatmap of per-slot cache energy for every motion module."""
    from matplotlib import pyplot as plt

    energy = cache_slot_energy(state)  # [modules, steps, window]
    n_mod, steps, window = energy.shape
    fig, axes = plt.subplots(1, steps, figsize=(3 * steps + 2, 0.25 * n_mod + 2),
                             squeeze=False)
    for s in range(steps):
        ax = axes[0][s]
        im = ax.imshow(energy[:, s], aspect="auto", cmap="magma")
        ax.set_title(f"denoise step {s}")
        ax.set_xlabel("window slot")
        ax.set_ylabel("motion module (traversal order)")
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        print(f"Saved to {save_path}")
    return fig
