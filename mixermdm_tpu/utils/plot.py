"""Visualisation: 3D skeleton animations + influence-weight plots.

Parity source ``/root/reference/src/utils/plot.py``: ``plot_3d_motion``:13
(matplotlib 3D skeleton video over the HML kinematic chain) and the
per-mixing-mode influence visualisations ``plot_influence_{1..4}``
:134-352 (denoise-step x joint weight surfaces, saved as PDF).
"""

from __future__ import annotations

import numpy as np

from .constants import HML_KINEMATIC_CHAIN, NUM_JOINTS

_COLORS = ["#DD5A37", "#D69E00", "#B75A39", "#DD5A37", "#D69E00"]
_COLORS_P2 = ["#4D84AA", "#5B9965", "#61CEB9", "#4D84AA", "#5B9965"]


def _extract_joints(motion: np.ndarray) -> list[np.ndarray]:
    """(T, 262) or (T, 524) feature vectors -> per-person (T, 22, 3)."""
    persons = []
    n_persons = motion.shape[-1] // 262
    for p in range(max(1, n_persons)):
        feats = motion[..., p * 262 : (p + 1) * 262]
        persons.append(feats[..., : NUM_JOINTS * 3].reshape(-1, NUM_JOINTS, 3))
    return persons


def plot_3d_motion(save_path: str, motion: np.ndarray, title: str = "",
                   fps: int = 30, radius: float = 2.0):
    """Render a skeleton animation to mp4/gif (plot.py:13-131)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    persons = _extract_joints(np.asarray(motion))
    T = persons[0].shape[0]

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")

    def update(frame):
        ax.clear()
        ax.set_title(title, fontsize=9)
        ax.set_xlim(-radius, radius)
        ax.set_ylim(0, radius)
        ax.set_zlim(-radius, radius)
        ax.view_init(elev=110, azim=-90)
        ax.axis("off")
        for pi, joints in enumerate(persons):
            colors = _COLORS if pi == 0 else _COLORS_P2
            j = joints[frame]
            for ci, chain in enumerate(HML_KINEMATIC_CHAIN):
                idx = list(chain)
                ax.plot3D(j[idx, 0], j[idx, 1], j[idx, 2],
                          linewidth=2.0, color=colors[ci % len(colors)])

    anim = FuncAnimation(fig, update, frames=T, interval=1000 / fps)
    try:
        anim.save(save_path, fps=fps)
    except (ValueError, RuntimeError):
        # No ffmpeg: fall back to an animated gif via Pillow.
        save_path = save_path.rsplit(".", 1)[0] + ".gif"
        anim.save(save_path, fps=fps, writer="pillow")
    plt.close(fig)
    return save_path


def plot_influence(save_path: str, influence: np.ndarray, mixing_mode: int = 4):
    """Influence visualisation dispatched per mode (plot.py:352-363).

    ``influence``: stacked per-denoise-step weights — (S,), (S, T),
    (S, 23) or (S, T, 23) after averaging batch dims.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    infl = np.asarray(influence)
    # Collapse any batch axes so the leading axis is the denoise step.
    while infl.ndim > (1 if mixing_mode == 1 else 2 if mixing_mode in (2, 3) else 3):
        infl = infl.mean(axis=1)

    fig, ax = plt.subplots(figsize=(7, 4))
    if mixing_mode == 1:
        ax.plot(infl)
        ax.set_xlabel("denoise step")
        ax.set_ylabel("influence")
    elif mixing_mode == 2:
        im = ax.imshow(infl, aspect="auto", cmap="viridis", vmin=0, vmax=1)
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("frame")
        ax.set_ylabel("denoise step")
    elif mixing_mode == 3:
        im = ax.imshow(infl, aspect="auto", cmap="viridis", vmin=0, vmax=1)
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("joint")
        ax.set_ylabel("denoise step")
    else:
        # Spatio-temporal: show the per-step joint means.
        im = ax.imshow(infl.mean(axis=1), aspect="auto", cmap="viridis", vmin=0, vmax=1)
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("joint")
        ax.set_ylabel("denoise step")
    ax.set_title(f"influence (mode {mixing_mode})")
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return save_path
