"""Plotting / visual diagnostics (SURVEY.md §2.8).

Headless (Agg) re-implementations of the reference's visual diagnostics:
  * latent-trajectory panels with covariance ellipses (plot_latents,
    utils.py:262-374)
  * MNIST / SPRITES recon grids (plot_mnist utils.py:660-688, plot_sprites
    SPRITES_utils.py:282-314)
  * circles/squares latent-geometry probes (utils_circles_grid.py:93-221)
  * kernel-matrix heatmaps with determinants (visualize_kernel_matrices,
    utils.py:747-796)
"""

from __future__ import annotations

import random
from typing import Optional

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib.patches import Ellipse  # noqa: E402


def _video_heatmap(vid: np.ndarray) -> np.ndarray:
    """Overlay all frames shaded by time; (T, px, py) -> (px, py)."""
    t = len(vid)
    shaded = np.array([(i + 4) * v for i, v in enumerate(vid)])
    return np.max(shaded, axis=0) / (4 + t)


def plot_latents(truevids, truepath, reconvids=None, reconpath=None,
                 reconvar=None, nplots: int = 4, save_path=None):
    """Video heatmaps + latent trajectories (+ covariance ellipses) +
    reconstruction heatmaps, one column per video."""
    fig, ax = plt.subplots(3, nplots, figsize=(2 * nplots, 6))

    lim = 2.5
    for arr in (truepath[:nplots], reconpath[:nplots] if reconpath is not None
                else truepath[:1]):
        lim = max(lim, np.abs(arr).max() + 0.1)

    if reconvar is not None:
        evals, evecs = np.linalg.eig(reconvar[:nplots])
        heights = np.sqrt(np.abs(evals[:, :, 0]))
        widths = np.sqrt(np.abs(evals[:, :, 1]))
        angles = np.degrees(np.arctan2(evecs[:, :, 0, 1], evecs[:, :, 0, 0]))

    for i in range(nplots):
        ax[0][i].imshow(1 - _video_heatmap(truevids[i]), origin="lower",
                        cmap="Greys")
        ax[0][i].axis("off")

        ax[1][i].plot(truepath[i, :, 0], truepath[i, :, 1])
        ax[1][i].scatter(truepath[i, -1, 0], truepath[i, -1, 1])
        ax[1][i].set_xlim([-lim, lim])
        ax[1][i].set_ylim([-lim, lim])
        if reconpath is not None:
            ax[1][i].plot(reconpath[i, :, 0], reconpath[i, :, 1])
            ax[1][i].scatter(reconpath[i, -1, 0], reconpath[i, -1, 1])
        if reconvar is not None:
            for t in range(truepath.shape[1]):
                e = Ellipse(xy=reconpath[i, t], width=widths[i, t],
                            height=heights[i, t], angle=angles[i, t])
                ax[1][i].add_artist(e)
                e.set_alpha(0.25)
                e.set_facecolor("C1")
        if reconvids is not None:
            ax[2][i].imshow(1 - _video_heatmap(reconvids[i]), origin="lower",
                            cmap="Greys")
            ax[2][i].axis("off")

    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig


def plot_image_grid(images, recon_images, title: str, nr_images: int = 8,
                    seed: Optional[int] = 0, save_path=None):
    """Ground-truth / reconstruction pair grid (plot_mnist / plot_sprites)."""
    if seed is not None:
        random.seed(seed)
        indices = random.sample(range(len(images)), nr_images)
    else:
        indices = list(range(nr_images))
    rows = (nr_images + 3) // 4
    fig, ax = plt.subplots(rows * 2, 4, figsize=(10, 5 * rows))
    ax = np.atleast_2d(ax)
    fig.suptitle(title)
    for k, idx in enumerate(indices):
        r, c = divmod(k, 4)
        for offset, arr in ((0, images), (1, recon_images)):
            a = ax[2 * r + offset][c]
            img = np.asarray(arr[idx])
            a.imshow(img[..., 0] if img.shape[-1] == 1 else np.clip(img, 0, 1),
                     cmap="gray" if img.shape[-1] == 1 else None)
            a.set_xticks([])
            a.set_yticks([])
            a.set_xlabel(f"{'gt' if offset == 0 else 'recon'} id {idx}")
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig


def plot_geometry_probe(traj_true, traj_pred, vids, kind: str,
                        save_path=None):
    """Circles/squares probe: rendered video heatmap + true vs predicted
    latent geometry (plot_circle / plot_square)."""
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(8, 4))
    ax0.imshow(1 - _video_heatmap(vids[0]), origin="lower", cmap="Greys")
    ax0.axis("off")

    n = 19 if kind == "circles" else 25
    ax1.scatter(traj_true[:n, 0], traj_true[:n, 1], color="blue")
    if traj_pred is not None:
        ax1.scatter(traj_pred[:n, 0], traj_pred[:n, 1], color="orange",
                    zorder=10)
    if kind == "circles":
        for lo, hi in ((1, 9), (9, 19)):
            ring = np.vstack([traj_true[lo:hi], traj_true[lo:lo + 1]])
            ax1.plot(ring[:, 0], ring[:, 1], color="blue")
            if traj_pred is not None:
                ring_p = np.vstack([traj_pred[lo:hi], traj_pred[lo:lo + 1]])
                ax1.plot(ring_p[:, 0], ring_p[:, 1], color="orange",
                         zorder=10)
    else:
        for pts, color, z in (((traj_true), "blue", 1),
                              ((traj_pred), "orange", 10)):
            if pts is None:
                continue
            for i in range(5):
                row = pts[5 * i:5 * i + 5]
                col = pts[i::5][:5]
                ax1.plot(row[:, 0], row[:, 1], color=color, zorder=z)
                ax1.plot(col[:, 0], col[:, 1], color=color, zorder=z)
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig


def plot_kernel_matrices(k_view, k_obj, k_prod, batch_idx: int = 0,
                         save_path=None):
    """Heatmaps of view/object/product kernel matrices with determinants
    (visualize_kernel_matrices, utils.py:747-796)."""
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for a, (mat, name) in zip(axes, ((k_view, "view"), (k_obj, "object"),
                                     (k_prod, "product"))):
        mat = np.asarray(mat)
        im = a.imshow(mat, cmap="RdBu_r", vmin=-1, vmax=1)
        a.set_title(f"{name} kernel. batch {batch_idx}. "
                    f"det {np.linalg.det(mat):.3e}")
        fig.colorbar(im, ax=a)
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig
