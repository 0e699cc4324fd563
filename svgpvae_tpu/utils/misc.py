"""Small conveniences mirrored from the reference utils.

  * `dict_to_flags` — dict -> "--k v" CLI string for programmatic sweeps
    (reference: utils.py:476-480).
  * `save_video_frames` — headless replacement for the interactive
    `play_video` (utils.py:123-135): writes each frame of one video as a
    PNG strip for inspection.
"""

from __future__ import annotations

import os


def dict_to_flags(d: dict) -> str:
    cmd = ""
    for k, v in d.items():
        cmd += f" --{k} {v}"
    return cmd


def save_video_frames(vid_batch, out_dir: str, index: int = 0,
                      max_frames: int = 30) -> str:
    """Save frames of vid_batch[index] as PNGs under out_dir; returns the
    directory written."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    vid = vid_batch[index]
    for t in range(min(len(vid), max_frames)):
        fig, ax = plt.subplots(figsize=(3, 3))
        ax.imshow(vid[t], origin="lower", cmap="Greys")
        ax.axis("off")
        fig.savefig(os.path.join(out_dir, f"frame_{t:03d}.png"), dpi=60)
        plt.close(fig)
    return out_dir
