"""Trajectory visualization.

The reference ships a pygame 2-D player (utils/pygame-show.py:51-125), a
matplotlib 3-D animation (utils/main.py:35-54), and GIF/AVI encoders
(utils/make_gif.py, utils/make_video.py).  Because our trajectory CSVs use
the identical `id,x,y,z,mass` frame format, the reference's own players
work unchanged on our outputs; this module provides a dependency-light
matplotlib equivalent (3-D scatter animation + GIF export) for
environments without pygame.
"""

from __future__ import annotations

import numpy as np

from nbody_tpu.io.csv import read_trajectory


def load_frames(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(frames (T, N, 3), mass (N,)) from a trajectory CSV."""
    rows, n = read_trajectory(path)
    if rows.shape[0] % n:
        raise ValueError(
            f"row count {rows.shape[0]} is not a multiple of body count {n}"
        )
    frames = rows[:, 1:4].reshape(-1, n, 3)
    mass = rows[:n, 4]
    return frames, mass


def animate(
    path: str,
    out: str | None = None,
    stride: int = 1,
    interval_ms: int = 33,
    highlight_body: int = 0,
):
    """3-D scatter animation of a trajectory CSV (body 0 highlighted red,
    like the pygame player, utils/pygame-show.py:93-94).

    With `out` ending in .gif the animation is saved; otherwise a
    matplotlib window is shown.  Returns the FuncAnimation.
    """
    import matplotlib

    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    frames, mass = load_frames(path)
    frames = frames[::stride]
    lim = np.abs(frames).max() * 1.05 or 1.0

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    sizes = 4 + 20 * (mass / mass.max())
    colors = ["red" if i == highlight_body else "tab:blue" for i in range(len(mass))]
    scat = ax.scatter(*frames[0].T, s=sizes, c=colors, depthshade=False)
    for setter in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        setter(-lim, lim)

    def update(t):
        scat._offsets3d = tuple(frames[t].T)
        ax.set_title(f"frame {t * stride}")
        return (scat,)

    anim = FuncAnimation(
        fig, update, frames=len(frames), interval=interval_ms, blit=False
    )
    if out:
        anim.save(out, writer="pillow", fps=max(1, 1000 // interval_ms))
    else:  # pragma: no cover - interactive
        plt.show()
    return anim


def export_video(
    path: str,
    out: str,
    stride: int = 1,
    fps: int = 30,
    size: int = 640,
    highlight_body: int = 0,
) -> None:
    """Encode a trajectory CSV to a video file via OpenCV — the analog of
    the reference's utils/make_video.py (AVI from frame dumps).  The
    container/codec follows the extension (.avi -> MJPG, .mp4 -> mp4v)."""
    import cv2

    frames, mass = load_frames(path)
    frames = frames[::stride]
    lim = float(np.abs(frames).max()) * 1.05 or 1.0

    fourcc = cv2.VideoWriter_fourcc(
        *("MJPG" if out.lower().endswith(".avi") else "mp4v")
    )
    writer = cv2.VideoWriter(out, fourcc, fps, (size, size))
    radii = (1 + 3 * mass / mass.max()).astype(int)
    try:
        for fr in frames:
            img = np.zeros((size, size, 3), dtype=np.uint8)
            # x -> screen x, y -> screen y; z -> brightness (the pygame
            # player's convention, utils/pygame-show.py:35-44)
            sx = ((fr[:, 0] / lim * 0.5 + 0.5) * (size - 1)).astype(int)
            sy = ((fr[:, 1] / lim * 0.5 + 0.5) * (size - 1)).astype(int)
            bz = (np.clip(fr[:, 2] / lim * 0.5 + 0.5, 0, 1) * 155 + 100).astype(int)
            for i in range(fr.shape[0]):
                color = (0, 0, 255) if i == highlight_body else (
                    int(bz[i]), int(bz[i]), int(bz[i])
                )
                cv2.circle(img, (int(sx[i]), int(sy[i])), int(radii[i]), color, -1)
            writer.write(img)
    finally:
        writer.release()


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    p = argparse.ArgumentParser(description="nbody trajectory viewer")
    p.add_argument("trajectory")
    p.add_argument(
        "--out",
        help="write a GIF (.gif) or video (.avi/.mp4) instead of showing "
        "a window",
    )
    p.add_argument("--stride", type=int, default=1)
    args = p.parse_args(argv)
    if args.out and args.out.lower().endswith((".avi", ".mp4")):
        export_video(args.trajectory, args.out, stride=args.stride)
    else:
        animate(args.trajectory, out=args.out, stride=args.stride)


if __name__ == "__main__":  # pragma: no cover
    main()
