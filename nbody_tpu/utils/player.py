"""Interactive 2-D trajectory player (pygame).

Self-contained re-implementation of the reference's real-time viewer
(utils/pygame-show.py:51-125): x/y projected to the screen, z mapped to
brightness, body 0 highlighted red, off-screen bodies reported once to
stderr.  Beyond the reference it adds pause (space), single-step
(left/right arrows), speed control (+/-), and draws each frame
vectorized through pygame.surfarray — a 10k-body trajectory plays at
well over 30 fps where the reference's per-body draw loop is O(N) Python
calls per frame.

Headless environments (tests, CI) can run it with frames=K and
SDL_VIDEODRIVER=dummy; see tests/test_tools.py.
"""

from __future__ import annotations

import sys

import numpy as np

from nbody_tpu.utils.viz import load_frames


def prepare(
    frames: np.ndarray, width: int, height: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Screen coordinates + z-brightness for every (frame, body).

    Matches the reference's mapping (utils/pygame-show.py:20-48): x and y
    are normalized by their global maxima onto half the screen and
    recentered; z is min-shifted then scaled to [0, 255].
    """
    xs = frames[..., 0]
    ys = frames[..., 1]
    zs = frames[..., 2]
    mx = np.max(np.abs(xs)) or 1.0
    my = np.max(np.abs(ys)) or 1.0
    sx = (xs * (width / 2) / mx).astype(np.int64) + width // 2
    sy = (ys * (height / 2) / my).astype(np.int64) + height // 2
    if np.max(zs) != np.min(zs):
        bz = zs - np.min(zs)
        bz = (bz * (255.0 / np.max(bz))).astype(np.int64)
    else:
        bz = np.full(zs.shape, 255, np.int64)
    return sx, sy, bz


def play(
    path: str,
    width: int = 512,
    height: int = 384,
    fps: int = 30,
    highlight_body: int = 0,
    frames: int | None = None,
) -> int:
    """Play a trajectory CSV in a pygame window.  Returns frames shown.

    Keys: space = pause/resume, left/right = step one frame while paused,
    +/- = speed, q/escape = quit.  `frames` bounds the run (headless
    smoke tests set it with SDL_VIDEODRIVER=dummy).
    """
    import pygame

    traj, _mass = load_frames(path)
    n_frames, n = traj.shape[:2]
    sx, sy, bz = prepare(traj, width, height)

    pygame.init()
    try:
        screen = pygame.display.set_mode((width, height))
        pygame.display.set_caption(f"nbody_tpu player — {n} bodies")
        font = pygame.font.SysFont("Arial", 18)
        clock = pygame.time.Clock()

        warned: set[int] = set()
        shown = 0
        t = 0
        paused = False
        speed = 1
        running = True
        while running and (frames is None or shown < frames):
            for event in pygame.event.get():
                if event.type == pygame.QUIT:
                    running = False
                elif event.type == pygame.KEYDOWN:
                    if event.key in (pygame.K_q, pygame.K_ESCAPE):
                        running = False
                    elif event.key == pygame.K_SPACE:
                        paused = not paused
                    elif event.key == pygame.K_RIGHT:
                        t = min(t + 1, n_frames - 1)
                    elif event.key == pygame.K_LEFT:
                        t = max(t - 1, 0)
                    elif event.key in (pygame.K_PLUS, pygame.K_EQUALS):
                        speed = min(speed * 2, 64)
                    elif event.key == pygame.K_MINUS:
                        speed = max(speed // 2, 1)
            if t >= n_frames:
                print("Simulation Completed. Closing.")
                break

            x, y, z = sx[t], sy[t], bz[t]
            # off-screen warning, once per body (utils/pygame-show.py:99-108)
            off = (x < 0) | (x >= width) | (y < 0) | (y >= height)
            for i in np.nonzero(off)[0]:
                if int(i) not in warned:
                    warned.add(int(i))
                    print(
                        f"WARNING: body {i} is off-screen: "
                        f"x = {x[i]}/{width}, y = {y[i]}/{height}",
                        file=sys.stderr,
                    )

            # vectorized draw: z-brightness scatter via surfarray
            buf = np.zeros((width, height, 3), dtype=np.uint8)
            xin = np.clip(x, 0, width - 1)
            yin = np.clip(y, 0, height - 1)
            keep = ~off
            buf[xin[keep], yin[keep]] = z[keep, None]
            if 0 <= highlight_body < n and keep[highlight_body]:
                hx, hy = int(xin[highlight_body]), int(yin[highlight_body])
                buf[max(hx - 1, 0) : hx + 2, max(hy - 1, 0) : hy + 2] = (255, 0, 0)
            pygame.surfarray.blit_array(screen, buf)
            screen.blit(
                font.render(f"Time Step: {t}", True, (255, 255, 255)), (10, 10)
            )
            pygame.display.flip()
            clock.tick(fps)
            shown += 1
            if not paused:
                t += speed
        return shown
    finally:
        pygame.quit()


def main(argv=None) -> int:  # pragma: no cover - thin CLI
    import argparse

    p = argparse.ArgumentParser(description="nbody 2-D trajectory player")
    p.add_argument("trajectory")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--frames", type=int, help="stop after this many frames")
    args = p.parse_args(argv)
    play(
        args.trajectory,
        width=args.width,
        height=args.height,
        fps=args.fps,
        frames=args.frames,
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
