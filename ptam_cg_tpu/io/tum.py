"""TUM-RGBD-style dataset reader.

Capability parity with the reference's VideoSourceDataSet
(ref: src/VideoSource.cc:59-159): parses ``rgb.txt`` (lines of
``timestamp filename``, '#' comments), loads frames in order, converts to
grayscale, optionally paces playback at a fixed framerate, and wraps
around at the end of the sequence. This is the deterministic replay
harness the reference uses as its de-facto integration test.

Image decoding is dependency-gated: PNG/JPG via imageio or PIL if
available, else raw ``.npy`` frames are supported (the synthetic harness
writes those).
"""

from __future__ import annotations

import os
import time
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _load_image(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        try:
            import imageio.v2 as imageio
            arr = imageio.imread(path)
        except ImportError:
            try:
                from PIL import Image
                arr = np.asarray(Image.open(path))
            except ImportError as e:
                raise RuntimeError(
                    "No PNG/JPG decoder available (imageio/PIL); "
                    "use .npy frames") from e
    if arr.ndim == 3:
        # BT.601 luma, matching CVD::convert rgb->byte behavior.
        arr = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
               + 0.114 * arr[..., 2])
    return arr.astype(np.float32)


class TumDataset:
    """Deterministic dataset replay (ref: VideoSourceDataSet)."""

    def __init__(self, root: str, index_file: str = "rgb.txt",
                 framerate: Optional[float] = None, loop: bool = True):
        self.root = root
        self.framerate = framerate
        self.loop = loop
        self.entries: List[Tuple[float, str]] = []
        index_path = os.path.join(root, index_file)
        with open(index_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) < 2:
                    continue
                self.entries.append((float(parts[0]), parts[1]))
        if not self.entries:
            raise ValueError(f"no frames listed in {index_path}")
        self._pos = 0
        self._last_time = None

    def __len__(self) -> int:
        return len(self.entries)

    def timestamps(self) -> np.ndarray:
        return np.array([t for t, _ in self.entries])

    def frame(self, i: int) -> np.ndarray:
        ts, rel = self.entries[i % len(self.entries)]
        return _load_image(os.path.join(self.root, rel))

    def next_frame(self) -> Tuple[float, np.ndarray]:
        """Sequential read with wraparound + optional pacing
        (ref: the 25 FPS sleep, src/VideoSource.cc:102-103)."""
        if self._pos >= len(self.entries):
            if not self.loop:
                raise StopIteration
            self._pos = 0
        ts, rel = self.entries[self._pos]
        self._pos += 1
        if self.framerate:
            now = time.monotonic()
            if self._last_time is not None:
                wait = (1.0 / self.framerate) - (now - self._last_time)
                if wait > 0:
                    time.sleep(wait)
            self._last_time = time.monotonic()
        return ts, _load_image(os.path.join(self.root, rel))

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        for i in range(len(self.entries)):
            yield self.entries[i][0], self.frame(i)


def load_groundtruth(root: str, fname: str = "groundtruth.txt"):
    """Parse TUM groundtruth.txt: timestamp tx ty tz qx qy qz qw.

    Returns (timestamps (N,), positions (N, 3), quaternions_wxyz (N, 4)).
    """
    ts, pos, quat = [], [], []
    with open(os.path.join(root, fname)) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            if len(v) < 8:
                continue
            ts.append(v[0])
            pos.append(v[1:4])
            quat.append([v[7], v[4], v[5], v[6]])   # -> wxyz
    return (np.array(ts), np.array(pos, np.float32),
            np.array(quat, np.float32))


def write_synthetic_dataset(root: str, frames, timestamps=None,
                            poses=None, png: bool = False):
    """Write frames as a TUM-layout dataset (.npy images, or 8-bit PNGs
    with ``png=True`` when PIL is available) — lets the synthetic
    harness exercise the exact dataset-replay path.

    ``poses``: optional list of world->camera SE3s; writes a TUM-format
    ``groundtruth.txt`` (camera-to-world, ``ts tx ty tz qx qy qz qw``).
    """
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    lines = ["# synthetic dataset", "# timestamp filename"]
    tss = []
    for i, frame in enumerate(frames):
        ts = timestamps[i] if timestamps is not None else i / 25.0
        tss.append(ts)
        arr = np.asarray(frame, np.float32)
        if png:
            from PIL import Image
            rel = f"rgb/{i:06d}.png"
            Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(
                os.path.join(root, rel))
        else:
            rel = f"rgb/{i:06d}.npy"
            np.save(os.path.join(root, rel), arr)
        lines.append(f"{ts:.6f} {rel}")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    if poses is not None:
        from ptam_cg_tpu.utils import se3 as se3lib
        glines = ["# ground truth trajectory",
                  "# timestamp tx ty tz qx qy qz qw"]
        for ts, p in zip(tss, poses):
            T = se3lib.inv(p)                      # camera-to-world
            q = np.asarray(se3lib.quat_from_rot(T.R))   # wxyz
            c = np.asarray(T.t)
            glines.append(
                f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}")
        with open(os.path.join(root, "groundtruth.txt"), "w") as f:
            f.write("\n".join(glines) + "\n")
