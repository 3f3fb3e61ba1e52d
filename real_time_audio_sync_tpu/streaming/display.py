"""Terminal display widgets — the gfxutil/Meter/Graph roles (SURVEY.md §2
C10, livenote_live.py:22-81) without Kivy/OpenGL.

``MeterDisplay`` renders a level bar, ``GraphDisplay`` a scrolling history
strip; both map a value range to a fixed-width character gauge.  ``KFAnim``
and ``AnimGroup`` reproduce the keyframe-interpolation utilities
(ims/gfxutil.py:66-106) used for cursor animation.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

_BLOCKS = " ▁▂▃▄▅▆▇█"


class MeterDisplay:
    """Level meter over a value range (MeterDisplay, livenote_live.py:22-49)."""

    def __init__(self, in_range: Tuple[float, float] = (-96.0, 0.0), width: int = 24):
        self.range = in_range
        self.width = width
        self.level = in_range[0]

    def set(self, level: float) -> None:
        self.level = float(level)

    def render(self) -> str:
        frac = float(np.interp(self.level, self.range, (0.0, 1.0)))
        filled = int(round(frac * self.width))
        return "[" + "█" * filled + " " * (self.width - filled) + "]"


class GraphDisplay:
    """Scrolling value history (GraphDisplay, livenote_live.py:52-81)."""

    def __init__(self, num_pts: int = 60, in_range: Tuple[float, float] = (-96.0, 0.0)):
        self.num_pts = num_pts
        self.range = in_range
        self.points: List[float] = []

    def add_point(self, y: float) -> None:
        self.points.append(float(y))
        if len(self.points) > self.num_pts:
            self.points = self.points[-self.num_pts :]

    def render(self) -> str:
        out = []
        for y in self.points:
            frac = float(np.interp(y, self.range, (0.0, 1.0)))
            out.append(_BLOCKS[int(round(frac * (len(_BLOCKS) - 1)))])
        return "".join(out).rjust(self.num_pts)


class KFAnim:
    """Piecewise-linear keyframe animation (ims/gfxutil.py:66-81): built from
    (time, v1[, v2...]) keyframes, evaluated with np.interp."""

    def __init__(self, *kf: Sequence[float]):
        frames = np.asarray(kf, dtype=float)
        self.time = frames[:, 0]
        self.values = frames[:, 1:]

    def eval(self, t: float):
        out = [float(np.interp(t, self.time, self.values[:, k])) for k in range(self.values.shape[1])]
        return out[0] if len(out) == 1 else out

    def is_active(self, t: float) -> bool:
        return t < self.time[-1]


class AnimGroup:
    """Container driving child objects' ``on_update(dt)``; children return
    False to be removed (ims/gfxutil.py:86-106)."""

    def __init__(self):
        self.objects: List = []

    def add(self, obj) -> None:
        self.objects.append(obj)

    def on_update(self, dt: float = 1 / 60) -> None:
        self.objects = [o for o in self.objects if o.on_update(dt) is not False]

    def size(self) -> int:
        return len(self.objects)
