"""Section timing: the reference LoopTimer equivalent (``LoopTimer.h:34-95``).

Labels mirror the reference mains (``main_opt.cpp:120-121``):
``correction, features, preprocessing, propagation, total, total vision
update, write output``.  Per-frame rows go to ``timing.csv`` via the writer.

Note: with the whole pipeline fused under jit, fine-grained per-section
device timing requires either separate dispatch (slow path, used only when
``--timing`` is requested) or profile traces; this timer measures host-side
wall time around explicitly dispatched sections.
"""

from __future__ import annotations

import time


class LoopTimer:
    def __init__(self, labels=None):
        self.labels = list(labels or [])
        self._start: dict[str, float] = {}
        self._frame: dict[str, float] = {}
        self._frame_start = 0.0

    def start_loop(self):
        self._frame = {lab: 0.0 for lab in self.labels}
        self._frame_start = time.perf_counter()

    def start_timing(self, label: str):
        self._start[label] = time.perf_counter()

    def end_timing(self, label: str):
        if label in self._start:
            self._frame[label] = self._frame.get(label, 0.0) + (
                time.perf_counter() - self._start.pop(label)
            )

    def frame_row(self) -> tuple[float, dict[str, float]]:
        return self._frame_start, dict(self._frame)
