"""Structured per-frame metrics and logging (SURVEY §5 observability).

The reference's runtime introspection is ``eprintln!`` of optical flow and
keyframe switches (inverse_compositional.rs:222,229) with the data product on
stdout.  Here: a structured per-frame record, aggregation, and the same clean
stdout/stderr separation (callers print records to stderr, trajectories to
stdout).
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import asdict, dataclass, field
from typing import List, Optional


@dataclass
class FrameMetrics:
    """One tracked frame's diagnostics."""

    frame_index: int
    timestamp: float
    optical_flow: float
    keyframe_switched: bool
    failed: bool
    track_seconds: float

    def to_json(self) -> str:
        return json.dumps(asdict(self))


@dataclass
class SessionMetrics:
    """Aggregated tracking-session metrics."""

    frames: List[FrameMetrics] = field(default_factory=list)

    def record(self, m: FrameMetrics) -> None:
        self.frames.append(m)

    @property
    def nb_frames(self) -> int:
        return len(self.frames)

    @property
    def nb_keyframe_switches(self) -> int:
        return sum(1 for f in self.frames if f.keyframe_switched)

    @property
    def nb_failures(self) -> int:
        return sum(1 for f in self.frames if f.failed)

    @property
    def mean_fps(self) -> float:
        total = sum(f.track_seconds for f in self.frames)
        return len(self.frames) / total if total > 0 else 0.0

    def summary(self) -> dict:
        return {
            "frames": self.nb_frames,
            "keyframe_switches": self.nb_keyframe_switches,
            "failures": self.nb_failures,
            "mean_fps": round(self.mean_fps, 2),
            "mean_flow": round(
                sum(f.optical_flow for f in self.frames) / max(1, self.nb_frames), 4
            ),
        }

    def print_summary(self, file=None) -> None:
        # resolve the stream at call time: binding sys.stderr as a default
        # captures the import-time object, which test harnesses replace
        print(json.dumps(self.summary()), file=file or sys.stderr)


class Timer:
    """Minimal wall-clock timer for per-frame measurement."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False
