"""Estimation models: the se3 RGB-D tracker (flagship), the 2D affine
aligner, and windowed photometric bundle adjustment."""

from . import affine2d, photometric_ba, tracker  # noqa: F401
from .tracker import Tracker, TrackerConfig, init_tracker  # noqa: F401
