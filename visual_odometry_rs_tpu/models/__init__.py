"""Estimation models: the se3 RGB-D tracker (flagship) and 2D affine aligner."""

from . import affine2d, tracker  # noqa: F401
from .tracker import Tracker, TrackerConfig, init_tracker  # noqa: F401
