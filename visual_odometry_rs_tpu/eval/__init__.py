"""Trajectory evaluation: ATE/RPE (in-repo; the reference delegates this
to mpizenberg/rgbd-tracking-evaluation)."""

from . import ate  # noqa: F401
