"""Datasets: TUM RGB-D parsing/IO and synthetic exactly-rendered sequences."""

from . import synthetic, tum_rgbd  # noqa: F401
