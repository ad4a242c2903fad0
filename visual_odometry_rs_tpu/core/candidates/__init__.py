"""Candidate-point selection algorithms (ref ``src/core/candidates/``)."""

from . import coarse_to_fine  # noqa: F401
