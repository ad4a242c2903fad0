"""Shared CLI plumbing."""

from __future__ import annotations

import argparse


def add_compilation_cache_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--compilation-cache",
        metavar="DIR",
        help="persistent XLA compilation cache directory: the first run "
        "compiles (~20-40 s on TPU), subsequent runs with the same config "
        "start near-instantly",
    )


def apply_compilation_cache(args) -> None:
    """Enable the persistent cache BEFORE the first backend use."""
    if getattr(args, "compilation_cache", None):
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
