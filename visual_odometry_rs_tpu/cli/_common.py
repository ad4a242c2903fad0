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


def parse_level_iterations(spec, nb_levels: int):
    """Parse ``--level-iterations "N0,N1,..."`` into a per-level tuple.

    ``None``/empty returns ``None`` (reference-exact single cap).  Raises
    ``SystemExit`` with a usage message on malformed input, like argparse.
    """
    if not spec:
        return None
    try:
        caps = tuple(int(tok) for tok in str(spec).split(","))
    except ValueError:
        raise SystemExit(
            f"--level-iterations must be comma-separated integers, got {spec!r}"
        )
    if len(caps) != nb_levels or any(c < 1 for c in caps):
        raise SystemExit(
            f"--level-iterations needs {nb_levels} caps >= 1 (one per "
            f"pyramid level, finest first), got {spec!r}"
        )
    return caps
