"""Command-line entry points (ref ``src/bin/``)."""
