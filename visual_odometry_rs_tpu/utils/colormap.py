"""Viridis colormap (ref ``src/misc/colormap.rs``).

The reference embeds the 256-entry viridis table as literals
(colormap.rs:22-281); we take the same table from matplotlib (it is the
original source of those literals) and expose the same u8 conversion
(colormap.rs:8-19).
"""

from __future__ import annotations

import numpy as np

_TABLE: np.ndarray | None = None


def viridis_table() -> np.ndarray:
    """(256, 3) uint8 viridis lookup table."""
    global _TABLE
    if _TABLE is None:
        from matplotlib import colormaps

        table = colormaps["viridis"](np.linspace(0.0, 1.0, 256))[:, :3]
        _TABLE = np.round(255.0 * table).astype(np.uint8)
    return _TABLE


def viridis_u8(values: np.ndarray) -> np.ndarray:
    """Map u8 intensities (…,) → RGB u8 (…, 3) through viridis."""
    return viridis_table()[np.asarray(values, np.uint8)]


def viridis_float(values: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Map floats in [vmin, vmax] → RGB u8 (…, 3) through viridis."""
    v = np.asarray(values, np.float64)
    scale = max(vmax - vmin, 1e-12)
    idx = np.clip((v - vmin) / scale * 255.0, 0, 255).astype(np.uint8)
    return viridis_table()[idx]
