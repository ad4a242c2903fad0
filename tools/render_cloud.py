"""Render an exported PLY map to a PNG (orthographic projection).

Dependency-free companion to ``--export-cloud``: projects the sparse map
onto an axis-aligned plane with intensity shading, so a map can be eyeballed
without MeshLab.  Usage::

    python tools/render_cloud.py map.ply map.png [--plane xz] [--size 800]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from visual_odometry_rs_tpu.utils import pointcloud, view

PLANES = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}


def render(points: np.ndarray, intensities: np.ndarray, plane: str = "xz",
           size: int = 800, margin: float = 0.05) -> np.ndarray:
    """(size, size) u8 image: max-intensity splat of the projected points."""
    img = np.zeros((size, size), np.uint8)
    if len(points) == 0:
        return img
    a, b = PLANES[plane]
    p = points[:, (a, b)].astype(np.float64)
    lo = p.min(axis=0)
    hi = p.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    pad = margin * span
    lo, hi = lo - pad, hi + pad
    uv = (p - lo) / (hi - lo) * (size - 1)
    u = np.clip(np.rint(uv[:, 0]).astype(int), 0, size - 1)
    v = np.clip(np.rint(uv[:, 1]).astype(int), 0, size - 1)
    # brightest point wins per pixel (maximum splat, vectorized)
    np.maximum.at(img, (size - 1 - v, u), np.maximum(intensities, 1))
    return img


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("png")
    ap.add_argument("--plane", choices=sorted(PLANES), default="xz")
    ap.add_argument("--size", type=int, default=800)
    args = ap.parse_args(argv)
    pts, inten = pointcloud.read_ply(args.ply)
    img = render(pts, inten, plane=args.plane, size=args.size)
    view.save_png(args.png, view.gray_to_rgb(img))
    print(f"rendered {len(pts)} points ({args.plane} plane) to {args.png}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
