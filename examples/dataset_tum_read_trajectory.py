"""Trajectory-file parsing demo (ref examples/dataset_tum-read-trajectory.rs).

Usage: python examples/dataset_tum_read_trajectory.py [trajectory.txt]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from visual_odometry_rs_tpu.dataset import tum_rgbd

SAMPLE = """# ground truth trajectory
1305031102.1758 1.3405 0.6266 1.6575 0.6574 0.6126 -0.2949 -0.3248
1305031102.2758 1.3303 0.6256 1.6464 0.6579 0.6161 -0.2932 -0.3189
"""


def main():
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            content = f.read()
    else:
        content = SAMPLE
    frames = tum_rgbd.parse_trajectory(content)
    print(f"parsed {len(frames)} frames; first entries:")
    for fr in frames[:5]:
        print(" ", fr.to_string())


if __name__ == "__main__":
    main()
