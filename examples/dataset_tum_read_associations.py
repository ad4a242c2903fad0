"""Association-file parsing demo (ref examples/dataset_tum-read-associations.rs).

Usage: python examples/dataset_tum_read_associations.py [associations.txt]
(without an argument, parses an inline sample)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from visual_odometry_rs_tpu.dataset import tum_rgbd

SAMPLE = """# depth_ts depth_file color_ts color_file
1305031102.160407 depth/1305031102.160407.png 1305031102.175304 rgb/1305031102.175304.png
1305031102.194330 depth/1305031102.194330.png 1305031102.211214 rgb/1305031102.211214.png
"""


def main():
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            content = f.read()
    else:
        content = SAMPLE
    assocs = tum_rgbd.parse_associations(content)
    print(f"parsed {len(assocs)} associations; first entries:")
    for a in assocs[:5]:
        print(f"  depth {a.depth_timestamp} {a.depth_file_path}  "
              f"color {a.color_timestamp} {a.color_file_path}")


if __name__ == "__main__":
    main()
