"""End-to-end tracking demo on a synthetic RGB-D sequence with ATE.

A hermetic stand-in for running ``vors_track`` on a TUM sequence: renders an
exactly-ground-truthed sequence, tracks it, prints the TUM trajectory to
stdout and the ATE + per-frame metrics to stderr.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd
from visual_odometry_rs_tpu.eval import ate
from visual_odometry_rs_tpu.math import pose as pose_mod
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.utils import metrics


def main():
    seq = synthetic.generate_sequence(nb_frames=8, height=240, width=320, seed=0)
    config = tracker_mod.TrackerConfig(height=240, width=320, nb_levels=5, candidate_cap=4096)
    trk = tracker_mod.init_tracker(
        config, seq.intrinsics,
        float(seq.timestamps[0]), jnp.asarray(seq.depths[0]),
        float(seq.timestamps[0]), jnp.asarray(seq.grays[0]),
    )
    session = metrics.SessionMetrics()
    estimated = [pose_mod.identity()]
    for f in range(1, len(seq.grays)):
        with metrics.Timer() as t:
            trk.track(float(seq.timestamps[f]), jnp.asarray(seq.depths[f]),
                      float(seq.timestamps[f]), jnp.asarray(seq.grays[f]))
        ts, pose = trk.current_frame()
        estimated.append(pose)
        print(tum_rgbd.Frame(timestamp=ts, pose=pose).to_string())
        session.record(metrics.FrameMetrics(
            frame_index=f, timestamp=ts, optical_flow=trk.last_flow,
            keyframe_switched=False, failed=trk.last_failed, track_seconds=t.seconds,
        ))
    err = ate.ate_rmse(estimated, seq.poses)
    print(f"ATE RMSE: {err * 1000:.3f} mm over {len(estimated)} frames", file=sys.stderr)
    session.print_summary()


if __name__ == "__main__":
    main()
