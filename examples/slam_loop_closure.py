"""Loop closure + pose-graph optimization on a synthetic loop trajectory.

The reference's long-term vision ("towards a functional SLAM system",
reference README.md:7) defers loop closure and pose-graph optimization to
future work (README.md:54-55); this example demonstrates the green-field
implementation end to end:

1. render an out-and-back camera path over the synthetic textured plane;
2. corrupt the (ground-truth) odometry with a systematic per-frame drift;
3. propose loop candidates by pose proximity and verify them
   photometrically with the tracker's own coarse-to-fine alignment
   (``models.loop_closure``);
4. optimize the pose graph (odometry chain + verified loop edges,
   ``parallel.pose_graph``) and print the ATE before/after.

Run:  python examples/slam_loop_closure.py
(The full product pipeline, starting from real tracking instead of injected
drift, is ``python -m visual_odometry_rs_tpu.cli.vors_slam``.)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.eval import ate
from visual_odometry_rs_tpu.math import pose as pose_mod
from visual_odometry_rs_tpu.math import se3
from visual_odometry_rs_tpu.math.pose import Pose
from visual_odometry_rs_tpu.models import loop_closure, tracker as tracker_mod
from visual_odometry_rs_tpu.parallel import pose_graph


def main() -> float:
    # out-and-back: 7 frames out, 7 frames back — the end revisits the start
    out = [[0.04, 0.004, 0.002, 0.002, -0.001, 0.001]] * 7
    back = [[-0.04, -0.004, -0.002, -0.002, 0.001, -0.001]] * 7
    twists = np.asarray(out + back, np.float32)
    seq = synthetic.generate_sequence(
        nb_frames=len(twists) + 1, height=120, width=160, seed=41,
        twist_per_frame=twists,
    )
    config = tracker_mod.TrackerConfig(
        height=120, width=160, nb_levels=3, candidate_cap=1024
    )

    # systematic odometry drift (the typical calibration/scale bias real VO
    # accumulates — exactly what loop closure corrects)
    rng = np.random.default_rng(8)
    bias = np.asarray([0.004, -0.002, 0.001, 0.0008, 0.0005, -0.0004], np.float32)
    drift = [pose_mod.identity()]
    for _ in range(1, len(seq.poses)):
        step = se3.exp(jnp.asarray(bias + rng.normal(size=6) * 0.001, jnp.float32))
        drift.append(pose_mod.compose(drift[-1], step))
    drifted = [pose_mod.compose(p, d) for p, d in zip(seq.poses, drift)]
    ate_before = ate.ate_rmse(drifted, seq.poses)

    lc = loop_closure.LoopClosureConfig(radius=0.25, min_gap=8, max_candidates=6)
    edges = loop_closure.detect_loops(
        config, seq.intrinsics, drifted, seq.depths, seq.grays, lc
    )
    print(f"verified loop edges: {[(i, j) for i, j, _, _ in edges]}")

    nodes = Pose(
        jnp.stack([p.q for p in drifted]), jnp.stack([p.t for p in drifted])
    )
    graph = pose_graph.odometry_graph(
        nodes, loop_edges=[(i, j, z) for i, j, z, _ in edges]
    )
    result = pose_graph.solve(graph, max_iterations=30)
    optimized = [
        Pose(result.nodes.q[k], result.nodes.t[k]) for k in range(len(drifted))
    ]
    ate_after = ate.ate_rmse(optimized, seq.poses)
    print(f"ATE before loop closure: {ate_before * 100:.2f} cm")
    print(f"ATE after  loop closure: {ate_after * 100:.2f} cm")
    return ate_after / ate_before


if __name__ == "__main__":
    ratio = main()
    print(f"improvement: {1 / ratio:.1f}x")
