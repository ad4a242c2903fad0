"""CLI: full SLAM pipeline — track, detect loop closures, optimize the graph.

    python -m visual_odometry_rs_tpu.cli.vors_slam fr1 associations.txt > traj.txt

The reference's stated long-term vision is "a functional SLAM system" with
loop closure and pose-graph optimization deferred to future work
(reference README.md:7, :54-55).  This CLI is that pipeline, end to end:

1. **Track** every frame with the production tracker (same semantics as
   ``vors_track``), recording which frames became keyframes.
2. **Detect loops** between keyframes: pose-proximity proposal +
   photometric verification with the tracker's own coarse-to-fine
   alignment (``models.loop_closure``); keyframe depth/gray images are
   retained for verification.
3. **Optimize** a pose graph over the keyframes (odometry chain composed
   from the tracked trajectory + verified loop edges,
   ``parallel.pose_graph``), then anchor every intermediate frame to its
   preceding keyframe's correction.

Outputs the optimized TUM trajectory on stdout; diagnostics (per-frame flow,
proposed/verified loop pairs, graph energy) on stderr.  With no verified
loops the output equals the tracked trajectory.
"""

from __future__ import annotations

import argparse
import sys

from . import _common

USAGE = "Usage: vors_slam [fr1|fr2|fr3|icl] associations_file"


class _KeyframeStore:
    """Bounded keyframe image retention (``--kf-store``).

    ``memory``: the round-3 behavior — every keyframe's (depth, gray) stays
    resident, O(keyframes x image) RSS (at 640x480 that is ~0.9 MB per
    keyframe: the front-end memory wall on long trajectories).
    ``disk``: only the frame id is kept; images re-decode from the dataset
    on demand through a small LRU (loop-closure verification touches at most
    the proposal endpoints, map export streams in chunks), so front-end
    memory is O(1) in trajectory length.
    """

    def __init__(self, mode: str, associations, lru: int = 32):
        self.mode = mode
        self._assocs = associations
        self._mem = {}
        self._lru: "dict[int, tuple]" = {}
        # loop verification fetches depths and grays for the unique proposal
        # endpoints in separate passes, so the LRU must hold all of them at
        # once or every endpoint frame is PNG-decoded twice
        self._LRU = max(32, lru)

    def put(self, fid: int, depth, gray) -> None:
        if self.mode == "memory":
            self._mem[fid] = (depth, gray)

    def get(self, fid: int):
        if self.mode == "memory":
            return self._mem[fid]
        if fid in self._lru:
            self._lru[fid] = self._lru.pop(fid)  # refresh recency
            return self._lru[fid]
        from ..dataset import tum_rgbd

        frame = tum_rgbd.read_images(self._assocs[fid])
        self._lru[fid] = frame
        while len(self._lru) > self._LRU:
            self._lru.pop(next(iter(self._lru)))
        return frame

    def images_for_checkpoint(self):
        """Images for ``checkpoint.save_slam``: ``None`` in disk mode (the
        checkpoint stays O(tracker state); resume re-decodes on demand)."""
        return self._mem if self.mode == "memory" else None


class _LazyFrames:
    """List-like view of keyframe depths (``part=0``) or grays (``part=1``)
    that decodes through a ``_KeyframeStore`` on access — what
    ``loop_closure.detect_loops`` (int indexing) and
    ``pointcloud.keyframe_clouds`` (len + chunk slicing) consume without
    ever materializing all keyframe images at once."""

    def __init__(self, store: _KeyframeStore, fids, part: int):
        self._store = store
        self._fids = list(fids)
        self._part = part

    def __len__(self) -> int:
        return len(self._fids)

    def __getitem__(self, k):
        if isinstance(k, slice):
            return [self._store.get(f)[self._part] for f in self._fids[k]]
        return self._store.get(self._fids[k])[self._part]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(usage=USAGE)
    parser.add_argument("camera_id", choices=["fr1", "fr2", "fr3", "icl"])
    parser.add_argument("associations_file")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument("--nb-levels", type=int, default=6)
    parser.add_argument("--diff-threshold", type=int, default=7)
    parser.add_argument("--candidate-cap", type=int, default=8192)
    parser.add_argument(
        "--interp", choices=["auto", "gather", "onehot", "onehot_weighted"],
        default="auto",
    )
    _common.add_compilation_cache_arg(parser)
    # loop-closure gates (models/loop_closure.py defaults are conservative)
    parser.add_argument("--loop-radius", type=float, default=0.5,
                        help="max estimated distance between loop endpoints (m)")
    parser.add_argument("--loop-max-angle", type=float, default=0.6,
                        help="max estimated relative rotation (rad)")
    parser.add_argument("--loop-min-gap", type=int, default=10,
                        help="min temporal separation in FRAMES")
    parser.add_argument("--loop-max-candidates", type=int, default=16)
    parser.add_argument("--loop-energy-accept", type=float, default=300.0,
                        help="max mean squared intensity for a verified edge")
    parser.add_argument(
        "--save-state", metavar="PATH",
        help="checkpoint the tracking phase (tracker + trajectory + "
        "keyframe store) to PATH every --save-every frames",
    )
    parser.add_argument("--save-every", type=int, default=100, metavar="N")
    parser.add_argument(
        "--resume", metavar="PATH",
        help="resume tracking from a --save-state checkpoint (refuses on "
        "config mismatch); loop closure + PGO run at the end as usual",
    )
    parser.add_argument(
        "--export-cloud", metavar="PATH",
        help="write the sparse 3D map (keyframe candidate points back-"
        "projected through the optimized poses) as an ASCII PLY file",
    )
    parser.add_argument(
        "--cloud-voxel", type=float, default=0.0, metavar="METERS",
        help="voxel-grid downsample the exported cloud (one centroid point "
        "per cube); 0 = keep every point",
    )
    parser.add_argument(
        "--refine-window", type=int, default=0, metavar="W",
        help="run DSO-style sliding-window photometric BA (window of W "
        "frames, marginalization + prior transfer — models.sliding_window) "
        "alongside tracking, so loop closure and the pose graph operate on "
        "REFINED poses: the complete tracking -> windowed BA -> loop "
        "closure -> PGO pipeline.  0 = off (track-only front-end)",
    )
    parser.add_argument(
        "--refine-energy-tol", type=float, default=1.0,
        help="per-pair d_energy stop for the window solves "
        "(see vors_refine --energy-tol)",
    )
    parser.add_argument(
        "--relocalize", type=int, default=0, metavar="K",
        help="recover lost tracks against the last K keyframes "
        "(see vors_track --relocalize); 0 = off",
    )
    parser.add_argument("--relocalize-energy", type=float, default=150.0)
    parser.add_argument(
        "--robust-delta", type=float, default=0.0,
        help="Huber threshold for the tracking front-end's photometric "
        "residuals (0 = reference-exact L2; see vors_track --robust-delta)",
    )
    parser.add_argument(
        "--brightness-model", action="store_true",
        help="estimate per-frame affine brightness (gain/bias) jointly with "
        "the pose in the tracking front-end (see vors_track)",
    )
    parser.add_argument(
        "--candidate-selector", choices=["coarse_to_fine", "dso", "dso_fixed"],
        default="coarse_to_fine",
        help="keyframe candidate picker for the tracking front-end "
        "(see vors_track --candidate-selector; the host Tracker supports "
        "all three)",
    )
    parser.add_argument(
        "--dso-target", type=int, default=2000,
        help="DSO selector point-count target (see vors_track)",
    )
    parser.add_argument(
        "--dso-block-size", type=int, default=4,
        help="dso_fixed: the static block size (see vors_track)",
    )
    parser.add_argument(
        "--dso-a", type=float, default=1.0,
        help="DSO regional threshold coefficient a (see vors_track --dso-a)",
    )
    parser.add_argument(
        "--warm-start", choices=["constant_position", "constant_velocity"],
        default="constant_position",
        help="per-frame LM init for the tracking front-end "
        "(see vors_track --warm-start)",
    )
    parser.add_argument(
        "--level-iterations", metavar="N0,N1,...", default=None,
        help="per-level LM iteration caps for the tracking front-end "
        "(see vors_track --level-iterations)",
    )
    parser.add_argument(
        "--kf-store", choices=["disk", "memory"], default="disk",
        help="keyframe image retention for loop closure / map export: "
        "'disk' (default) re-decodes keyframe frames from the dataset on "
        "demand — front-end memory stays O(1) in trajectory length; "
        "'memory' keeps every keyframe's depth+gray resident (the round-3 "
        "behavior: faster verification, O(keyframes x image) RSS)",
    )
    args = parser.parse_args(argv)

    _common.apply_compilation_cache(args)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ..dataset import tum_rgbd
    from ..math import pose as pose_mod
    from ..math.pose import Pose
    from ..models import loop_closure, tracker as tracker_mod
    from ..parallel import pose_graph

    try:
        associations = tum_rgbd.load_associations(args.associations_file)
    except OSError as e:
        print(USAGE, file=sys.stderr)
        print(f"Cannot read associations: {e}", file=sys.stderr)
        return 1
    if not associations:
        print("Empty associations file", file=sys.stderr)
        return 1

    depth0, gray0 = tum_rgbd.read_images(associations[0])
    h, w = gray0.shape
    intrinsics = tum_rgbd.scaled_intrinsics(args.camera_id, h, w)
    if (h, w) != (tum_rgbd.NATIVE_HEIGHT, tum_rgbd.NATIVE_WIDTH):
        print(f"note: {args.camera_id} intrinsics rescaled to {w}x{h} inputs",
              file=sys.stderr)
    config = tracker_mod.TrackerConfig(
        height=h, width=w,
        nb_levels=args.nb_levels,
        candidates_diff_threshold=args.diff_threshold,
        depth_scale=tum_rgbd.DEPTH_SCALE,
        idepth_variance=1e-4,
        candidate_cap=args.candidate_cap,
        interp_method=args.interp,
        relocalize_window=max(0, args.relocalize),
        relocalize_energy_accept=args.relocalize_energy,
        robust_delta=args.robust_delta,
        brightness_model=args.brightness_model,
        candidate_selector=args.candidate_selector,
        dso_target=args.dso_target,
        dso_block_size=args.dso_block_size,
        dso_threshold_coef_a=args.dso_a,
        warm_start=args.warm_start,
        level_max_iterations=_common.parse_level_iterations(
            args.level_iterations, args.nb_levels
        ),
    )

    # --- 1. track ---------------------------------------------------------
    from ..utils import checkpoint as ckpt_mod

    store = _KeyframeStore(
        args.kf_store, associations, lru=2 * args.loop_max_candidates
    )

    trk = tracker_mod.init_tracker(
        config, intrinsics,
        associations[0].depth_timestamp, jnp.asarray(depth0),
        associations[0].color_timestamp, jnp.asarray(gray0),
    )
    if args.resume:
        try:
            trajectory, timestamps, keyframe_ids, kf_images, frames_done = (
                ckpt_mod.load_slam(args.resume, trk)
            )
        except (ckpt_mod.CheckpointMismatchError, OSError, KeyError,
                ValueError) as e:
            # ValueError: np.load on a corrupt / non-npz file
            print(f"Cannot resume: {e}", file=sys.stderr)
            return 1
        # the config fingerprint alone would accept a checkpoint from a
        # different dataset with the same camera — bind to the sequence by
        # checking the tracked timestamps against the associations prefix
        if len(timestamps) != frames_done + 1 or not ckpt_mod.sequence_matches(
            timestamps, associations
        ):
            print(
                "Cannot resume: checkpoint was written for a different "
                "input sequence (tracked timestamps do not match the "
                "associations file)",
                file=sys.stderr,
            )
            return 1
        if kf_images is not None:
            # pre-round-4 checkpoint carrying the images: seed the store
            for fid, (d, g) in kf_images.items():
                store.put(fid, d, g)
        elif store.mode == "memory":
            # image-free (disk-mode) checkpoint resumed with --kf-store
            # memory: re-decode the consumed keyframes so the resident
            # store is complete (the sequence binding above guarantees the
            # association files are the ones the checkpoint consumed)
            from ..dataset import tum_rgbd as _tum

            for fid in keyframe_ids:
                store.put(fid, *_tum.read_images(associations[fid]))
        print(
            f"resumed from {args.resume}: {frames_done} frames tracked, "
            f"{len(keyframe_ids)} keyframes",
            file=sys.stderr,
        )
    else:
        trajectory = [pose_mod.identity()]
        timestamps = [associations[0].depth_timestamp]
        keyframe_ids = [0]
        store.put(0, depth0, gray0)
        frames_done = 0

    sw = None
    if args.refine_window > 0:
        from ..models import sliding_window

        sw = sliding_window.SlidingWindow(
            config, intrinsics,
            window_size=max(2, args.refine_window),
            energy_tol=args.refine_energy_tol,
            interp_method=args.interp,
        )
        if args.resume:
            # the window state rides in a sibling file next to the slam
            # checkpoint (same versioning/fingerprint refusal semantics)
            try:
                ckpt_mod.load_sliding_window(args.resume + ".window", sw)
            except (ckpt_mod.CheckpointMismatchError, OSError, KeyError,
                    ValueError) as e:
                print(
                    f"Cannot resume window state ({args.resume}.window): {e}",
                    file=sys.stderr,
                )
                return 1
            if sw._next_id != frames_done + 1:
                print(
                    f"Cannot resume: window checkpoint has consumed "
                    f"{sw._next_id} frames but the slam checkpoint tracked "
                    f"{frames_done} — the two files are out of sync",
                    file=sys.stderr,
                )
                return 1
        else:
            sw.start(jnp.asarray(depth0), jnp.asarray(gray0), trajectory[0])
        print(
            f"sliding-window refinement on: window {sw.window_size}, "
            "loop closure will see refined poses",
            file=sys.stderr,
        )
    def save_all(done: int) -> None:
        ckpt_mod.save_slam(
            args.save_state, trk, trajectory, timestamps, keyframe_ids,
            store.images_for_checkpoint(), done,
        )
        if sw is not None:
            ckpt_mod.save_sliding_window(args.save_state + ".window", sw)
        print(f"checkpointed slam state to {args.save_state}", file=sys.stderr)

    todo = associations[1 + frames_done:]
    for idx, (assoc, (depth, gray)) in enumerate(
        zip(todo, tum_rgbd.frame_loader(todo)), start=1 + frames_done
    ):
        before = trk.keyframe_switches
        trk.track(assoc.depth_timestamp, jnp.asarray(depth),
                  assoc.color_timestamp, jnp.asarray(gray))
        print(f"Optical_flow: {trk.last_flow}", file=sys.stderr)
        ts, pose = trk.current_frame()
        trajectory.append(pose)
        timestamps.append(ts)
        if sw is not None:
            # windowed BA over the tracker's estimates: every member of the
            # current window gets its jointly-refined pose (latest wins)
            ids, refined_poses = sw.add_frame(
                jnp.asarray(depth), jnp.asarray(gray), pose
            )
            for fid, p in zip(ids, refined_poses):
                trajectory[fid] = p
        if trk.keyframe_switches > before:
            keyframe_ids.append(idx)
            store.put(idx, depth, gray)
        if args.save_state and (idx - frames_done) % max(1, args.save_every) == 0:
            save_all(idx)

    if args.save_state:
        # final save: without it a run shorter than --save-every would
        # leave no checkpoint at all (the in-loop cadence is for crash
        # protection; this records the completed tracking phase)
        save_all(len(associations) - 1)

    # --- 2. loop closure over keyframes -----------------------------------
    lc = loop_closure.LoopClosureConfig(
        radius=args.loop_radius,
        max_angle=args.loop_max_angle,
        min_gap=args.loop_min_gap,  # in frames; node_ids carries frame ids
        max_candidates=args.loop_max_candidates,
        energy_accept=args.loop_energy_accept,
    )
    kf_poses = [trajectory[i] for i in keyframe_ids]
    kf_depths = _LazyFrames(store, keyframe_ids, 0)
    kf_grays = _LazyFrames(store, keyframe_ids, 1)
    edges = loop_closure.detect_loops(
        config, intrinsics, kf_poses, kf_depths, kf_grays, lc,
        node_ids=keyframe_ids,
    )
    print(
        f"{len(keyframe_ids)} keyframes, {len(edges)} verified loop edges",
        file=sys.stderr,
    )
    for (i, j, _z, energy) in edges:
        print(
            f"loop edge: frames {keyframe_ids[i]} <-> {keyframe_ids[j]} "
            f"(energy {energy:.1f})",
            file=sys.stderr,
        )

    optimized = list(trajectory)
    if edges:
        # --- 3. pose-graph over keyframes + anchor intermediates ----------
        nodes = Pose(
            jnp.stack([p.q for p in kf_poses]), jnp.stack([p.t for p in kf_poses])
        )
        graph = pose_graph.odometry_graph(nodes, loop_edges=edges)
        # small graphs: dense Cholesky; larger: PCG with the chain
        # block-tridiagonal preconditioner (O(N+E)/iter vs O(N^3))
        if len(keyframe_ids) <= 64:
            result = pose_graph.solve(graph, max_iterations=30)
        else:
            result = pose_graph.solve_sparse(graph, max_iterations=30)
        print(
            f"pose graph: energy {float(result.energy):.3e} after "
            f"{int(result.nb_iter)} iterations",
            file=sys.stderr,
        )
        # correction of keyframe k: C_k = T_k_opt ∘ T_k_est⁻¹; intermediate
        # frames inherit the preceding keyframe's correction
        corrections = {}
        for n, fid in enumerate(keyframe_ids):
            opt = Pose(result.nodes.q[n], result.nodes.t[n])
            corrections[fid] = pose_mod.compose(opt, pose_mod.inverse(trajectory[fid]))
        current = pose_mod.identity()
        for f in range(len(trajectory)):
            if f in corrections:
                current = corrections[f]
            optimized[f] = pose_mod.compose(current, trajectory[f])

    for ts, pose in zip(timestamps[1:], optimized[1:]):
        print(tum_rgbd.Frame(timestamp=ts, pose=pose).to_string())

    if args.export_cloud:
        from ..utils import pointcloud

        pts, inten = pointcloud.keyframe_clouds(
            config, intrinsics,
            kf_depths,
            kf_grays,
            [optimized[i] for i in keyframe_ids],
        )
        pts, inten = pointcloud.voxel_downsample(pts, inten, args.cloud_voxel)
        pointcloud.write_ply(args.export_cloud, pts, inten)
        print(
            f"exported {len(pts)} map points from {len(keyframe_ids)} "
            f"keyframes to {args.export_cloud}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
