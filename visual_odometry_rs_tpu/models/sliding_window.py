"""DSO-style sliding keyframe window with frame marginalization.

The reference defers "sliding window of keyframes optimization as in DSO"
to future work (reference README.md:54-55).  This module builds it on top of
the windowed photometric BA (``models.photometric_ba``):

- a window of up to W frames anchored at a tracker-style keyframe (the
  keyframe changes on the same mean-optical-flow >= threshold criterion as
  the tracker, inverse_compositional.rs:221-224);
- every incoming frame triggers a COARSE-TO-FINE window solve: a
  pose-only pass at a coarse pyramid level (wide basin) followed by the
  full-resolution staged solve (pose-only LM iterations with frozen
  depths, then joint pose+depth refinement), with a per-iteration trust
  region and an in-view-pair guard — the robustness stack that keeps the
  full-res photometric energy's aliasing/co-drift valleys from capturing
  the solve (each measure is motivated by an observed failure; see
  ``photometric_ba.solve_window`` and the regression tests);
- when a frame departs a full window it is MARGINALIZED, not dropped: the
  information INCREMENT it contributed (Schur complement of the full
  depth-reduced system minus the kept frames' own re-buildable terms, at
  the current linearization) becomes a Gaussian pose prior
  ``ρᵀHρ, ρ_f = log(anchor_f⁻¹ ∘ pose_f)`` on the remaining frames
  (``solve_window(pose_prior=)``) — see ``_marginalize_oldest`` for why
  the increment form is required.

Simplifications vs full DSO, documented on purpose:

- the prior is anchored at the estimates current at marginalization time
  with zero mean-shift (prior residual = 0 there) — the standard
  "Gaussian centered at the marginalized MAP" form; no first-estimate
  Jacobian bookkeeping;
- on a keyframe switch (default ``switch_transfer=True``) the window is
  RE-ANCHORED on the new keyframe instead of being reset: members stay,
  their models re-express as ``m'_f = m_f ∘ m_new⁻¹``, and the
  accumulated prior transports to the new coordinates by the blockwise
  adjoint congruence ``H'_{fg} = Adᵀ H_{fg} Ad, Ad = Adj(m_new⁻¹)``
  (exact energy-preserving change of variables; first-order in the
  re-anchoring of the mean) with the new keyframe's own block conditioned
  out (it becomes the gauge).  ``switch_transfer=False`` restores the
  round-2 behavior: reset the window and drop the prior at every switch —
  measurably worse on multi-switch drift (see tests).

TPU notes: window tensors are fixed-shape per window length, so each length
(2..W) jits once and is cached; the marginalization is one (P,P) solve plus
einsums on the already-built camera system.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Intrinsics
from ..math import pose as pose_mod
from ..math import se3
from ..math.pose import Pose
from ..ops import pyramid as pyramid_ops
from ..utils.types import Float
from . import photometric_ba
from . import tracker as tracker_mod


def marginalize_frame(S: jnp.ndarray, j: int, eps: float = 1e-6) -> jnp.ndarray:
    """Schur-marginalize frame ``j`` out of a (F, P, F, P) camera system.

    Returns the (F-1, 6, F-1, 6) pose-block information matrix over the
    remaining frames (in original order with ``j`` removed); with P = 8 the
    departing frame's brightness parameters are marginalized too, and the
    remaining frames' brightness rows are sliced away (the prior is carried
    on poses only).
    """
    F, P = S.shape[0], S.shape[1]
    keep = [i for i in range(F) if i != j]
    ki = jnp.asarray(keep)
    S_kk = S[ki][:, :, ki]  # (F-1, P, F-1, P)
    S_kj = S[ki, :, j, :]  # (F-1, P, P)
    S_jj = S[j, :, j, :] + eps * jnp.eye(P, dtype=Float)
    S_jj_inv = jnp.linalg.inv(S_jj)
    # symmetric system: S[j, :, g, :] = S[g, :, j, :]^T
    fill = jnp.einsum("fac,cd,gbd->fagb", S_kj, S_jj_inv, S_kj)
    H = S_kk - fill
    return H[:, :6, :, :6]


class SlidingWindow:
    """Streaming DSO-style sliding-window refiner.

    Usage::

        sw = SlidingWindow(config, intrinsics, window_size=6)
        sw.start(depth0, gray0, c2w0)
        for each frame: ids, poses = sw.add_frame(depth, gray, c2w_init)
        # `ids`/`poses`: refreshed camera-to-world estimates of the frames
        # currently in the window (update your trajectory with them)

    ``c2w_init`` is the tracker's (or any) camera-to-world initialization
    for the new frame; the window solve refines all member poses jointly.
    """

    def __init__(
        self,
        config: tracker_mod.TrackerConfig,
        intrinsics: Intrinsics,
        window_size: int = 6,
        *,
        marginalize: bool = True,
        max_iterations: int = 15,
        idepth_prior_weight: float = 1e4,
        energy_tol: float = 0.01,
        interp_method: str = "auto",
        robust_delta: float = 0.0,
        brightness: bool = False,
        coarse_level: int = 1,
        switch_transfer: bool = True,
        collect_clouds: bool = False,
    ):
        if window_size < 2:
            raise ValueError("window_size must be >= 2")
        self.config = config
        self.intrinsics = intrinsics
        self.window_size = window_size
        self.marginalize = marginalize
        self.switch_transfer = switch_transfer
        self._solve_opts = dict(
            max_iterations=max_iterations,
            idepth_prior_weight=idepth_prior_weight,
            energy_tol=energy_tol,
            interp_method=interp_method,
            robust_delta=robust_delta,
            brightness=brightness,
        )
        self._idepth_prior_weight = idepth_prior_weight
        self._interp_method = interp_method
        self._robust_delta = robust_delta
        self._brightness = brightness
        self._max_iterations = max_iterations
        # coarse-to-fine: a pose-only solve at this pyramid level widens the
        # convergence basin before the full-res joint solve (the full-res
        # photometric energy aliases a few pixels out; a ~2 px init error is
        # ~1 px at level 1, well inside its basin).  0 disables.
        self.coarse_level = min(coarse_level, config.nb_levels - 1)
        self._pyr = jax.jit(lambda g: pyramid_ops.mean_pyramid(config.nb_levels, g))
        self._precompute = jax.jit(
            lambda d, p: tracker_mod.precompute_keyframe(config, intrinsics, d, p)
        )
        self._solve_cache = {}
        self._system_cache = {}
        # mutable window state
        self.kf_levels = None
        self.kf_c2w: Optional[Pose] = None
        self.idepth = None
        self.images: List[jnp.ndarray] = []  # f32 (H, W), [0] = keyframe
        self.models: List[Pose] = []  # keyframe->frame, [0] = identity
        self.frame_ids: List[int] = []
        self.prior_H = None  # (F, 6, F, 6) aligned with current window slots
        self.prior_anchors: Optional[Pose] = None
        self.keyframe_switches = 0
        self._next_id = 0
        # refined 3D map accumulation (``collect_clouds``): each retiring
        # keyframe's candidates with their window-REFINED inverse depths,
        # back-projected through the refined keyframe pose — the structure
        # output of the photometric BA, vs utils.pointcloud's sensor depths
        self.collect_clouds = collect_clouds
        self.retired_clouds: List = []

    # -- internals ---------------------------------------------------------

    def _solver(self, F: int):
        if F not in self._solve_cache:
            opts = dict(self._solve_opts)

            def run(win, Hp, aq, at, idepth_init):
                return photometric_ba.solve_window(
                    win, pose_prior=(Hp, Pose(aq, at)),
                    idepth_init=idepth_init, **opts
                )

            self._solve_cache[F] = jax.jit(run)
        return self._solve_cache[F]

    def _system(self, F: int):
        if F not in self._system_cache:
            def run(win, idepth, Hp, aq, at):
                S, _, _, _, _ = photometric_ba._camera_system(
                    win, win.poses, idepth, jnp.asarray(0.0, Float),
                    jnp.asarray(self._idepth_prior_weight, Float),
                    self._interp_method, self._robust_delta,
                    brightness=self._brightness,
                    pose_prior=(Hp, Pose(aq, at)),
                )
                return S

            self._system_cache[F] = jax.jit(run)
        return self._system_cache[F]

    def _system_noprior(self, F: int):
        key = ("noprior", F)
        if key not in self._system_cache:
            def run(win, idepth):
                S, _, _, _, _ = photometric_ba._camera_system(
                    win, win.poses, idepth, jnp.asarray(0.0, Float),
                    jnp.asarray(self._idepth_prior_weight, Float),
                    self._interp_method, self._robust_delta,
                    brightness=self._brightness,
                )
                return S

            self._system_cache[key] = jax.jit(run)
        return self._system_cache[key]

    def _window(self, models: List[Pose], images: List[jnp.ndarray]):
        """Window with ``win.idepth`` = the keyframe's SENSOR inverse depths.

        The sensor measurement stays the depth prior's anchor for every
        solve in the epoch; the previous solve's refined depths enter only
        as the optimization starting point (``idepth_init``, see
        ``add_frame``).  Re-feeding refined depths as the anchor would turn
        the 1e4-weight sensor prior into a random walk (round-2 advisor
        finding)."""
        poses = Pose(
            jnp.stack([m.q for m in models]), jnp.stack([m.t for m in models])
        )
        return photometric_ba.window_from_tracking(
            self.config, self.intrinsics, self.kf_levels, jnp.stack(images), poses
        )

    def _coarse_solver(self, F: int):
        key = ("coarse", F)
        if key not in self._solve_cache:
            opts = dict(self._solve_opts)
            opts["max_iterations"] = self._max_iterations
            opts["refine_depth"] = False  # explicitly pose-only

            def run(win, Hp, aq, at):
                return photometric_ba.solve_window(
                    win, pose_prior=(Hp, Pose(aq, at)), **opts
                )

            self._solve_cache[key] = jax.jit(run)
        return self._solve_cache[key]

    def _coarse_refine(self, F: int, Hp, aq, at):
        """Pose-only solve at the coarse pyramid level (sensor depths).

        The marginalization prior is built in FULL-RES photometric
        information units; the coarse level has ~4^level fewer candidate
        pairs, so the prior is scaled down accordingly to keep its weight
        relative to the coarse photometric term what the design intends.
        """
        lvl = self.coarse_level
        poses = Pose(
            jnp.stack([m.q for m in self.models]),
            jnp.stack([m.t for m in self.models]),
        )
        win_c = photometric_ba.window_from_tracking(
            self.config, self.intrinsics, self.kf_levels,
            jnp.stack(self.images_coarse), poses, level=lvl,
        )
        res = self._coarse_solver(F)(win_c, Hp * (4.0 ** -lvl), aq, at)
        self.models = [Pose(res.poses.q[i], res.poses.t[i]) for i in range(F)]

    def _flow(self, model: Pose) -> float:
        """Mean optical flow of the keyframe's coarsest-level candidates
        under ``model`` (inverse_compositional.rs:211-222).  Jitted: unjitted
        ops cost one tunnel round trip EACH on remote TPU transports."""
        if not hasattr(self, "_flow_fn"):
            from ..core import camera as camera_mod

            def flow(coarse, model):
                u, v = camera_mod.warp(
                    model, coarse.xs, coarse.ys, coarse.idepth, coarse.intrinsics
                )
                validf = coarse.valid.astype(Float)
                d = jnp.abs(coarse.xs - u) + jnp.abs(coarse.ys - v)
                return jnp.sum(d * validf) / jnp.sum(validf)

            self._flow_fn = jax.jit(flow)
        return float(self._flow_fn(self.kf_levels[-1], model))

    def _set_keyframe(self, depth, gray, c2w: Pose, frame_id: int, pyr=None):
        if pyr is None:
            pyr = self._pyr(jnp.asarray(gray))
        kf = self._precompute(jnp.asarray(depth), pyr)
        self.kf_levels = kf.levels
        self.kf_c2w = c2w
        self.idepth = kf.levels[0].idepth
        self.images = [jnp.asarray(np.asarray(gray), jnp.float32)]
        self.images_coarse = [pyr[self.coarse_level].astype(jnp.float32)]
        self.models = [pose_mod.identity()]
        self.frame_ids = [frame_id]
        F = 1
        self.prior_H = jnp.zeros((F, 6, F, 6), Float)
        self.prior_anchors = Pose(
            jnp.stack([m.q for m in self.models]),
            jnp.stack([m.t for m in self.models]),
        )

    def _prior_for(self, F: int):
        """Prior aligned to the F current slots (zeros for missing tail)."""
        Hp = jnp.zeros((F, 6, F, 6), Float)
        k = self.prior_H.shape[0]
        Hp = Hp.at[:k, :, :k, :].set(self.prior_H)
        aq = jnp.stack(
            [self.prior_anchors.q[i] if i < k else self.models[i].q for i in range(F)]
        )
        at = jnp.stack(
            [self.prior_anchors.t[i] if i < k else self.models[i].t for i in range(F)]
        )
        return Hp, aq, at

    def _marginalize_oldest(self):
        """Fold frame 1 (oldest non-keyframe) into the pose prior, drop it.

        The prior must carry only the information INCREMENT attributable to
        the departing frame (plus the previous prior), because the kept
        frames' photometric residuals stay live and are re-built in every
        subsequent solve.  Folding the whole marginalized system in would
        double-count the kept frames' information on every marginalization
        and the prior would grow overconfident ~linearly in marginalization
        count (pinning the window on long keyframe epochs).  Hence:

            H_new = Schur_marg_j(photo(all) + prior) - photo(kept only)

        so that the next solve's ``photo(kept) + H_new`` equals the correct
        marginal of the full system at this linearization.  The difference
        is PSD up to linearization/f32 error; it is symmetrized and
        eigenvalue-clamped to keep the prior a valid information matrix.
        """
        F = len(self.models)
        Hp, aq, at = self._prior_for(F)
        win = self._window(self.models, self.images)
        S_with = self._system(F)(win, self.idepth, Hp, aq, at)
        H_marg = np.asarray(marginalize_frame(S_with, j=1))  # (F-1,6,F-1,6)

        keep = [0] + list(range(2, F))
        kept_models = [self.models[i] for i in keep]
        kept_images = [self.images[i] for i in keep]
        win2 = self._window(kept_models, kept_images)
        S_without = np.asarray(self._system_noprior(F - 1)(win2, self.idepth))
        H_new = H_marg - S_without[:, :6, :, :6]

        n = (F - 1) * 6
        M = H_new.reshape(n, n)
        M = 0.5 * (M + M.T)
        eigval, eigvec = np.linalg.eigh(M)
        M = (eigvec * np.clip(eigval, 0.0, None)) @ eigvec.T

        self.images = kept_images
        self.images_coarse = [self.images_coarse[i] for i in keep]
        self.models = kept_models
        self.frame_ids = [self.frame_ids[i] for i in keep]
        self.prior_H = jnp.asarray(M.reshape(F - 1, 6, F - 1, 6), Float)
        self.prior_anchors = Pose(
            jnp.stack([m.q for m in self.models]),
            jnp.stack([m.t for m in self.models]),
        )

    def _switch_keyframe_transfer(self, depth, gray, refined_c2w: Pose, fid, pyr):
        """Re-anchor the window on the NEWEST frame, transferring the prior.

        Instead of resetting the window and dropping the marginalization
        prior (round-2 behavior; the verdict's item 3), the switch is a
        change of variables: with ``m_new`` the new keyframe's old model,

        - members stay; models re-express as ``m'_f = m_f ∘ m_new⁻¹``
          (so ``m'_new = identity`` — the new gauge);
        - the prior transports by the exact energy-preserving congruence
          ``H'_{fg} = Adᵀ H_{fg} Ad`` with ``Ad = Adj(m_new⁻¹)``
          (``ρ' = Adj(m_new) ρ`` under the re-expression, so
          ``ρ'ᵀH'ρ' = ρᵀHρ``; the re-anchoring of the mean at the current
          estimates is the module's standard zero-mean-shift form);
        - slots reorder to put the new keyframe first, and its own block
          rows/columns are conditioned out (its pose becomes the
          deterministic gauge definition, not an estimate — conditioning,
          not marginalization, is the consistent operation, and it keeps
          the prior PSD);
        - candidates/inverse depths recompute from the new keyframe's
          sensor data (a fresh depth epoch — the prior carries POSE
          information only, like DSO's marginalized camera states).

        The old keyframe stays in the window as a regular frame, now
        tracked against the new template, and is the first to be
        marginalized when the window fills.
        """
        F = len(self.models)
        j = F - 1  # the switching (newest) frame
        m_new = self.models[j]
        inv_new = pose_mod.inverse(m_new)
        new_models = [pose_mod.compose(m, inv_new) for m in self.models]
        new_models[j] = pose_mod.identity()  # exact gauge, no f32 residue

        Hp, _, _ = self._prior_for(F)
        Ad = np.asarray(se3.adjoint(inv_new))  # (6, 6)
        H = np.asarray(Hp)
        # H'[f,x,g,y] = sum_{a,b} Ad[a,x] H[f,a,g,b] Ad[b,y]
        Ht = np.einsum("ax,fagb,by->fxgy", Ad, H, Ad)
        order = [j] + [i for i in range(F) if i != j]
        Ht = Ht[order][:, :, order]
        Ht[0, :, :, :] = 0.0  # condition out the new gauge frame
        Ht[:, :, 0, :] = 0.0

        # new keyframe data (fresh depth epoch)
        if pyr is None:
            pyr = self._pyr(jnp.asarray(gray))
        kf = self._precompute(jnp.asarray(depth), pyr)
        self.kf_levels = kf.levels
        self.kf_c2w = refined_c2w
        self.idepth = kf.levels[0].idepth
        self.images = [self.images[i] for i in order]
        self.images_coarse = [self.images_coarse[i] for i in order]
        self.models = [new_models[i] for i in order]
        self.frame_ids = [self.frame_ids[i] for i in order]
        self.prior_H = jnp.asarray(Ht, Float)
        self.prior_anchors = Pose(
            jnp.stack([m.q for m in self.models]),
            jnp.stack([m.t for m in self.models]),
        )

    # -- public API --------------------------------------------------------

    def keyframe_cloud(self):
        """World-frame (M, 3) points + (M,) u8 intensities of the CURRENT
        keyframe's candidates using the window-REFINED inverse depths and
        the refined keyframe pose (``kf_c2w ∘ models[0]⁻¹`` — slot 0 can
        move in the joint solve).  One jitted dispatch + one fetch."""
        import numpy as np

        if self.kf_levels is None:
            return np.zeros((0, 3), np.float32), np.zeros((0,), np.uint8)
        if not hasattr(self, "_cloud_fn"):
            from ..core import camera as camera_mod

            def cloud(obs, idepth, kf_c2w, m0):
                kf_pose = pose_mod.compose(kf_c2w, pose_mod.inverse(m0))
                ok = obs.valid & (idepth > 0.0)
                z = 1.0 / jnp.where(ok, idepth, 1.0)
                pix = jnp.stack([obs.xs, obs.ys], axis=-1)
                cam = camera_mod.back_project(obs.intrinsics, pix, z)
                world = pose_mod.apply(kf_pose, cam)
                return world, obs.tmpl_vals, ok

            self._cloud_fn = jax.jit(cloud)
        world, vals, ok = self._cloud_fn(
            self.kf_levels[0], self.idepth, self.kf_c2w, self.models[0]
        )
        mask = np.asarray(ok)
        pts = np.asarray(world, np.float32)[mask]
        inten = np.clip(np.asarray(vals)[mask], 0, 255).astype(np.uint8)
        return pts, inten

    def start(self, depth, gray, c2w: Pose | None = None) -> int:
        """Initialize with the first keyframe; returns its frame id."""
        c2w = c2w if c2w is not None else pose_mod.identity()
        fid = self._next_id
        self._next_id += 1
        self._set_keyframe(depth, gray, c2w, fid)
        return fid

    def add_frame(self, depth, gray, c2w_init: Pose) -> Tuple[List[int], List[Pose]]:
        """Add a frame, refine the window, maybe switch keyframe.

        Returns ``(frame_ids, refined_c2w)`` for every frame currently in
        the window (keyframe first).  ``depth``/``gray`` are the new frame's
        images; ``c2w_init`` its initialization (e.g. from the tracker).
        """
        fid = self._next_id
        self._next_id += 1
        if not hasattr(self, "_rel_fn"):
            # jitted host-pose helpers: unjitted jnp ops are one tunnel
            # round trip each on remote TPU transports
            self._rel_fn = jax.jit(
                lambda c2w, kf: pose_mod.compose(pose_mod.inverse(c2w), kf)
            )
            self._refined_fn = jax.jit(
                jax.vmap(
                    lambda kq, kt, mq, mt: pose_mod.compose(
                        Pose(kq, kt), pose_mod.inverse(Pose(mq, mt))
                    ),
                    in_axes=(None, None, 0, 0),
                )
            )
        # keyframe->frame model init: model = c2w_frame^-1 ∘ c2w_kf
        model = self._rel_fn(c2w_init, self.kf_c2w)
        if len(self.models) == self.window_size:
            if self.marginalize:
                self._marginalize_oldest()
            else:
                keep = [0] + list(range(2, len(self.models)))
                self.images = [self.images[i] for i in keep]
                self.images_coarse = [self.images_coarse[i] for i in keep]
                self.models = [self.models[i] for i in keep]
                self.frame_ids = [self.frame_ids[i] for i in keep]
                F = len(self.models)
                self.prior_H = jnp.zeros((F, 6, F, 6), Float)
                self.prior_anchors = Pose(
                    jnp.stack([m.q for m in self.models]),
                    jnp.stack([m.t for m in self.models]),
                )
        self.images.append(jnp.asarray(np.asarray(gray), jnp.float32))
        pyr_new = None
        if self.coarse_level > 0:
            pyr_new = self._pyr(jnp.asarray(gray))
            self.images_coarse.append(pyr_new[self.coarse_level].astype(jnp.float32))
        else:
            self.images_coarse.append(self.images[-1])
        self.models.append(model)
        self.frame_ids.append(fid)

        F = len(self.models)
        Hp, aq, at = self._prior_for(F)
        if self.coarse_level > 0:
            self._coarse_refine(F, Hp, aq, at)
        win = self._window(self.models, self.images)
        result = self._solver(F)(win, Hp, aq, at, self.idepth)
        self.idepth = result.idepth
        self.models = [
            Pose(result.poses.q[i], result.poses.t[i]) for i in range(F)
        ]

        ids = list(self.frame_ids)
        ref = self._refined_fn(
            self.kf_c2w.q, self.kf_c2w.t,
            jnp.stack([m.q for m in self.models]),
            jnp.stack([m.t for m in self.models]),
        )
        refined = [Pose(ref.q[i], ref.t[i]) for i in range(F)]

        # keyframe switch on tracker flow criterion (newest frame vs keyframe)
        if self._flow(self.models[-1]) >= self.config.flow_threshold:
            if self.collect_clouds:
                self.retired_clouds.append(self.keyframe_cloud())
            if self.switch_transfer:
                self._switch_keyframe_transfer(
                    depth, gray, refined[-1], fid, pyr_new
                )
            else:
                self._set_keyframe(depth, gray, refined[-1], fid, pyr=pyr_new)
            self.keyframe_switches += 1
        return ids, refined


class BatchedSlidingWindow:
    """Data-parallel marginalized sliding window: B independent sequences
    advance in LOCKSTEP, each with its OWN marginalization prior, window
    membership, and keyframe epoch — refined in ONE vmapped solve per step.

    Closes the round-3 scaling gap: ``solve_window_batched`` could not carry
    per-window priors, so the marginalized product path (what ``vors_refine``
    and ``vors_slam --refine-window`` run) was a per-sequence host loop.
    Here every step costs:

    - one vmapped coarse pose-only solve + one vmapped full-res staged solve
      (``photometric_ba.solve_window_batched`` with per-lane
      ``pose_prior``/``idepth_init``),
    - one vmapped marginalization dispatch when the window is full (the
      two camera-system builds, the Schur complement, and the PSD
      eigenvalue clamp all run in-graph, batched — the per-lane driver does
      the clamp on host numpy),
    - and, on steps where ANY lane's flow criterion fires, one vmapped
      keyframe precompute + per-lane select (the all-lanes-compute /
      per-lane-select pattern of ``parallel.batch``; measured there to beat
      per-lane scans, docs/PERF.md).

    Lockstep constraints (by construction, enforced at init):

    - ``switch_transfer=True`` only — a reset switch would shrink one lane's
      window to a single frame while others keep F members, breaking the
      shared static shape.  (The transfer variant is also the measurably
      better policy, docs/PERF.md.)
    - all lanes share ``window_size`` and the tracker config.

    Per-lane results match ``SlidingWindow`` lane for lane up to f32
    vmap-lowering noise (same caveat as ``solve_window_batched``), pinned by
    ``tests/test_sliding_window.py::test_batched_sliding_window_matches_per_lane``.

    With ``mesh`` the lane axis is sharded over ``mesh[axis]``
    (communication-free DP, like ``parallel.batch``).
    """

    def __init__(
        self,
        config: tracker_mod.TrackerConfig,
        intrinsics: Intrinsics,
        window_size: int = 6,
        *,
        marginalize: bool = True,
        max_iterations: int = 15,
        idepth_prior_weight: float = 1e4,
        energy_tol: float = 0.01,
        interp_method: str = "auto",
        robust_delta: float = 0.0,
        brightness: bool = False,
        coarse_level: int = 1,
        switch_transfer: bool = True,
        mesh=None,
        mesh_axis: str = "data",
    ):
        if window_size < 2:
            raise ValueError("window_size must be >= 2")
        if not switch_transfer:
            raise ValueError(
                "BatchedSlidingWindow requires switch_transfer=True: a reset "
                "switch would give lanes different window lengths (see class "
                "docstring); use SlidingWindow for the reset policy"
            )
        self.config = config
        self.intrinsics = intrinsics
        self.window_size = window_size
        self.marginalize = marginalize
        self.switch_transfer = True  # the only policy (class invariant)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._solve_opts = dict(
            max_iterations=max_iterations,
            idepth_prior_weight=idepth_prior_weight,
            energy_tol=energy_tol,
            interp_method=interp_method,
            robust_delta=robust_delta,
            brightness=brightness,
        )
        self._idepth_prior_weight = idepth_prior_weight
        self._interp_method = interp_method
        self._robust_delta = robust_delta
        self._brightness = brightness
        self._max_iterations = max_iterations
        self.coarse_level = min(coarse_level, config.nb_levels - 1)
        self._pyr_b = jax.jit(
            jax.vmap(lambda g: pyramid_ops.mean_pyramid(config.nb_levels, g))
        )
        self._precompute_b = jax.jit(
            jax.vmap(
                lambda d, p: tracker_mod.precompute_keyframe(
                    config, intrinsics, d, p
                )
            )
        )
        self._jit_cache = {}
        # mutable lockstep state (every leaf carries a leading (B,) lane axis)
        self.kf_levels = None  # KeyframeData.levels, batched leaves
        self.kf_c2w: Optional[Pose] = None  # (B,)
        self.idepth = None  # (B, N)
        self.images: List[jnp.ndarray] = []  # per slot: (B, H, W) f32
        self.images_coarse: List[jnp.ndarray] = []
        self.models: List[Pose] = []  # per slot: Pose (B,)
        self.frame_ids: Optional[np.ndarray] = None  # (F, B) int
        self.prior_H = None  # (B, F, 6, F, 6) — eagerly padded to F slots
        self.prior_anchors: Optional[Pose] = None  # (B, F)
        self.keyframe_switches = None  # (B,) int
        self.batch = None
        self._next_id = 0

    # -- internals -----------------------------------------------------------

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        from ..parallel import mesh as mesh_mod

        return mesh_mod.shard_batch(tree, self.mesh, self.mesh_axis)

    def _stacked_models(self) -> Pose:
        return Pose(
            jnp.stack([m.q for m in self.models], axis=1),
            jnp.stack([m.t for m in self.models], axis=1),
        )  # (B, F)

    def _window_b(self, models: List[Pose], images: List[jnp.ndarray]):
        """Batched ``Window``: every leaf has a leading (B,) lane axis.
        ``win.idepth`` stays the keyframe's SENSOR inverse depths (the depth
        prior's anchor) — refined depths enter only as ``idepth_init``."""
        poses = Pose(
            jnp.stack([m.q for m in models], axis=1),
            jnp.stack([m.t for m in models], axis=1),
        )
        return photometric_ba.window_from_tracking(
            self.config, self.intrinsics, self.kf_levels,
            jnp.stack(images, axis=1), poses,
        )

    def _solver_b(self, F: int):
        key = ("solve", F)
        if key not in self._jit_cache:
            opts = dict(self._solve_opts)

            def run(win, Hp, aq, at, ii):
                return jax.vmap(
                    lambda w, hp, q, t, i: photometric_ba.solve_window(
                        w, pose_prior=(hp, Pose(q, t)), idepth_init=i, **opts
                    )
                )(win, Hp, aq, at, ii)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _coarse_solver_b(self, F: int):
        key = ("coarse", F)
        if key not in self._jit_cache:
            opts = dict(self._solve_opts)
            opts["max_iterations"] = self._max_iterations
            opts["refine_depth"] = False

            def run(win, Hp, aq, at):
                return jax.vmap(
                    lambda w, hp, q, t: photometric_ba.solve_window(
                        w, pose_prior=(hp, Pose(q, t)), **opts
                    )
                )(win, Hp, aq, at)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _marginalizer_b(self, F: int):
        """One jitted dispatch: both camera systems, the Schur complement of
        slot 1, the kept-frames subtraction, and the PSD clamp — vmapped."""
        key = ("marg", F)
        if key not in self._jit_cache:
            w_prior = jnp.asarray(self._idepth_prior_weight, Float)
            zero = jnp.asarray(0.0, Float)

            def one(win, win_kept, idepth, Hp, aq, at):
                S_with, _, _, _, _ = photometric_ba._camera_system(
                    win, win.poses, idepth, zero, w_prior,
                    self._interp_method, self._robust_delta,
                    brightness=self._brightness,
                    pose_prior=(Hp, Pose(aq, at)),
                )
                H_marg = marginalize_frame(S_with, j=1)
                S_wo, _, _, _, _ = photometric_ba._camera_system(
                    win_kept, win_kept.poses, idepth, zero, w_prior,
                    self._interp_method, self._robust_delta,
                    brightness=self._brightness,
                )
                H_new = H_marg - S_wo[:, :6, :, :6]
                n = (F - 1) * 6
                M = H_new.reshape(n, n)
                M = 0.5 * (M + M.T)
                eigval, eigvec = jnp.linalg.eigh(M)
                M = (eigvec * jnp.clip(eigval, 0.0, None)) @ eigvec.T
                return M.reshape(F - 1, 6, F - 1, 6)

            self._jit_cache[key] = jax.jit(jax.vmap(one))
        return self._jit_cache[key]

    def _switcher_b(self, F: int):
        """Per-lane keyframe-switch transfer (same math as
        ``SlidingWindow._switch_keyframe_transfer``), vmapped + masked:
        models re-express against the newest frame, the prior transports by
        the adjoint congruence, slots reorder newest-first, the new gauge
        block conditions out — all selected per lane by ``switch``."""
        key = ("switch", F)
        if key not in self._jit_cache:
            j = F - 1
            order = jnp.asarray([j] + [i for i in range(F) if i != j])

            def one(switch, mq, mt, Hp):
                m_new = Pose(mq[j], mt[j])
                inv_new = pose_mod.inverse(m_new)
                nm = jax.vmap(
                    lambda q, t: pose_mod.compose(Pose(q, t), inv_new)
                )(mq, mt)
                ident = pose_mod.identity()
                nq = nm.q.at[j].set(ident.q)  # exact gauge, no f32 residue
                nt = nm.t.at[j].set(ident.t)
                Ad = se3.adjoint(inv_new)
                Ht = jnp.einsum("ax,fagb,by->fxgy", Ad, Hp, Ad)
                Ht = Ht[order][:, :, order]
                Ht = Ht.at[0].set(0.0)
                Ht = Ht.at[:, :, 0].set(0.0)
                nq, nt = nq[order], nt[order]
                out_q = jnp.where(switch, nq, mq)
                out_t = jnp.where(switch, nt, mt)
                out_H = jnp.where(switch, Ht, Hp)
                return out_q, out_t, out_H

            self._jit_cache[key] = jax.jit(jax.vmap(one))
        return self._jit_cache[key]

    def _flow_b(self):
        if "flow" not in self._jit_cache:
            from ..core import camera as camera_mod

            def flow(coarse, model):
                u, v = camera_mod.warp(
                    model, coarse.xs, coarse.ys, coarse.idepth, coarse.intrinsics
                )
                validf = coarse.valid.astype(Float)
                d = jnp.abs(coarse.xs - u) + jnp.abs(coarse.ys - v)
                return jnp.sum(d * validf) / jnp.sum(validf)

            self._jit_cache["flow"] = jax.jit(jax.vmap(flow))
        return self._jit_cache["flow"]

    def _pad_prior_to(self, F: int):
        """Grow the (B, k, 6, k, 6) prior to F slots (zero blocks + anchor
        tail at the current models — the tail anchors multiply zero H, so
        their values are inert; same contract as ``SlidingWindow._prior_for``)."""
        B = self.batch
        k = self.prior_H.shape[1]
        if k == F:
            return
        Hp = jnp.zeros((B, F, 6, F, 6), Float)
        Hp = Hp.at[:, :k, :, :k, :].set(self.prior_H)
        aq = jnp.concatenate(
            [self.prior_anchors.q]
            + [self.models[i].q[:, None] for i in range(k, F)], axis=1
        )
        at = jnp.concatenate(
            [self.prior_anchors.t]
            + [self.models[i].t[:, None] for i in range(k, F)], axis=1
        )
        self.prior_H = Hp
        self.prior_anchors = Pose(aq, at)

    def _marginalize_oldest_b(self):
        """Lockstep marginalization of slot 1 across all lanes (the increment
        form — see ``SlidingWindow._marginalize_oldest`` for why)."""
        F = len(self.models)
        self._pad_prior_to(F)
        win = self._window_b(self.models, self.images)
        keep = [0] + list(range(2, F))
        kept_models = [self.models[i] for i in keep]
        kept_images = [self.images[i] for i in keep]
        win_kept = self._window_b(kept_models, kept_images)
        H_new = self._marginalizer_b(F)(
            win, win_kept, self.idepth,
            self.prior_H, self.prior_anchors.q, self.prior_anchors.t,
        )
        self.images = kept_images
        self.images_coarse = [self.images_coarse[i] for i in keep]
        self.models = kept_models
        self.frame_ids = self.frame_ids[keep]
        self.prior_H = H_new
        m = self._stacked_models()
        self.prior_anchors = Pose(m.q, m.t)

    # -- public API ----------------------------------------------------------

    def start(self, depths, grays, c2w: Pose | None = None) -> int:
        """Initialize all B lanes with their first keyframes.

        ``depths``/``grays``: (B, H, W) stacks; ``c2w``: Pose with leading
        (B,) (default: identity for every lane).  Returns the shared frame id.
        """
        depths = self._shard(jnp.asarray(depths))
        grays = self._shard(jnp.asarray(grays))
        B = depths.shape[0]
        self.batch = B
        if c2w is None:
            c2w = pose_mod.identity((B,))
        fid = self._next_id
        self._next_id += 1
        pyr = self._pyr_b(grays)
        kf = self._precompute_b(depths, pyr)
        self.kf_levels = kf.levels
        self.kf_c2w = c2w
        self.idepth = kf.levels[0].idepth
        self.images = [grays.astype(jnp.float32)]
        self.images_coarse = [pyr[self.coarse_level].astype(jnp.float32)]
        self.models = [pose_mod.identity((B,))]
        self.frame_ids = np.full((1, B), fid, np.int64)
        self.prior_H = jnp.zeros((B, 1, 6, 1, 6), Float)
        self.prior_anchors = Pose(
            self.models[0].q[:, None], self.models[0].t[:, None]
        )
        self.keyframe_switches = np.zeros((B,), np.int64)
        return fid

    def add_frame(self, depths, grays, c2w_init: Pose):
        """Advance every lane by one frame; returns ``(frame_ids (F, B),
        refined Pose (B, F))`` — the camera-to-world estimates of the frames
        currently in each lane's window (slot order per lane; after a lane's
        keyframe switch its slots are reordered newest-first, consistent with
        ``frame_ids[:, lane]``)."""
        depths = self._shard(jnp.asarray(depths))
        grays = self._shard(jnp.asarray(grays))
        B = self.batch
        fid = self._next_id
        self._next_id += 1
        if "rel" not in self._jit_cache:
            self._jit_cache["rel"] = jax.jit(
                jax.vmap(
                    lambda cq, ct, kq, kt: pose_mod.compose(
                        pose_mod.inverse(Pose(cq, ct)), Pose(kq, kt)
                    )
                )
            )
            self._jit_cache["refined"] = jax.jit(
                jax.vmap(  # lanes
                    jax.vmap(  # window slots
                        lambda kq, kt, mq, mt: pose_mod.compose(
                            Pose(kq, kt), pose_mod.inverse(Pose(mq, mt))
                        ),
                        in_axes=(None, None, 0, 0),
                    )
                )
            )
        model = self._jit_cache["rel"](
            c2w_init.q, c2w_init.t, self.kf_c2w.q, self.kf_c2w.t
        )
        if len(self.models) == self.window_size:
            if self.marginalize:
                self._marginalize_oldest_b()
            else:
                keep = [0] + list(range(2, len(self.models)))
                self.images = [self.images[i] for i in keep]
                self.images_coarse = [self.images_coarse[i] for i in keep]
                self.models = [self.models[i] for i in keep]
                self.frame_ids = self.frame_ids[keep]
                F = len(self.models)
                self.prior_H = jnp.zeros((B, F, 6, F, 6), Float)
                m = self._stacked_models()
                self.prior_anchors = Pose(m.q, m.t)

        self.images.append(grays.astype(jnp.float32))
        pyr_new = self._pyr_b(grays)
        if self.coarse_level > 0:
            self.images_coarse.append(
                pyr_new[self.coarse_level].astype(jnp.float32)
            )
        else:
            self.images_coarse.append(self.images[-1])
        self.models.append(model)
        self.frame_ids = np.concatenate(
            [self.frame_ids, np.full((1, B), fid, np.int64)]
        )

        F = len(self.models)
        self._pad_prior_to(F)
        Hp, aq, at = self.prior_H, self.prior_anchors.q, self.prior_anchors.t
        if self.coarse_level > 0:
            lvl = self.coarse_level
            poses = self._stacked_models()
            win_c = photometric_ba.window_from_tracking(
                self.config, self.intrinsics, self.kf_levels,
                jnp.stack(self.images_coarse, axis=1), poses, level=lvl,
            )
            res_c = self._coarse_solver_b(F)(win_c, Hp * (4.0 ** -lvl), aq, at)
            self.models = [
                Pose(res_c.poses.q[:, i], res_c.poses.t[:, i]) for i in range(F)
            ]
        win = self._window_b(self.models, self.images)
        result = self._solver_b(F)(win, Hp, aq, at, self.idepth)
        self.idepth = result.idepth
        self.models = [
            Pose(result.poses.q[:, i], result.poses.t[:, i]) for i in range(F)
        ]

        ids = self.frame_ids.copy()
        m = self._stacked_models()
        ref = self._jit_cache["refined"](self.kf_c2w.q, self.kf_c2w.t, m.q, m.t)
        refined = Pose(ref.q, ref.t)  # (B, F)

        # per-lane keyframe switch on the tracker flow criterion
        flows = np.asarray(self._flow_b()(self.kf_levels[-1], self.models[-1]))
        switch = flows >= self.config.flow_threshold
        if switch.any():
            switch_dev = self._shard(jnp.asarray(switch))
            mq, mt, Ht = self._switcher_b(F)(switch_dev, m.q, m.t, self.prior_H)
            self.models = [Pose(mq[:, i], mt[:, i]) for i in range(F)]
            self.prior_H = Ht
            # anchors: switching lanes re-anchor at the transferred models
            # (single-lane _switch_keyframe_transfer semantics); lanes that
            # did NOT switch must KEEP their marginalization-time anchors —
            # overwriting them with current post-solve models would zero the
            # prior gradient at the wrong point and couple lanes (a lane's
            # prior would shift whenever ANY other lane switches)
            sw3 = switch_dev[:, None, None]
            self.prior_anchors = Pose(
                jnp.where(sw3, mq, self.prior_anchors.q),
                jnp.where(sw3, mt, self.prior_anchors.t),
            )
            # fresh depth epoch for switching lanes: all-lanes precompute +
            # per-lane select (the parallel.batch pattern)
            kf_new = self._precompute_b(depths, pyr_new)

            def sel(new, old):
                mask = switch_dev.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)

            self.kf_levels = jax.tree_util.tree_map(
                sel, kf_new.levels, self.kf_levels
            )
            self.idepth = sel(kf_new.levels[0].idepth, self.idepth)
            self.kf_c2w = Pose(
                sel(refined.q[:, F - 1], self.kf_c2w.q),
                sel(refined.t[:, F - 1], self.kf_c2w.t),
            )
            # slot reorder (newest first) for switching lanes
            order = [F - 1] + list(range(F - 1))
            self.images = [
                sel(self.images[o], img)
                for o, img in zip(order, self.images)
            ]
            self.images_coarse = [
                sel(self.images_coarse[o], img)
                for o, img in zip(order, self.images_coarse)
            ]
            ids_sw = self.frame_ids[order]
            self.frame_ids = np.where(switch[None, :], ids_sw, self.frame_ids)
            self.keyframe_switches += switch.astype(np.int64)
        return ids, refined
