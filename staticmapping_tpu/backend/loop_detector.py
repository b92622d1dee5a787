"""Loop detection over submap history.

Parity with the reference's ``LoopDetector`` (back_end/loop_detector.{h,cc}):
distance + z gating over history (cc:85-100), optional M2DP descriptor
gating (cc:110-121), the 5-state loop state machine (cc:155-206), candidate
re-registration (CloseLoop, cc:282-318) and mutual-consistency checking
(CheckResult, cc:320-345).

TPU re-expression: candidate gating and descriptor scoring are batched array
ops over the whole history at once; candidate re-registrations are
independent ICP problems — batched with vmap instead of the reference's
tbb::task_group (SURVEY §2.9 P2).
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..common import np_se3
from ..descriptor import m2dp
from ..ops.normals import estimate_normals
from ..parallel.align_pairs import align_pair_list


class LoopStatus(enum.Enum):
    NO_LOOP = 0
    TRYING_TO_CLOSE = 1
    ENTERING = 2
    CONTINOUS = 3
    LEAVING = 4


@dataclasses.dataclass
class LoopDetectorSettings:
    """back_end/loop_detector_options.h:29-40 parity (same defaults)."""

    use_gps: bool = False
    use_descriptor: bool = False
    loop_ignore_threshold: int = 15
    trying_detect_loop_count: int = 1
    nearest_history_pos_num: int = 4
    max_close_loop_distance: float = 25.0
    max_close_loop_z_distance: float = 1.0
    m2dp_match_score: float = 0.99
    accept_scan_match_score: float = 0.75
    # TPU knobs
    normal_leaf_size: int = 8
    nn_tile: int = 1024
    # fixed ICP trip count for the batched loop verifier: a vmapped
    # while-loop would run the whole candidate batch to the slowest
    # element's count (up to the PM Counter(150) budget); 40 fixed trips
    # cover every converging loop registration (typ. < 20 even from
    # drifted guesses) and unconverged candidates fail the score gate
    fixed_iterations: int = 40
    # density normalization anchor (see icp_fast.target_spacing; 0 = raw)
    score_spacing_ref: float = 0.0
    # independent-family acceptance gate: every candidate edge that passes
    # the point-to-plane score must ALSO pass a GICP re-verification at
    # this raw exp(−fitness) score (0 disables).  Measured on the
    # synthetic world (tools/experiment_verifier.py, r05): the
    # shared-family verifier alone false-accepts 12/12 disjoint-area
    # pairs at its production threshold, NDT 12/12 — GICP separates
    # perfectly (true 12/12 at ≥0.644, false 0/12 at ≤0.531).  This is
    # the re-expression of the reference's use of a DIFFERENT library for
    # loop verification (back_end/loop_detector.cc:304).
    independent_gate_min_score: float = 0.55


@dataclasses.dataclass
class LoopEdge:
    target_index: int
    source_index: int
    transform: np.ndarray     # T: source submap frame -> target submap frame
    score: float
    init_guess: np.ndarray = None


@dataclasses.dataclass
class DetectResult:
    current_frame_index: int
    status: LoopStatus
    edges: List[LoopEdge] = dataclasses.field(default_factory=list)
    close_succeed: bool = False


class LoopDetector:
    """Feed submaps with :meth:`add_frame`. Submaps must expose
    ``global_pose`` (np [4,4]), ``cloud`` (PointCloud) and ``descriptor``."""

    def __init__(self, settings: LoopDetectorSettings = None, mesh=None):
        self.settings = settings or LoopDetectorSettings()
        self.frames = []                      # submap refs
        self.descriptors: List[np.ndarray] = []
        self.status = LoopStatus.NO_LOOP
        self.accumulate_count = 0
        self.search_window: Optional[Tuple[int, int]] = None
        from collections import OrderedDict
        self._target_cache = OrderedDict()    # index -> NormalCloud (LRU)
        self._gicp_cache = OrderedDict()      # index -> GicpCloud (LRU)
        self.mesh = mesh                      # optional device mesh for
        # sharded candidate registration (parallel.align_pairs)

    # ------------------------------------------------------------------
    def add_frame(self, submap, do_loop_detect: bool = True) -> DetectResult:
        s = self.settings
        self.frames.append(submap)
        if s.use_descriptor:
            self.descriptors.append(np.asarray(submap.descriptor))
        current = len(self.frames) - 1
        result = DetectResult(current, self.status)
        if not do_loop_detect or len(self.frames) <= s.loop_ignore_threshold:
            return result

        # --- candidate gating (cc:70-100), batched ---
        trans = np.stack([f.global_pose[:3, 3] for f in self.frames])
        cur = trans[current]
        max_index = current
        start, end = 0, max_index - s.loop_ignore_threshold
        if self.search_window is not None:
            start = int(np.clip(self.search_window[0], 0, max_index))
            end = int(np.clip(self.search_window[1], 0, max_index))
        cand = np.arange(start, max(end, start))
        if cand.size:
            xy = np.linalg.norm(trans[cand, :2] - cur[:2], axis=1)
            z = np.abs(trans[cand, 2] - cur[2])
            keep = (xy <= s.max_close_loop_distance) & \
                (z <= s.max_close_loop_z_distance)
            in_dist = cand[keep]
            xy_kept = xy[keep]
        else:
            in_dist = np.array([], dtype=int)
            xy_kept = np.array([])
        closest_index = -1
        if in_dist.size:
            k = int(np.argmin(xy_kept))
            # closest only counts if well within range (cc:97-99)
            if xy_kept[k] < s.max_close_loop_distance * 0.4:
                closest_index = int(in_dist[k])

        # --- descriptor gate (cc:110-121), one batched matmul ---
        if in_dist.size and s.use_descriptor:
            bank = jnp.asarray(np.stack([self.descriptors[i]
                                         for i in in_dist]))
            scores = np.asarray(m2dp.match_many(
                jnp.asarray(self.descriptors[current]), bank))
            well_matched = in_dist[scores > s.m2dp_match_score]
        else:
            well_matched = in_dist

        loop_detection = 1 if well_matched.size else 0

        # pick up to nearest_history_pos_num pairs (cc:124-150)
        maybe_pairs: List[Tuple[int, int]] = []
        if loop_detection:
            wm = np.sort(well_matched)
            k = s.nearest_history_pos_num
            if wm.size >= 2 * k:
                step = wm.size // k
                picks = [int(wm[i * step]) for i in range(k)]
            else:
                picks = [int(x) for x in wm[:k]]
            maybe_pairs = [(p, current) for p in picks]
            if closest_index >= 0 and (closest_index, current) not in maybe_pairs:
                maybe_pairs.append((closest_index, current))

        import os as _os
        _dbg = _os.environ.get("STATICMAPPING_LOOP_DEBUG")
        if _dbg and (loop_detection or in_dist.size
                     or (_dbg == "2" and cand.size)):
            import sys as _sys
            extra = ""
            if _dbg == "2" and cand.size:
                xy_all = np.linalg.norm(trans[cand, :2] - cur[:2], axis=1)
                k = int(np.argmin(xy_all))
                extra = (f" minxy={xy_all[k]:.1f}@{int(cand[k])}"
                         f" dz={abs(trans[cand[k], 2] - cur[2]):.2f}")
            print(f"[loop] submap {current}: in_dist={in_dist.tolist()} "
                  f"well_matched={well_matched.tolist()} "
                  f"state={self.status.name}{extra}",
                  file=_sys.stderr, flush=True)
        self._advance_state_machine(loop_detection)
        result.status = self.status

        if self.status == LoopStatus.CONTINOUS and maybe_pairs:
            result.edges = self._close_loops(maybe_pairs)
            if result.edges:
                result.close_succeed = self._check_result(result)
        return result

    # ------------------------------------------------------------------
    def _advance_state_machine(self, loop_detection: int) -> None:
        """cc:155-206 — exact transition table."""
        s = self.settings
        st = self.status
        if st == LoopStatus.NO_LOOP:
            self.accumulate_count = 0
            if loop_detection == 1:
                self.status = LoopStatus.TRYING_TO_CLOSE
                self.accumulate_count += 1
                if self.accumulate_count >= s.trying_detect_loop_count:
                    self.status = LoopStatus.ENTERING
        elif st == LoopStatus.TRYING_TO_CLOSE:
            if loop_detection == 1:
                self.accumulate_count += 1
                if self.accumulate_count >= s.trying_detect_loop_count:
                    self.status = LoopStatus.ENTERING
            else:
                self.status = LoopStatus.NO_LOOP
        elif st == LoopStatus.ENTERING:
            self.status = (LoopStatus.CONTINOUS if loop_detection == 1
                           else LoopStatus.TRYING_TO_CLOSE)
        elif st == LoopStatus.CONTINOUS:
            if loop_detection == 0:
                self.status = LoopStatus.LEAVING
                self.accumulate_count = 0
        elif st == LoopStatus.LEAVING:
            self.status = (LoopStatus.TRYING_TO_CLOSE if loop_detection == 1
                           else LoopStatus.NO_LOOP)

    # ------------------------------------------------------------------
    def _target_normals(self, index: int):
        """Per-target normals: reuse the submap's own cached normal cloud
        when available (computed once at pair-match time,
        builder/frame.py Submap.normal_cloud — the back end's two normal
        consumers share one computation), else compute into a local
        LRU-bounded cache.  LRU, not FIFO: CONTINOUS-state loops revisit
        the same targets for many consecutive submaps."""
        frame = self.frames[index]
        if hasattr(frame, "normal_cloud"):
            return frame.normal_cloud(self.settings.normal_leaf_size)
        if index in self._target_cache:
            self._target_cache.move_to_end(index)
        else:
            from ..builder.frontend import _target_normals as fused_normals
            self._target_cache[index] = fused_normals(
                frame.cloud, leaf_size=self.settings.normal_leaf_size)
            while len(self._target_cache) > 32:
                self._target_cache.popitem(last=False)
        return self._target_cache[index]

    def _close_loops(self, pairs: List[Tuple[int, int]]) -> List[LoopEdge]:
        """CloseLoop parity (cc:282-318) for ALL candidate pairs at once:
        re-register each source submap onto its target submap with the init
        guess from current globals (z zeroed — the reference's trick,
        cc:290-291). The reference runs candidates on a tbb::task_group
        (cc:224-228) and hard-codes IcpUsingPointMatcher as the verifier —
        a DIFFERENT matcher than the front end, so loop acceptance does not
        share the odometry's failure modes (cc:304).  Here the verifier is
        the IcpPointMatcher pipeline (registration/icp_pm.py: hash-thinned
        reading at the PM RandomSampling 0.9 probability, Counter(150)
        iteration budget) batched as ONE ``align_pair_list`` call — vmapped
        on a single device (batch-gridded Pallas NN kernel), sharded over
        ``self.mesh`` when set."""
        from ..registration.icp_pm import IcpPointMatcher, _hash_thin
        pm = IcpPointMatcher()
        s = self.settings
        # speculative multi-guess registration (SURVEY §7.3): by the time a
        # loop closes, yaw drift can put the odometry guess outside ICP's
        # convergence basin — each candidate runs from several yaw-perturbed
        # guesses IN THE SAME BATCH (free parallelism on the batch-gridded
        # kernel) and keeps its best-fitness result, which also decorrelates
        # the per-candidate local minima before the mutual-consistency vote.
        yaw_offsets = (0.0, 0.06, -0.06)
        G = len(yaw_offsets)
        sources, targets, guesses = [], [], []
        for target_id, source_id in pairs:
            g0 = np_se3.inverse(self.frames[target_id].global_pose) @ \
                self.frames[source_id].global_pose
            g0 = g0.copy()
            g0[2, 3] = 0.0
            src = _hash_thin(self.frames[source_id].cloud,
                             pm.reading_sample_prob)
            tgt = self._target_normals(target_id)
            for dy in yaw_offsets:
                g = g0.copy()
                g[:3, :3] = g0[:3, :3] @ np_se3.euler_to_matrix(
                    np.array([0.0, 0.0, dy]))
                sources.append(src)
                targets.append(tgt)
                guesses.append(g)
        Ts, scores = align_pair_list(
            sources, targets, guesses, mesh=self.mesh,
            dist_outlier_ratio=pm.dist_outlier_ratio,
            max_iteration=pm.max_iteration,
            # candidates arrive 1..nearest_history_pos_num+1 at a time —
            # pad to one fixed batch shape so the program compiles once,
            # not once per candidate count
            pad_to=G * (s.nearest_history_pos_num + 1),
            fixed_iterations=s.fixed_iterations,
            score_spacing_ref=s.score_spacing_ref)
        import os as _os
        if _os.environ.get("STATICMAPPING_LOOP_DEBUG"):
            import sys as _sys
            print(f"[loop] pairs={pairs} scores="
                  f"{[round(float(x), 3) for x in scores]} "
                  f"accept>{s.accept_scan_match_score}",
                  file=_sys.stderr, flush=True)
        edges = []
        for k, (target_id, source_id) in enumerate(pairs):
            block = slice(k * G, (k + 1) * G)
            best = int(np.argmax(scores[block])) + k * G
            score = scores[best]
            if score > s.accept_scan_match_score:
                edges.append(LoopEdge(
                    target_id, source_id,
                    np_se3.normalize_rotation(
                        np.asarray(Ts[best], dtype=np.float64)),
                    score=-math.log(max(score, 1e-9)),
                    init_guess=guesses[k * G]))
        if edges and s.independent_gate_min_score > 0:
            edges = self._independent_gate(edges)
        return edges

    def _gicp_cloud(self, index: int):
        """Per-submap GicpCloud (k-NN disk normals), LRU-cached — the
        independent gate's representation.  Built on a 4× slot stride of
        the (voxel-compacted) submap cloud: the k-NN normal build is
        O(N²) and the gate is an accept/reject vote, not a fine
        registration — ~8k points discriminate as well as 32k
        (tools/experiment_verifier.py used 16k-cap clouds)."""
        from ..registration.gicp import compute_point_normals
        from ..registration.icp_fast import target_spacing
        if index in self._gicp_cache:
            self._gicp_cache.move_to_end(index)
        else:
            thin = jax.tree.map(lambda x: x[::4],
                                self.frames[index].cloud)
            gc = compute_point_normals(thin, k=20)
            # median NN spacing of the THINNED cloud (device scalar, read
            # back with the gate scores): thinning inflates spacing ~2x,
            # which deflates exp(-avg_dist) — the gate normalizes by it so
            # the calibrated threshold is density-portable (same
            # score_spacing_ref mechanism as every other score)
            self._gicp_cache[index] = (gc, target_spacing(gc))
            while len(self._gicp_cache) > 16:
                self._gicp_cache.popitem(last=False)
        return self._gicp_cache[index]

    def _independent_gate(self, edges: List[LoopEdge]) -> List[LoopEdge]:
        """Re-verify accepted edges with a genuinely different
        registration family (GICP disk-covariance ICP) and drop edges it
        rejects — see ``independent_gate_min_score``.  The edge TRANSFORM
        stays the point-to-plane result (more accurate when true: 2.7 cm
        vs experiment's drifted guesses); GICP contributes an independent
        accept/reject vote from a short refinement at that pose."""
        from ..registration.gicp import align_gicp
        s = self.settings
        import os as _os
        # all aligns dispatch async; ONE packed readback for the scores —
        # a per-edge float() sync would block the host on the whole device
        # queue (including in-flight front-end chunks) per edge
        # 2 m correspondence gate: the experiment's calibrated regime —
        # a TIGHT gate is what makes disjoint-area pairs score low
        outs = []
        spacings = []
        for e in edges:
            src_g, _ = self._gicp_cloud(e.source_index)
            tgt_g, sp = self._gicp_cloud(e.target_index)
            outs.append(align_gicp(
                src_g, tgt_g, jnp.asarray(e.transform, dtype=jnp.float32),
                max_correspondence_dist=2.0, max_iteration=8)[1])
            spacings.append(sp)
        scores = jnp.stack(outs)
        if s.score_spacing_ref > 0:
            # exp(-avg_d)^(ref/spacing) == exp(-avg_d * ref/spacing): the
            # density-normalized fitness (icp_fast.target_spacing)
            scores = scores ** (s.score_spacing_ref /
                                jnp.maximum(jnp.stack(spacings), 1e-3))
        scores = np.asarray(scores)
        kept = [e for e, g in zip(edges, scores)
                if float(g) > s.independent_gate_min_score]
        if _os.environ.get("STATICMAPPING_LOOP_DEBUG"):
            import sys as _sys
            print(f"[loop] gicp gate: "
                  f"{[round(float(g), 3) for g in scores]} "
                  f"(min {s.independent_gate_min_score}) kept "
                  f"{len(kept)}/{len(edges)}", file=_sys.stderr, flush=True)
        return kept

    def _check_result(self, result: DetectResult) -> bool:
        """CheckResult parity (cc:320-345): all edges must agree on the
        source pose within 0.25 m / 0.02 rad."""
        if len(result.edges) <= 1:
            return False
        first = result.edges[0]
        first_pose = self.frames[first.target_index].global_pose @ \
            first.transform
        import os as _os
        for edge in result.edges[1:]:
            pose = self.frames[edge.target_index].global_pose @ edge.transform
            diff = np_se3.inverse(first_pose) @ pose
            trans_diff = np.linalg.norm(diff[:3, 3])
            rot_diff = np.linalg.norm(np_se3.matrix_to_euler(diff[:3, :3]))
            if _os.environ.get("STATICMAPPING_LOOP_DEBUG"):
                import sys as _sys
                print(f"[loop] consistency: trans {trans_diff:.3f} m "
                      f"rot {rot_diff:.4f} rad (limits 0.25/0.02)",
                      file=_sys.stderr, flush=True)
            if trans_diff > 0.25 or rot_diff > 0.02:
                return False
        return True
