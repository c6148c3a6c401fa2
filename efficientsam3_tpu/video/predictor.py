"""Host-side tracker predictor: SAM2-style VOS API over the jitted TrackerCore.

Mirrors reference sam3/sam3/model/sam3_tracking_predictor.py:14
(Sam3TrackerPredictor): init_state / add_new_points_or_box / add_new_mask /
propagate_in_video, with per-object outputs kept per frame.

TPU-first structure: all device programs have static shapes —
  - objects are padded to a fixed slot count (`obj_slots`), so adding or
    removing objects never recompiles;
  - the memory bank is a fixed (slots, num_maskmem, 72, 72, 64) array plus
    validity masks, assembled on host from tiny per-frame indices
    (reference's select_closest_cond_frames + stride-r logic,
    sam3_tracker_base.py:596-645);
  - per frame, exactly two programs run: `track` (memory attention + SAM
    heads) and `encode_memory` — or `cond_track` on prompted frames.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.video.tracker import TrackerCore


def select_closest_cond_frames(frame_idx, cond_indices, max_num, keep_first=False):
    """reference sam3_tracker_utils.py:293: pick the temporally closest
    conditioning frames. Returns (selected, unselected) index lists."""
    if max_num == -1 or len(cond_indices) <= max_num:
        return list(cond_indices), []
    selected = set()
    if keep_first:
        selected.add(min(cond_indices))
    before = [t for t in cond_indices if t < frame_idx]
    after = [t for t in cond_indices if t >= frame_idx]
    if before:
        selected.add(max(before))
    if after:
        selected.add(min(after))
    rest = sorted(
        (t for t in cond_indices if t not in selected),
        key=lambda t: abs(t - frame_idx),
    )
    for t in rest:
        if len(selected) >= max_num:
            break
        selected.add(t)
    unselected = [t for t in cond_indices if t not in selected]
    return sorted(selected), unselected


class TrackerPredictor:
    """VOS predictor over per-frame features supplied by an encoder fn."""

    def __init__(
        self,
        core: TrackerCore,
        variables,
        encode_frame,  # image (1, H, W, 3) -> dict with 'sam2_fpn' NHWC levels
        obj_slots: int = 8,
        max_cond_frames_in_attn: int = 4,
        memory_temporal_stride: int = 1,
        max_point_prompts: int = 8,
        trim_past_non_cond_mem: bool = True,
        use_memory_selection: bool = False,
        mf_threshold: float = 0.01,
        fill_hole_area: int = 0,
        cache_memory_kv: bool = True,
        quantize_bank: bool = False,
        mesh=None,
        mesh_axis: str = "objects",
    ):
        self.core = core
        self.variables = variables
        self.encode_frame = encode_frame
        self.obj_slots = obj_slots
        self.max_cond = max_cond_frames_in_attn
        self.stride = memory_temporal_stride
        self.max_points = max_point_prompts
        # memory controls (reference sam3_tracker_base.py:72-74,1069-1106):
        # trim keeps host memory bounded on long videos; memory selection is
        # the SAM2Long-style frame_filter (tracker_base.py:520)
        self.trim_past_non_cond_mem = trim_past_non_cond_mem
        self.quantize_bank = quantize_bank
        self.use_memory_selection = use_memory_selection
        self.mf_threshold = mf_threshold
        self.fill_hole_area = fill_hole_area
        fs = core.feat_size

        def _track(v, tokens, pos, mem, tpos, mem_valid, ptrs, tdiff, pvalid,
                   coords, labels, s0, s1, multimask, max_tdiff=16.0):
            cond = core.apply(
                v, tokens, pos, mem, tpos, mem_valid, ptrs, tdiff, pvalid,
                max_tdiff,
                method=core.condition_features,
            )
            b = tokens.shape[0]
            pix = cond.reshape(b, fs, fs, core.d_model)
            return core.apply(
                v, pix, coords, labels, (s0, s1), multimask,
                method=core.forward_sam_heads,
            )

        def _cond_track(v, tokens, coords, labels, s0, s1, multimask):
            cond = core.apply(v, tokens, method=core.no_mem_features)
            b = tokens.shape[0]
            pix = cond.reshape(b, fs, fs, core.d_model)
            return core.apply(
                v, pix, coords, labels, (s0, s1), multimask,
                method=core.forward_sam_heads,
            )

        def _encode_mem(v, tokens, hi_masks, score, from_pts):
            return core.apply(
                v, tokens, hi_masks, score, from_pts, method=core.encode_memory
            )

        def _cond_mask(v, tokens, masks, s0, s1):
            cond = core.apply(v, tokens, method=core.no_mem_features)
            b = tokens.shape[0]
            pix = cond.reshape(b, fs, fs, core.d_model)
            return core.apply(
                v, pix, (s0, s1), masks, method=core.use_mask_as_output
            )

        # cached-bank fast path: per-frame memory k/v come from the cache
        # built at encode time instead of reprojecting ~36k tokens x 4
        # layers every step (tracker.py condition_features_cached)
        def _track_cached(v, tokens, pos, k_bank, v_bank, tpos, mem_valid,
                          ptrs, tdiff, pvalid, delta, coords, labels, s0, s1,
                          multimask, max_tdiff=16.0):
            cond = core.apply(
                v, tokens, pos, k_bank, v_bank, tpos, mem_valid, ptrs, tdiff,
                pvalid, delta, max_tdiff, shared_ages=True,
                quantize_bank=quantize_bank,
                method=core.condition_features_cached,
            )
            b = tokens.shape[0]
            pix = cond.reshape(b, fs, fs, core.d_model)
            return core.apply(
                v, pix, coords, labels, (s0, s1), multimask,
                method=core.forward_sam_heads,
            )

        def _encode_mem_kv(v, mem):
            return core.apply(v, mem, method=core.encode_memory_kv)

        # the kernel-side bank is single-device; under an object-sharded
        # mesh the cache would need per-shard assembly — keep plain path
        self.cache_kv = cache_memory_kv and mesh is None
        self._kv_delta = None  # lazily jitted tpos_k_delta(variables)
        self._kv_zero = None  # zero (k, v) entry for invalid bank slots
        self._kv_update = None  # lazily jitted donated bank column update

        if mesh is None:
            self._track = jax.jit(_track, static_argnums=(13,))
            self._track_cached = jax.jit(_track_cached, static_argnums=(15,))
            self._encode_mem_kv = jax.jit(_encode_mem_kv)
            self._cond_track = jax.jit(_cond_track, static_argnums=(6,))
            self._encode_mem = jax.jit(_encode_mem, static_argnums=(4,))
            self._cond_mask = jax.jit(_cond_mask)
        else:
            # P3 object-parallel tracking (reference sam3_video_base.py
            # shards masklets across GPUs, :1298): the object-slot batch
            # axis shards over the mesh; variables and per-frame scalars
            # replicate; GSPMD schedules the gathers on ICI.
            from jax.sharding import NamedSharding, PartitionSpec as P

            if obj_slots % mesh.shape[mesh_axis] != 0:
                raise ValueError(
                    f"obj_slots={obj_slots} not divisible by mesh axis "
                    f"{mesh_axis}={mesh.shape[mesh_axis]}"
                )
            repl = NamedSharding(mesh, P())
            obj = NamedSharding(mesh, P(mesh_axis))
            self._track = jax.jit(
                _track, static_argnums=(13,),
                in_shardings=(repl, obj, repl) + (obj,) * 10 + (repl,),
                out_shardings=obj,
            )
            self._cond_track = jax.jit(
                _cond_track, static_argnums=(6,),
                in_shardings=(repl,) + (obj,) * 5,
                out_shardings=obj,
            )
            self._encode_mem = jax.jit(
                _encode_mem, static_argnums=(4,),
                in_shardings=(repl, obj, obj, obj),
                out_shardings=obj,
            )
            self._cond_mask = jax.jit(
                _cond_mask,
                in_shardings=(repl,) + (obj,) * 4,
                out_shardings=obj,
            )

    # ------------------------------------------------------------------

    def init_state(self, frames) -> dict:
        """frames: (T, H, W, 3) array or list of frames (lazy encode)."""
        return {
            "frames": frames,
            "num_frames": len(frames),
            "feat_cache": {},
            "obj_ids": [],  # user object ids, slot-aligned
            "cond_frames": {},  # frame_idx -> per-slot outputs dict
            "non_cond_frames": {},
            "prompts": {},  # frame_idx -> (coords, labels) per slot
        }

    def _features(self, state, frame_idx):
        if frame_idx not in state["feat_cache"]:
            img = np.asarray(state["frames"][frame_idx])[None]
            out = self.encode_frame(jnp.asarray(img, jnp.float32))
            fpn = out["sam2_fpn"]
            # level 0/1 are projected by the mask decoder's conv_s0/conv_s1
            s0, s1 = self.core.apply(
                self.variables, fpn[0], fpn[1],
                method=lambda m, a, b: m.sam_mask_decoder.high_res_convs(a, b),
            )
            fs = self.core.feat_size
            tokens = fpn[2].reshape(1, fs * fs, self.core.d_model)
            state["feat_cache"][frame_idx] = (tokens, s0, s1)
        return state["feat_cache"][frame_idx]

    def _slot(self, state, obj_id) -> int:
        if obj_id in state["obj_ids"]:
            return state["obj_ids"].index(obj_id)
        if len(state["obj_ids"]) >= self.obj_slots:
            raise ValueError(f"too many objects (max {self.obj_slots})")
        state["obj_ids"].append(obj_id)
        return len(state["obj_ids"]) - 1

    def _tile(self, x):
        """Broadcast single-frame features to the object-slot batch."""
        return jnp.broadcast_to(x, (self.obj_slots,) + x.shape[1:])

    def add_new_points_or_box(
        self, state, frame_idx: int, obj_id, points=None, labels=None, box=None
    ):
        """Points: (P, 2) pixel xy at input resolution; labels (P,) 1/0.
        Box: (4,) xyxy -> two corner points labeled 2/3 (reference
        sam1_task_predictor.py:385-396)."""
        slot = self._slot(state, obj_id)
        pts = np.zeros((self.max_points, 2), np.float32)
        labs = -np.ones((self.max_points,), np.int32)
        n = 0
        if box is not None:
            pts[0] = box[:2]
            pts[1] = box[2:]
            labs[0], labs[1] = 2, 3
            n = 2
        if points is not None:
            p = np.asarray(points, np.float32)
            l = np.asarray(labels, np.int32)
            pts[n : n + len(p)] = p
            labs[n : n + len(p)] = l
        prompts = state["prompts"].setdefault(
            frame_idx,
            (
                np.zeros((self.obj_slots, self.max_points, 2), np.float32),
                -np.ones((self.obj_slots, self.max_points), np.int32),
            ),
        )
        prompts[0][slot] = pts
        prompts[1][slot] = labs

        out = self._run_cond_frame(state, frame_idx)
        state["cond_frames"][frame_idx] = out
        # other objects' tracked outputs at this frame stay usable (the
        # reference keeps per-object dicts); only prompted slots move to cond
        nc = state["non_cond_frames"].get(frame_idx)
        if nc is not None:
            if "slot_valid" in nc:
                nc["slot_valid"] = nc["slot_valid"] & ~out["slot_valid"]
                if not nc["slot_valid"].any():
                    state["non_cond_frames"].pop(frame_idx, None)
            else:
                state["non_cond_frames"].pop(frame_idx, None)
        return frame_idx, list(state["obj_ids"]), out["low_res_masks"][: len(state["obj_ids"])]

    def add_new_mask(self, state, frame_idx: int, obj_id, mask):
        """Adopt a binary mask as this object's output on a prompted frame
        (reference sam3_tracking_predictor.py:376 add_new_mask).

        mask: (H, W) bool at any resolution; resized to the model input.
        """
        from efficientsam3_tpu.ops.interpolate import resize_bilinear

        slot = self._slot(state, obj_id)
        tokens, s0, s1 = self._features(state, frame_idx)
        r = self.core.image_size
        m = jnp.asarray(np.asarray(mask, np.float32))[None, None]
        if m.shape[-2:] != (r, r):
            m = resize_bilinear(m, (r, r)) > 0.5
        masks = np.zeros((self.obj_slots, r, r, 1), np.float32)
        masks[slot, :, :, 0] = np.asarray(m[0, 0], np.float32)
        heads = self._cond_mask(
            self.variables, self._tile(tokens), jnp.asarray(masks),
            self._tile(s0), self._tile(s1),
        )
        mem = self._encode_mem(
            self.variables, self._tile(tokens), heads["high_res_masks"],
            heads["object_score_logits"], True,
        )
        sv = np.zeros((self.obj_slots,), bool)
        sv[slot] = True
        new_out = {
            "low_res_masks": np.array(heads["low_res_masks"]),
            "obj_ptr": np.array(heads["obj_ptr"]),
            "object_score_logits": np.array(heads["object_score_logits"]),
            "maskmem": np.array(mem),
            "slot_valid": sv,
        }
        # merge the new slot's row into any existing outputs for this frame
        existing = state["cond_frames"].get(frame_idx) or state[
            "non_cond_frames"
        ].get(frame_idx)
        if existing is not None and "maskmem" in existing:
            for k, v in new_out.items():
                if k == "slot_valid":
                    existing[k][slot] = True
                else:
                    existing[k][slot] = v[slot]
            out = existing
        else:
            out = new_out
        if self.cache_kv:
            out["mem_kv"] = self._encode_mem_kv(
                self.variables, jnp.asarray(out["maskmem"])
            )
        state["cond_frames"][frame_idx] = out
        state["non_cond_frames"].pop(frame_idx, None)
        return frame_idx, list(state["obj_ids"]), out["low_res_masks"][: len(state["obj_ids"])]

    # `add_new_mask_like` alias used by the video pipeline
    def add_new_mask_like(self, state, frame_idx, obj_id, mask):
        return self.add_new_mask(state, frame_idx, obj_id, mask)

    def _run_cond_frame(self, state, frame_idx):
        """Run the prompted-frame path with the EXACT reference prompt-token
        width per object: n clicks + ONE pad point (the SAM prompt encoder
        always appends a single pad, and the TwoWayTransformer attends to pad
        tokens, so width changes numerics). Slots are grouped by width; each
        distinct width compiles once."""
        tokens, s0, s1 = self._features(state, frame_idx)
        coords_all, labs_all = state["prompts"][frame_idx]
        n_per_slot = (labs_all >= 0).sum(axis=1)
        prompted = np.where(n_per_slot > 0)[0]
        core = self.core
        s_n = self.obj_slots
        lr = core.low_res_mask_size
        fs = core.feat_size
        out = {
            "low_res_masks": np.zeros((s_n, 1, lr, lr), np.float32),
            "obj_ptr": np.zeros((s_n, core.d_model), np.float32),
            "object_score_logits": np.zeros((s_n, 1), np.float32),
            "maskmem": np.zeros((s_n, fs, fs, core.mem_dim), np.float32),
            "slot_valid": np.zeros((s_n,), bool),
        }
        for w in sorted({int(n_per_slot[s]) + 1 for s in prompted}):
            group = [s for s in prompted if int(n_per_slot[s]) + 1 == w]
            coords_w = np.zeros((s_n, w, 2), np.float32)
            labs_w = -np.ones((s_n, w), np.int32)
            coords_w[:, : w - 1] = coords_all[:, : w - 1]
            labs_w[:, : w - 1] = labs_all[:, : w - 1]
            # multimask iff <= 1 click (tracker_base.py:1110 _use_multimask
            # with multimask_max_pt_num=1); a box counts as 2 corner points
            multimask = (w - 1) <= 1
            heads = self._cond_track(
                self.variables,
                self._tile(tokens), jnp.asarray(coords_w), jnp.asarray(labs_w),
                self._tile(s0), self._tile(s1), multimask,
            )
            mem = self._encode_mem(
                self.variables, self._tile(tokens), heads["high_res_masks"],
                heads["object_score_logits"], True,
            )
            low = np.array(heads["low_res_masks"])
            ptr = np.array(heads["obj_ptr"])
            sc = np.array(heads["object_score_logits"])
            mm = np.array(mem)
            for s in group:
                out["low_res_masks"][s] = low[s]
                out["obj_ptr"][s] = ptr[s]
                out["object_score_logits"][s] = sc[s]
                out["maskmem"][s] = mm[s]
                out["slot_valid"][s] = True
        if self.cache_kv:
            out["mem_kv"] = self._encode_mem_kv(
                self.variables, jnp.asarray(out["maskmem"])
            )
        return out

    # ------------------------------------------------------------------

    def _slot_ok(self, out, s):
        sv = out.get("slot_valid")
        return sv is None or bool(sv[s])

    def _frame_filter(self, state, s, reverse, frame_idx, r):
        """SAM2Long-style memory selection (tracker_base.py:520 frame_filter):
        walk back at stride r, keep frames whose effective IoU score clears
        mf_threshold; always include the immediately previous frame."""
        num_frames = state["num_frames"]
        if (frame_idx == 0 and not reverse) or (
            frame_idx == num_frames - 1 and reverse
        ):
            return []
        max_num = min(num_frames, self.core.max_obj_ptrs)
        if not reverse:
            scan = range(frame_idx - 1, -1, -r)
            must_include = frame_idx - 1
        else:
            scan = range(frame_idx + 1, num_frames, r)
            must_include = frame_idx + 1
        valid_indices = []
        for i in scan:
            out = state["non_cond_frames"].get(i)
            if out is None or "eff_iou_score" not in out:
                continue
            if out["eff_iou_score"] > self.mf_threshold:
                valid_indices.insert(0, i)
            if len(valid_indices) >= max_num - 1:
                break
        if must_include not in valid_indices:
            valid_indices.append(must_include)
        return valid_indices

    def _gather_memory(self, state, frame_idx, reverse=False):
        """Assemble the fixed-size memory bank (host index logic).

        Per-slot: each object only attends to frames where IT has outputs
        (slot_valid), mirroring the reference's per-object output dicts
        (sam3_tracking_predictor.py per-object obj_output_dict)."""
        core = self.core
        n_mem = core.num_maskmem
        fs = core.feat_size
        mem = np.zeros((self.obj_slots, n_mem, fs, fs, core.mem_dim), np.float32)
        tpos = np.zeros((self.obj_slots, n_mem), np.int32)
        valid = np.zeros((self.obj_slots, n_mem), bool)
        ptrs = np.zeros((self.obj_slots, core.max_obj_ptrs, core.d_model), np.float32)
        tdiff = np.zeros((self.obj_slots, core.max_obj_ptrs), np.float32)
        pvalid = np.zeros((self.obj_slots, core.max_obj_ptrs), bool)
        src = -np.ones((self.obj_slots, n_mem), np.int64)  # source frame ids

        r = self.stride
        sign = -1 if reverse else 1
        cond = state["cond_frames"]
        non_cond = state["non_cond_frames"]

        for s in range(len(state["obj_ids"])):
            cond_ts = sorted(t for t, o in cond.items() if self._slot_ok(o, s))
            if not cond_ts:
                continue
            cond_idx, unsel = select_closest_cond_frames(
                frame_idx, cond_ts, self.max_cond
            )
            slot_i = 0
            for t in cond_idx[:n_mem]:
                mem[s, slot_i] = cond[t]["maskmem"][s]
                tpos[s, slot_i] = 0
                valid[s, slot_i] = True
                src[s, slot_i] = t
                slot_i += 1

            def _mem_lookup(t):
                out = non_cond.get(t)
                if out is None and t in unsel:
                    out = cond.get(t)
                if out is None or "maskmem" not in out or not self._slot_ok(out, s):
                    return None
                return out

            # recent non-cond frames at stride r (tracker_base.py:610-645),
            # or SAM2Long-selected frames when memory selection is on
            if self.use_memory_selection:
                vi = self._frame_filter(state, s, reverse, frame_idx, r)
            for t_pos in range(1, n_mem):
                t_rel = n_mem - t_pos
                if self.use_memory_selection:
                    if t_rel > len(vi):
                        continue
                    prev = vi[-t_rel]
                elif t_rel == 1:
                    prev = frame_idx - sign
                else:
                    if not reverse:
                        prev = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
                    else:
                        prev = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
                out = _mem_lookup(prev)
                if out is None or slot_i >= n_mem:
                    continue
                mem[s, slot_i] = out["maskmem"][s]
                tpos[s, slot_i] = t_pos
                valid[s, slot_i] = True
                src[s, slot_i] = prev
                slot_i += 1

            # object pointers: cond frames (past only) then recent non-cond
            # (tracker_base.py:698-767)
            pi = 0
            for t in cond_idx:
                in_past = t <= frame_idx if not reverse else t >= frame_idx
                if in_past and pi < core.max_obj_ptrs:
                    ptrs[s, pi] = cond[t]["obj_ptr"][s]
                    tdiff[s, pi] = abs(frame_idx - t)
                    pvalid[s, pi] = True
                    pi += 1
            for t_d in range(1, core.max_obj_ptrs):
                if pi >= core.max_obj_ptrs:
                    break
                if self.use_memory_selection:
                    if t_d >= len(vi):
                        break
                    t = vi[-t_d]
                else:
                    t = frame_idx + t_d if reverse else frame_idx - t_d
                    if t < 0 or t >= state["num_frames"]:
                        break
                out = non_cond.get(t)
                if out is None and t in unsel:
                    out = cond.get(t)
                if out is not None and self._slot_ok(out, s):
                    ptrs[s, pi] = out["obj_ptr"][s]
                    tdiff[s, pi] = t_d
                    pvalid[s, pi] = True
                    pi += 1
        return mem, tpos, valid, ptrs, tdiff, pvalid, src

    def _lookup_out(self, state, t):
        out = state["non_cond_frames"].get(t)
        if out is None:
            out = state["cond_frames"].get(t)
        return out

    def _assemble_kv_bank(self, state, src, n_act, tpos, valid):
        """Cached-bank assembly: one (L, slots, S_e, C) k/v entry per bank
        column, kept flat and pre-padded (tracker.flatten_kv_bank).
        Applicable when every active slot selects the SAME frame per
        bank position (the common tracking case; per-slot divergence after
        mid-video prompts falls back to the plain reprojection path).

        The bank is a PERSISTENT device array in ``state`` updated by
        dynamic-update-slice: the 7-entry bank is ~594 MB at flagship dims,
        and re-stacking it from per-frame entries cost ~6 ms/frame of pure
        HBM shuffling (profiled r5). Per frame only the 1-2 columns whose
        frame changed are written (~90 MB). Column order is arbitrary —
        temporal position is carried by ``tpos``/``valid``, which this
        method permutes to match the column map (bank slot j holds whatever
        frame it held last time if that frame is still selected).

        Returns (k_bank, v_bank, tpos_by_column, valid_by_column) or None.
        """
        if n_act == 0:
            return None
        rows = src[:n_act]
        if not (rows == rows[0]).all():
            return None
        desired = [int(t) for t in rows[0]]
        desired_set = {t for t in desired if t >= 0}
        n_mem = len(desired)
        bank = state.get("kv_bank")
        bmap = state.get("kv_bank_frames")
        if bank is None:
            entries = []
            for t in desired:
                if t < 0:
                    entries.append(None)
                    continue
                out = self._lookup_out(state, t)
                if out is None or "mem_kv" not in out:
                    return None
                entries.append(out["mem_kv"])
            if self._kv_zero is None:
                ref = next(e for e in entries if e is not None)
                self._kv_zero = tuple(jnp.zeros_like(a) for a in ref)
            ks = [self._kv_zero[0] if e is None else e[0] for e in entries]
            vs = [self._kv_zero[1] if e is None else e[1] for e in entries]
            # k (L, slots, S_e, C) entries concatenate into the flat
            # pre-padded bank (L, slots, S_pad, C) / (slots, S_pad, md)
            from efficientsam3_tpu.video.tracker import flatten_kv_bank

            bank = flatten_kv_bank(ks, vs)
            bmap = list(desired)
        else:
            held = {f: j for j, f in enumerate(bmap) if f in desired_set}
            free = [j for j, f in enumerate(bmap) if f not in desired_set]
            for t in desired:
                if t < 0 or t in held:
                    continue
                out = self._lookup_out(state, t)
                if out is None or "mem_kv" not in out:
                    return None
                k_e, v_e = out["mem_kv"]
                j = free.pop()
                if self._kv_update is None:
                    import functools

                    @functools.partial(jax.jit, donate_argnums=(0, 1))
                    def _upd(kb, vb, ke, ve, row):
                        # flat bank: entry j occupies rows [j*S_e, (j+1)*S_e)
                        kb = jax.lax.dynamic_update_slice(
                            kb, ke, (0, 0, row, 0)
                        )
                        vb = jax.lax.dynamic_update_slice(vb, ve, (0, row, 0))
                        return kb, vb

                    self._kv_update = _upd
                s_e = k_e.shape[2]
                bank = self._kv_update(bank[0], bank[1], k_e, v_e,
                                       jnp.int32(j * s_e))
                bmap[j] = t
                held[t] = j
        state["kv_bank"] = bank
        state["kv_bank_frames"] = bmap
        # permute host-side tpos/valid from desired order to column order
        pos_of = {f: i for i, f in enumerate(desired) if f >= 0}
        tpos_c = np.zeros_like(tpos)
        valid_c = np.zeros_like(valid)
        for j in range(n_mem):
            i = pos_of.get(bmap[j])
            if i is not None:
                tpos_c[:, j] = tpos[:, i]
                valid_c[:, j] = valid[:, i]
        return bank[0], bank[1], tpos_c, valid_c

    def _run_track_frame(self, state, frame_idx, reverse=False):
        tokens, s0, s1 = self._features(state, frame_idx)
        mem, tpos, valid, ptrs, tdiff, pvalid, src = self._gather_memory(
            state, frame_idx, reverse
        )
        from efficientsam3_tpu.models.common import sine_pos_embed_2d

        fs = self.core.feat_size
        pos = sine_pos_embed_2d(fs, fs, self.core.d_model).reshape(
            fs * fs, self.core.d_model
        )
        empty_pts = jnp.zeros((self.obj_slots, 1, 2), jnp.float32)
        empty_lab = -jnp.ones((self.obj_slots, 1), jnp.int32)
        # ptr tpos normalized by min(num_frames, max_obj_ptrs) - 1
        # (tracker_base.py:703 max_obj_ptrs_in_encoder = min(num_frames, 16))
        max_td = float(min(state["num_frames"], self.core.max_obj_ptrs))
        n_act = len(state["obj_ids"])
        bank = (
            self._assemble_kv_bank(state, src, n_act, tpos, valid)
            if self.cache_kv else None
        )
        if bank is not None:
            tpos, valid = bank[2], bank[3]
            if self._kv_delta is None:
                self._kv_delta = jax.jit(
                    lambda v: self.core.apply(v, method=self.core.tpos_k_delta)
                )(self.variables)
            heads = self._track_cached(
                self.variables,
                self._tile(tokens), pos, bank[0], bank[1],
                jnp.asarray(tpos), jnp.asarray(valid),
                jnp.asarray(ptrs), jnp.asarray(tdiff), jnp.asarray(pvalid),
                self._kv_delta,
                empty_pts, empty_lab, self._tile(s0), self._tile(s1), True,
                jnp.float32(max_td),
            )
        else:
            heads = self._track(
                self.variables,
                self._tile(tokens), pos,
                jnp.asarray(mem), jnp.asarray(tpos), jnp.asarray(valid),
                jnp.asarray(ptrs), jnp.asarray(tdiff), jnp.asarray(pvalid),
                empty_pts, empty_lab, self._tile(s0), self._tile(s1), True,
                jnp.float32(max_td),
            )
        mem_new = self._encode_mem(
            self.variables, self._tile(tokens), heads["high_res_masks"],
            heads["object_score_logits"], False,
        )
        n_act = len(state["obj_ids"])
        score = np.array(heads["object_score_logits"])
        ious = np.array(heads["ious"])
        # per-frame memory quality (tracker_base.py:511 cal_mem_score):
        # mean over active objects of rescaled obj score x best IoU
        obj_norm = np.where(score[:n_act, 0] > 0,
                            1.0 / (1.0 + np.exp(-score[:n_act, 0])) * 2 - 1, 0.0)
        eff = float((obj_norm * ious[:n_act].max(-1)).mean()) if n_act else 0.0
        out = {
            "low_res_masks": np.array(heads["low_res_masks"]),
            "obj_ptr": np.array(heads["obj_ptr"]),
            "object_score_logits": score,
            "maskmem": np.array(mem_new),
            "slot_valid": np.arange(self.obj_slots) < n_act,
            "eff_iou_score": eff,
        }
        if self.cache_kv:
            # device-resident: transferring the (slots, L, S_e, C) cache to
            # host would cost more than the projection it saves
            out["mem_kv"] = self._encode_mem_kv(self.variables, mem_new)
        return out

    def _trim_non_cond(self, state, frame_idx, reverse=False):
        """Bound host memory on long videos: drop the spatial memory of the
        non-cond frame that just fell out of the attention window
        (tracker_base.py:1069-1106 trim_past_non_cond_mem_for_eval). Small
        per-frame outputs (masks/pointers/scores) are kept."""
        if not self.trim_past_non_cond_mem:
            return
        sign = -1 if reverse else 1
        past = frame_idx - sign * self.stride * self.core.num_maskmem
        out = state["non_cond_frames"].get(past)
        if out is not None and "maskmem" in out:
            if not self.use_memory_selection or (
                out.get("eff_iou_score", 0.0) < self.mf_threshold
            ):
                del out["maskmem"]
                out.pop("mem_kv", None)  # frees the device-side k/v cache
        if self.use_memory_selection:
            # high-score frames survive the window above; still trim far-past
            # ones (tracker_base.py:1098-1106)
            far = frame_idx - sign * 20 * self.core.max_obj_ptrs
            out = state["non_cond_frames"].get(far)
            if out is not None and "maskmem" in out:
                del out["maskmem"]
                out.pop("mem_kv", None)

    def propagate_in_video(self, state, start_frame_idx=None, reverse=False):
        """Yield (frame_idx, obj_ids, low_res_mask_logits) per frame."""
        if not state["cond_frames"]:
            raise ValueError("add prompts before propagating")
        if start_frame_idx is None:
            start_frame_idx = min(state["cond_frames"])
        n_obj = len(state["obj_ids"])
        order = (
            range(start_frame_idx, -1, -1)
            if reverse
            else range(start_frame_idx, state["num_frames"])
        )
        for t in order:
            if t in state["cond_frames"]:
                out = state["cond_frames"][t]
            else:
                out = self._run_track_frame(state, t, reverse)
                state["non_cond_frames"][t] = out
                self._trim_non_cond(state, t, reverse)
            masks = out["low_res_masks"][:n_obj]
            if self.fill_hole_area > 0 and n_obj:
                from efficientsam3_tpu.ops.cc import fill_holes_in_mask_scores_host

                # host C++ path with remove_sprinkles=True — the reference
                # applies both passes on emission (sam3_video_base.py:970)
                masks = fill_holes_in_mask_scores_host(
                    np.asarray(masks), self.fill_hole_area,
                    remove_sprinkles=True,
                ).reshape(masks.shape)
            yield t, list(state["obj_ids"]), masks

    def remove_object(self, state, obj_id):
        """Drop an object slot (reference sam3_tracking_predictor.py:1232).

        All slot-aligned state shifts down: per-frame outputs (incl.
        slot_valid) AND the per-frame prompt arrays, so a later re-run of a
        prompted frame applies the remaining objects' clicks to the right
        slots."""
        if obj_id not in state["obj_ids"]:
            return
        slot = state["obj_ids"].index(obj_id)
        state["obj_ids"].remove(obj_id)

        def shift(arr, fill=0):
            arr[slot:-1] = arr[slot + 1 :]
            arr[-1] = fill

        for frames in (state["cond_frames"], state["non_cond_frames"]):
            for out in frames.values():
                for k in (
                    "low_res_masks", "obj_ptr", "object_score_logits",
                    "maskmem", "slot_valid",
                ):
                    if k in out:
                        shift(out[k], False if k == "slot_valid" else 0)
                # slot-aligned device cache is stale after the shift; drop it
                # (tracking falls back to reprojection until re-encoded)
                out.pop("mem_kv", None)
        for coords, labs in state["prompts"].values():
            shift(coords)
            shift(labs, -1)
        # prompted frames with no remaining valid slot are no longer cond
        for t in [
            t for t, o in state["cond_frames"].items()
            if "slot_valid" in o and not o["slot_valid"].any()
        ]:
            del state["cond_frames"][t]
            state["prompts"].pop(t, None)
