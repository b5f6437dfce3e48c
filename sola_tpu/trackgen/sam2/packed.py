"""Cross-video packed propagation: (video, object) slots in ONE scan.

The reference tracks one video at a time with at most 4 objects per
propagation pass (generate_tokens_grid.py:181-186); a video whose next
same-frame prompt batch has 2 objects runs the full SAM2 memory stack at
2/4 utilization. On TPU the object axis is a compile-time batch dimension
(`SAM2VideoPredictor.obj_batch`) and the per-slot state (memory banks,
frame schedules, conditioning frames) is already carried per-slot — so
slots from DIFFERENT videos can share one `lax.scan` program. This module
generalizes the propagation batch axis from (object,) to (video, object):

* a ``PackedFeatures`` buffer concatenates the packed videos' encoded
  frame features along the frame axis (one gather index space);
* the scan step gathers per-slot frame features (``feats[gidx]``) instead
  of broadcasting one frame to all slots; frame indices, conditioning
  anchors, and bank updates are per-slot vectors (one-hot scatters replace
  the scalar ``dynamic_update_index_in_dim``);
* schedules are host-built numpy: slot s tracks frames ``cond_s+1..T_s-1``
  (forward) / ``cond_s-1..0`` (reverse), padded to the longest slot with
  ``active=False`` steps whose bank writes are masked out.

Numerics match the sequential predictor exactly: no op mixes slots, so a
slot's compute stream is identical whether its neighbors carry the same
video, another video, or padding (asserted in tests/test_packed.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.trackgen.sam2.common import sine_position_encoding
from sola_tpu.trackgen.sam2.model import SAM2Model
from sola_tpu.trackgen.sam2.video import (InferenceState,
                                          SAM2VideoPredictor)


def _bucket(n: int, step: int = 32) -> int:
    return ((n + step - 1) // step) * step


@dataclasses.dataclass
class PackedFeatures:
    """Concatenated frame features of a pack of videos (one gather space).

    ``offsets[v] + local_frame`` is the global gather index of video v's
    frame. The frame axis is bucketed to multiples of 32 so repacking with
    different video-length combinations reuses compiled programs.
    """
    feats: dict                   # pix/s0/s1: (sumT_bucket, h, w, c)
    offsets: np.ndarray           # (n_videos,) int
    lengths: np.ndarray           # (n_videos,) int
    orig_hws: list                # per video (H, W)

    @classmethod
    def build(cls, states: Sequence[InferenceState]) -> "PackedFeatures":
        """Entries sharing one ``InferenceState`` object (e.g. several
        expressions of the same video in the gdino flavor) share one
        feature region — the buffer holds each unique state once."""
        uniq: dict = {}
        which = []
        for s in states:
            if id(s) not in uniq:
                uniq[id(s)] = (len(uniq), s)
            which.append(uniq[id(s)][0])
        ustates = [s for _, s in sorted(uniq.values(),
                                        key=lambda t: t[0])]
        ulen = np.asarray([s.num_frames for s in ustates], np.int64)
        uoff = np.concatenate([[0], np.cumsum(ulen)[:-1]])
        total = int(ulen.sum())
        pad = _bucket(total) - total
        feats = {}
        for k in ("pix", "s0", "s1"):
            parts = [s.features[k] for s in ustates]
            if pad:
                z = jnp.zeros((pad,) + parts[0].shape[1:], parts[0].dtype)
                parts = parts + [z]
            feats[k] = jnp.concatenate(parts, axis=0)
        which = np.asarray(which)
        return cls(feats=feats, offsets=uoff[which], lengths=ulen[which],
                   orig_hws=[s.orig_hw for s in states])


@dataclasses.dataclass
class SlotPlan:
    """One packed propagation round's slot layout."""
    video: np.ndarray             # (b,) pack-video index (-1 = padding)
    cond: np.ndarray              # (b,) conditioning frame (0 for padding)
    length: np.ndarray            # (b,) that slot's video length (1 pad)


class PackedPropagator:
    """Bidirectional propagation for slots spanning multiple videos.

    Wraps an existing ``SAM2VideoPredictor`` (same model/variables/knobs);
    its ``obj_batch`` is the pack width. Produces, per round, the same
    artifacts the sequential engine consumes: per-slot full-resolution
    binary masklets for every frame of the slot's video plus per-frame
    object tokens.
    """

    def __init__(self, predictor: SAM2VideoPredictor):
        self.pred = predictor
        self.model: SAM2Model = predictor.model
        self.cfg = predictor.cfg
        self.b = predictor.obj_batch
        self.cdt = predictor.compute_dtype
        cfg, model, cdt = self.cfg, self.model, self.cdt
        b = self.b

        def _apply(v, method, *args, **kw):
            return model.apply(v, *args, method=method, **kw)

        @jax.jit
        def cond_step(v, feats, gidx, masks):
            """Consolidate per-slot conditioning frames in one dispatch:
            gather each slot's cond-frame features, run the mask-as-output
            SAM pass, and encode the conditioning memory."""
            pix = feats["pix"][gidx].astype(cdt)
            s0 = feats["s0"][gidx].astype(cdt)
            s1 = feats["s1"][gidx].astype(cdt)
            out = _apply(v, SAM2Model.mask_as_output, pix, s0, s1,
                         masks.astype(jnp.float32))
            mem = _apply(v, SAM2Model.encode_memory, pix,
                         out["high_res_masks"][:, 0])
            return mem.astype(cdt), out["obj_ptr"]

        self._cond_step = cond_step

        @jax.jit
        def cond_init(v, feats, gidx, masks, cond_idx):
            """cond_step + the full initial bank construction fused into
            ONE dispatch per round (the eager .at/where chain after
            cond_step was ~6 relay round trips)."""
            mem, cond_ptr = cond_step(v, feats, gidx, masks)
            banks = list(predictor._empty_banks())
            banks[0] = banks[0].at[:, 0].set(mem)
            banks[1] = banks[1].at[:, 0].set(True)
            pslot = cond_idx % cfg.max_obj_ptrs
            poh = jax.nn.one_hot(pslot, cfg.max_obj_ptrs, dtype=bool)
            banks[5] = jnp.where(poh[..., None],
                                 cond_ptr.astype(cdt)[:, None], banks[5])
            banks[6] = jnp.where(poh, cond_idx[:, None], banks[6])
            banks[7] = banks[7] | poh
            return tuple(banks), cond_ptr

        self._cond_init = cond_init

        def step(v, feats, carry, inputs, reverse: bool):
            (cond_mem, cond_valid, recent_mem, recent_frame, recent_valid,
             obj_ptrs, ptr_frame, ptr_valid, seed_buf, cond_min) = carry
            gidx, fidx, active = inputs          # each (b,)
            pix = feats["pix"][gidx].astype(cdt)
            s0 = feats["s0"][gidx].astype(cdt)
            s1 = feats["s1"][gidx].astype(cdt)
            pos = jnp.broadcast_to(
                sine_position_encoding(pix.shape[1], pix.shape[2],
                                       pix.shape[3]).astype(cdt)[None],
                pix.shape)

            stride = max(cfg.memory_stride, 1)
            fcol = fidx[:, None]
            tpos = jnp.abs(fcol - recent_frame)
            rec_ok = recent_valid & (tpos >= 1) & (
                tpos <= cfg.num_recent * stride)
            if reverse:
                rec_ok = rec_ok & (recent_frame >= fcol)
            else:
                rec_ok = rec_ok & (recent_frame <= fcol)
            tpos = jnp.clip((tpos + stride - 1) // stride, 1, cfg.num_recent)
            ptr_ok = ptr_valid & (jnp.abs(fcol - ptr_frame)
                                  < cfg.max_obj_ptrs)
            if reverse:
                ptr_ok = ptr_ok & (ptr_frame >= fcol)
            else:
                ptr_ok = ptr_ok & (ptr_frame <= fcol)
            conditioned = _apply(
                v, SAM2Model.condition_features, pix, pos, cond_mem,
                cond_valid, recent_mem, rec_ok, tpos, obj_ptrs, ptr_ok)
            coords = jnp.zeros((b, 1, 2), cdt)
            labels = jnp.full((b, 1), -1, jnp.int32)
            out = _apply(v, SAM2Model.sam_heads, conditioned, s0, s1,
                         coords, labels, None,
                         cfg.multimask_output_for_tracking, True)
            mem = _apply(v, SAM2Model.encode_memory, conditioned,
                         out["high_res_masks"][:, 0]).astype(cdt)
            obj_ptr_new = out["obj_ptr"].astype(cdt)

            # per-slot ring updates: one-hot scatters gated on `active`
            do_push = active & (((fidx - cond_min) % stride) == 0)
            slot = (fidx // stride) % cfg.num_recent
            oh = (jax.nn.one_hot(slot, cfg.num_recent, dtype=bool)
                  & do_push[:, None])
            recent_mem = jnp.where(oh[..., None, None, None],
                                   mem[:, None], recent_mem)
            recent_frame = jnp.where(oh, fcol, recent_frame)
            recent_valid = recent_valid | oh
            pslot = fidx % cfg.max_obj_ptrs
            poh = (jax.nn.one_hot(pslot, cfg.max_obj_ptrs, dtype=bool)
                   & active[:, None])
            obj_ptrs = jnp.where(poh[..., None], obj_ptr_new[:, None],
                                 obj_ptrs)
            ptr_frame = jnp.where(poh, fcol, ptr_frame)
            ptr_valid = ptr_valid | poh

            if not reverse:
                rel = fidx - cond_min
                sslot = jnp.clip(rel // stride - 1, 0, cfg.num_recent - 1)
                write = active & (rel >= 1) & (
                    rel <= cfg.num_recent * stride) & (rel % stride == 0)
                soh = (jax.nn.one_hot(sslot, cfg.num_recent, dtype=bool)
                       & write[:, None]).T        # (R, b)
                seed_buf = jnp.where(soh[..., None, None, None],
                                     mem[None], seed_buf)

            carry = (cond_mem, cond_valid, recent_mem, recent_frame,
                     recent_valid, obj_ptrs, ptr_frame, ptr_valid, seed_buf,
                     cond_min)
            return carry, (out["low_res_masks"][:, 0].astype(jnp.bfloat16),
                           out["obj_ptr"])

        @partial(jax.jit, static_argnames=("reverse",))
        def scan_pass(v, feats, carry, xs, reverse):
            return jax.lax.scan(
                lambda c, x: step(v, feats, c, x, reverse), carry, xs)

        self._scan_pass = scan_pass

        @jax.jit
        def reseed(seed_buf, cond_min, lengths):
            """Rebuild the recent ring for the reverse pass from the
            forward pass's stashed post-cond memories (the per-slot
            vectorization of video.py's seed_frames loop)."""
            stride = max(cfg.memory_stride, 1)
            R = cfg.num_recent
            rec_mem = jnp.zeros(
                (b, R) + seed_buf.shape[2:], seed_buf.dtype)
            rec_frame = jnp.full((b, R), -10 ** 6, jnp.int32)
            rec_valid = jnp.zeros((b, R), bool)
            for i in range(R):
                f = cond_min + stride * (i + 1)
                ok = f < lengths
                oh = (jax.nn.one_hot((f // stride) % R, R, dtype=bool)
                      & ok[:, None])
                rec_mem = jnp.where(oh[..., None, None, None],
                                    seed_buf[i][:, None], rec_mem)
                rec_frame = jnp.where(oh, f[:, None], rec_frame)
                rec_valid = rec_valid | oh
            return rec_mem, rec_frame, rec_valid

        self._reseed = reseed

    # ------------------------------------------------------------------

    def _schedule(self, plan: SlotPlan, reverse: bool,
                  offsets: np.ndarray):
        """(L, b) gidx/fidx/active numpy schedule for one pass direction,
        L padded to a multiple of scan_chunk (0 when no slot has work)."""
        b = self.b
        if reverse:
            lens = plan.cond.copy()                      # frames cond-1..0
        else:
            lens = plan.length - 1 - plan.cond           # cond+1..T-1
        lens = np.maximum(lens, 0) * (plan.video >= 0)
        L = int(lens.max()) if b else 0
        if L == 0:
            return None
        chunk = self.pred.scan_chunk
        L = ((L + chunk - 1) // chunk) * chunk
        t = np.arange(L)[:, None]                        # (L, 1)
        if reverse:
            fidx = plan.cond[None, :] - 1 - t
        else:
            fidx = plan.cond[None, :] + 1 + t
        active = (t < lens[None, :]) & (plan.video[None, :] >= 0)
        fidx = np.clip(fidx, 0, np.maximum(plan.length - 1, 0)[None, :])
        vid = np.maximum(plan.video, 0)
        gidx = offsets[vid][None, :] + fidx
        return (gidx.astype(np.int32), fidx.astype(np.int32), active,
                lens)

    def run_round(self, pack: PackedFeatures, plan: SlotPlan,
                  cond_masks: np.ndarray, collect: bool = True) -> dict:
        """One packed round: consolidate conditioning frames, propagate
        forward then reverse, fetch per-slot binary masklets + tokens.

        ``cond_masks``: (b, S, S) float32 prompt masks (zeros for padding
        slots). Returns {"masks": {slot: {frame: (H, W) uint8}},
        "tokens": {slot: {frame: (d,) float32}}}.

        ``collect=False`` skips the output fetch and returns
        {"banks": <final carry banks>} — the scan compute only, for
        benchmarking the compute/transfer split (callers must force
        execution by fetching a value from the banks).
        """
        cfg, b = self.cfg, self.b
        pred = self.pred
        v = pred.compute_variables
        vid = np.maximum(plan.video, 0)
        cond_gidx = jnp.asarray(
            (pack.offsets[vid] + plan.cond).astype(np.int32))

        # ---- conditioning consolidation (slot 0 of the cond bank) ----
        # ONE uint8 upload shared by the cond pass and the collect phase
        # (fp32 was 4x the link bytes for the same 0/1 content)
        cond_u8 = jnp.asarray(
            (np.asarray(cond_masks) > 0.5).astype(np.uint8))
        banks, cond_ptr = self._cond_init(
            v, pack.feats, cond_gidx, cond_u8,
            jnp.asarray(plan.cond.astype(np.int32)))
        banks = list(banks)

        h = cfg.feat_hw
        seed0 = jnp.zeros((cfg.num_recent, b, h, h, cfg.mem_dim), self.cdt)
        cond_min = jnp.asarray(plan.cond.astype(np.int32))
        lengths = jnp.asarray(plan.length.astype(np.int32))

        passes = {}
        carry = tuple(banks) + (seed0, cond_min)
        fwd = self._schedule(plan, False, pack.offsets)
        if fwd is not None:
            gidx, fidx, active, lens = fwd
            carry, outs = self._run_segments(v, pack.feats, carry,
                                             gidx, fidx, active, False)
            passes[False] = (outs, fidx, active)
        # reverse: keep cond/pointer banks accumulated in the forward pass,
        # re-seed the recent ring from post-cond forward memories
        banks = list(carry[:8])
        banks[2], banks[3], banks[4] = self._reseed(carry[8], cond_min,
                                                    lengths)
        carry = tuple(banks) + (seed0, cond_min)
        rev = self._schedule(plan, True, pack.offsets)
        if rev is not None:
            gidx, fidx, active, lens = rev
            carry, outs = self._run_segments(v, pack.feats, carry,
                                             gidx, fidx, active, True)
            passes[True] = (outs, fidx, active)

        if not collect:
            return {"banks": carry[:8]}
        return self._collect(pack, plan, passes, cond_u8, cond_ptr)

    def _run_segments(self, v, feats, carry, gidx, fidx, active, reverse):
        """Chain fixed-size scan segments (compile-bounded like the
        sequential path); returns (carry, [(lo, ptr), ...])."""
        chunk = self.pred.scan_chunk
        outs = []
        for s in range(0, gidx.shape[0], chunk):
            xs = (jnp.asarray(gidx[s:s + chunk]),
                  jnp.asarray(fidx[s:s + chunk]),
                  jnp.asarray(active[s:s + chunk]))
            carry, out = self._scan_pass(v, feats, carry, xs,
                                         reverse=reverse)
            outs.append(out)
        return carry, outs

    def _collect(self, pack: PackedFeatures, plan: SlotPlan, passes: dict,
                 cond_masks: np.ndarray, cond_ptr) -> dict:
        """Fetch outputs: per-video-resolution bit-packed masks + one token
        fetch per pass; distribute to per-slot {frame: mask/token} dicts.
        Canonical small masklets stay DEVICE-RESIDENT ("smalls": per-slot
        (T, sh, sw) bool arrays).

        Dispatch discipline (the remote-relay round trip is ~100 ms, so
        per-slot programs dominated the first version of this path):
        * the conditioning frame goes through the SAME resize+threshold+
          bit-pack program as tracked frames — one program per resolution
          group instead of a fp32 logit fetch + reshape_masklet dispatch
          per slot (numerics identical: linear resize of +-10 logits > 0,
          small = binary resize > 0.5, video.py's "masks"-mode ops);
        * all smalls of a group (cond + both passes) assemble into
          frame-ordered per-slot arrays via ONE gather program;
        * every device->host copy is queued before any blocking fetch."""
        from sola_tpu.core import mask_ops
        pred = self.pred
        active_slots = [s for s in range(self.b) if plan.video[s] >= 0]
        masks = {s: {} for s in active_slots}
        tokens = {s: {} for s in active_slots}

        # group slots by output resolution so each group is one static
        # resize+pack program
        groups = {}
        for s in active_slots:
            groups.setdefault(pack.orig_hws[plan.video[s]], []).append(s)

        fetch = []        # (packed_dev, fidx (L,k), active (L,k), slots, ...)
        group_parts = {}  # (oh, ow) -> [(small_dev, fidx, active), ...]
        for (oh, ow), slots in groups.items():
            sh, sw = mask_ops.reshape_hw(oh, ow)
            sel = np.asarray(slots)
            # conditioning outputs: the prompt mask round-tripped through
            # the model input size, as one (1, k) pseudo-pass
            # (cond_masks is the already-uploaded device uint8 buffer)
            lo_cond = (cond_masks[sel].astype(jnp.float32)
                       * 20.0 - 10.0)[None]
            cpacked, csmall = pred._resize_pack_small(
                lo_cond, oh, ow, sh, sw)
            cfidx = plan.cond[sel][None, :].astype(np.int32)
            call = np.ones((1, len(slots)), bool)
            fetch.append((cpacked, cfidx, call, slots, oh, ow))
            parts = [(csmall, cfidx, call)]
            for reverse, (outs, fidx, active) in passes.items():
                lo = jnp.concatenate([o[0] for o in outs], axis=0)
                packed, small = pred._resize_pack_small(
                    lo[:, sel], oh, ow, sh, sw)
                fetch.append((packed, fidx[:, sel], active[:, sel], slots,
                              oh, ow))
                parts.append((small, fidx[:, sel], active[:, sel]))
            group_parts[(oh, ow)] = parts

        # queue all device->host copies before any blocking fetch: link
        # transfers overlap the host-side unpackbits/distribution loop
        ptrs = {}
        for reverse, (outs, fidx, active) in passes.items():
            p = jnp.concatenate([o[1] for o in outs], axis=0)
            p.copy_to_host_async()
            ptrs[reverse] = (p, fidx, active)
        for packed, *_ in fetch:
            packed.copy_to_host_async()

        # smalls: one gather program per group assembles every slot's
        # frame-ordered small masklet from the concatenated part rows
        smalls = {}
        for (oh, ow), slots in groups.items():
            parts = group_parts[(oh, ow)]
            sm = jnp.concatenate([p[0] for p in parts], axis=0)
            k = len(slots)
            t_max = int(max(plan.length[s] for s in slots))
            rowmap = {}
            off = 0
            for small, fidx_g, act_g in parts:
                for j in range(k):
                    for t in np.nonzero(act_g[:, j])[0]:
                        rowmap[(j, int(fidx_g[t, j]))] = off + int(t)
                off += small.shape[0]
            perm = np.zeros((k, t_max), np.int32)
            for j, s in enumerate(slots):
                for f in range(int(plan.length[s])):
                    perm[j, f] = rowmap[(j, f)]
            out_g = sm[jnp.asarray(perm), jnp.arange(k)[:, None]]
            for j, s in enumerate(slots):
                smalls[s] = out_g[j, :int(plan.length[s])]

        # tokens: conditioning token + per-pass fetches
        cond_np = np.asarray(cond_ptr, np.float32)
        for s in active_slots:
            tokens[s][int(plan.cond[s])] = cond_np[s]
        for reverse, (p, fidx, active) in ptrs.items():
            ptr_np = np.asarray(p, np.float32)
            for s in active_slots:
                for t in np.nonzero(active[:, s])[0]:
                    tokens[s][int(fidx[t, s])] = ptr_np[t, s]

        # full-resolution binary masks: unpack bits, distribute per slot
        for packed, fidx_g, act_g, slots, oh, ow in fetch:
            packed_np = np.asarray(packed)
            L, k = packed_np.shape[:2]
            hi = np.unpackbits(
                packed_np.reshape(L * k, -1), axis=1).reshape(
                    L, k, oh, -1)[..., :ow]
            for j, s in enumerate(slots):
                for t in np.nonzero(act_g[:, j])[0]:
                    masks[s][int(fidx_g[t, j])] = hi[t, j]
        return {"masks": masks, "tokens": tokens, "smalls": smalls}
