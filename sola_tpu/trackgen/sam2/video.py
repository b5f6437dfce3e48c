"""SAM2 video predictor: the 5-method tracking protocol on static state.

Implements the protocol the reference's generation loops drive
(init_state / reset_state / add_new_mask / propagate_in_video / per-frame
``obj_ptr`` harvesting — protocol defined by usage at
generate_tokens_grid.py:142-237), re-designed for XLA:

* upstream SAM2 keeps a Python dict-of-dicts inference state with
  variable-length memory lists; here the state is a pytree of fixed-shape
  device arrays (conditioning slots, a recent-memory ring keyed by absolute
  frame index, a 16-slot object-pointer bank);
* **whole propagation passes run as one ``lax.scan`` program**: frame
  features are encoded once into stacked HBM arrays (bf16), and the scan
  carries the memory banks across frames — zero host round trips inside the
  per-frame hot loop (SURVEY.md §3.4's "THE hot loop");
* the object axis is a padded batch dimension (obj_batch slots) — the
  reference's "batch<=4 objects per pass" becomes a compile-time knob;
* every prompted frame becomes a conditioning slot (multi-onset GT seeding
  supported via ``max_cond_frames``); pass lengths are bucketed so the scan
  compiles O(log T) times per obj_batch, not per video.

Outputs are low-res mask logits resized to the original video resolution —
the same output path as upstream's video predictor (its high-res masks feed
only the memory encoder).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.trackgen.sam2.image_encoder import normalize_image
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


@dataclasses.dataclass
class InferenceState:
    num_frames: int
    obj_batch: int
    features: dict               # stacked arrays: pix/s0/s1 (T, h, w, c)
    pos: jax.Array               # (h, w, d) sine PE (frame-independent)
    orig_hw: tuple
    banks: Optional[tuple] = None
    prompts: dict = dataclasses.field(default_factory=dict)
    output_tokens: dict = dataclasses.field(default_factory=dict)
    obj_ids: list = dataclasses.field(default_factory=list)
    # per-frame device uint8 prompt buffer: uploaded ONCE per batch and
    # shared by cond consolidation + both passes' cond-frame yields (the
    # (obj_batch, S, S) buffer is ~8 MB at S=1024 — re-uploading it per
    # consumer tripled the per-pass link bytes)
    prompt_dev: dict = dataclasses.field(default_factory=dict)
    # host-cached cond-frame outputs keyed (frame_idx, output_mode): the
    # reverse pass re-yields the same cond output the forward pass did
    cond_host: dict = dataclasses.field(default_factory=dict)
    seed_buf: Optional[jax.Array] = None     # (R, B, h, w, mem) fwd seeds
    seed_frames: Optional[np.ndarray] = None
    # device-resident canonical small masklets, accumulated per pass in
    # "masks" mode: list of (frame_idxs, (chunk, n_obj, sh, sw) bool)
    small_parts: Optional[list] = None


class SAM2VideoPredictor:
    def __init__(self, model: SAM2Model, variables: dict,
                 obj_batch: int = 4, feature_dtype=jnp.bfloat16,
                 encode_chunk: int = 4, scan_chunk: int = 16,
                 compute_dtype=jnp.bfloat16):
        """``scan_chunk``: frames per compiled scan segment. Whole passes
        run as chained fixed-length scan programs (banks carried across
        segments) — bounds program size/compile time while keeping the
        per-frame loop host-free.

        ``compute_dtype=bfloat16`` casts params + activations for the
        tracking compute, matching the reference's process-global autocast
        bf16 for SAM2 (generate_tokens_grid.py:84-88); softmax statistics
        stay fp32 via preferred_element_type inside the attention modules.
        """
        self.model = model
        self.cfg: SAM2Config = model.cfg
        self.variables = variables
        self.compute_dtype = compute_dtype
        if compute_dtype == jnp.float32:
            self.compute_variables = variables
        else:
            self.compute_variables = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables)
        self.obj_batch = obj_batch
        self.feature_dtype = feature_dtype
        self.encode_chunk = encode_chunk
        self.scan_chunk = scan_chunk

        cfg = self.cfg

        # IMPORTANT: variables are explicit jit arguments everywhere —
        # closing over the ~GB parameter tree would bake it into the
        # serialized program as constants (breaking compile caches and
        # oversizing remote-compile requests).
        def _japply(v, method, *args):
            return model.apply(v, *args, method=method)

        # the normalized image is cast to compute_dtype BEFORE the encoder:
        # bf16 params x fp32 input would promote the whole Hiera to fp32
        # compute (measured 57 ms/frame; bf16 is the MXU rate and matches
        # the reference's process-global autocast, generate_tokens_grid.py:
        # 84-88)
        enc_dt = self.compute_dtype
        self._encode_image = jax.jit(
            lambda v, img: _japply(v, SAM2Model.encode_image,
                                   img.astype(enc_dt)))

        # raw uint8 frames in, features out: ONE dispatch per chunk and a
        # 1-byte/pixel upload (fp32 frames would ship 4x the bytes over the
        # host link); resize->uint8->normalize matches the per-frame path
        s_ = cfg.image_size

        def _encode_from_raw(v, raw):  # (chunk, H, W, 3) uint8
            x = jax.image.resize(
                raw.astype(jnp.float32),
                (raw.shape[0], s_, s_, 3), method="linear")
            return _japply(v, SAM2Model.encode_image,
                           normalize_image(x.astype(jnp.uint8))
                           .astype(enc_dt))

        self._encode_from_raw = jax.jit(_encode_from_raw)

        # whole-video encode in ONE program: lax.map over fixed-size chunks
        # of device-resident raw frames. The per-chunk dispatch path above
        # exists to overlap host uploads with compute; when frames are
        # already on device (re-encode, packed pipelines, real-hardware
        # DMA feeds) one program avoids a dispatch round trip per chunk
        def _encode_all_from_raw(v, raw):  # (n_chunks, chunk, H, W, 3) u8
            def enc(chunk):
                f = _encode_from_raw(v, chunk)
                return f["pix"], f["s0"], f["s1"]
            pix, s0, s1 = jax.lax.map(enc, raw)
            return {"pix": pix.reshape((-1,) + pix.shape[2:]),
                    "s0": s0.reshape((-1,) + s0.shape[2:]),
                    "s1": s1.reshape((-1,) + s1.shape[2:])}

        self._encode_all_from_raw = jax.jit(_encode_all_from_raw)
        cdt = self.compute_dtype

        # ---- the scan body: one tracked frame ----
        def step(v, carry, inputs, reverse: bool):
            def _apply(method, *args):
                return model.apply(v, *args, method=method)
            (cond_mem, cond_valid, recent_mem, recent_frame, recent_valid,
             obj_ptrs, ptr_frame, ptr_valid, seed_buf, cond_min) = carry
            pix, s0, s1, frame_idx, active = inputs
            b = self.obj_batch
            pix = jnp.broadcast_to(pix.astype(cdt), (b,) + pix.shape)
            s0 = jnp.broadcast_to(s0.astype(cdt), (b,) + s0.shape)
            s1 = jnp.broadcast_to(s1.astype(cdt), (b,) + s1.shape)
            from sola_tpu.trackgen.sam2.common import sine_position_encoding
            pos = jnp.broadcast_to(
                sine_position_encoding(pix.shape[1], pix.shape[2],
                                       pix.shape[3]).astype(cdt)[None],
                pix.shape)

            stride = max(cfg.memory_stride, 1)
            tpos = jnp.abs(frame_idx - recent_frame)
            rec_ok = recent_valid & (tpos >= 1) & (
                tpos <= cfg.num_recent * stride)
            if reverse:
                rec_ok = rec_ok & (recent_frame >= frame_idx)
            else:
                rec_ok = rec_ok & (recent_frame <= frame_idx)
            # temporal-position index in memory-stride units
            tpos = jnp.clip((tpos + stride - 1) // stride, 1, cfg.num_recent)
            # only pointers from the tracking past, within the encoder window
            # (upstream only_obj_ptrs_in_the_past_for_eval)
            ptr_ok = ptr_valid & (jnp.abs(frame_idx - ptr_frame)
                                  < cfg.max_obj_ptrs)
            if reverse:
                ptr_ok = ptr_ok & (ptr_frame >= frame_idx)
            else:
                ptr_ok = ptr_ok & (ptr_frame <= frame_idx)
            conditioned = _apply(
                SAM2Model.condition_features, pix, pos, cond_mem, cond_valid,
                recent_mem, rec_ok, tpos, obj_ptrs, ptr_ok)
            coords = jnp.zeros((b, 1, 2), cdt)
            labels = jnp.full((b, 1), -1, jnp.int32)
            out = _apply(SAM2Model.sam_heads, conditioned, s0, s1, coords,
                         labels, None, cfg.multimask_output_for_tracking,
                         True)  # suppress_empty_obj: video-path convention
            mem = _apply(SAM2Model.encode_memory, conditioned,
                         out["high_res_masks"][:, 0]).astype(cdt)
            obj_ptr_new = out["obj_ptr"].astype(cdt)

            # with memory_stride r, only every r-th frame enters the ring;
            # `active` gates out the pass's padded tail steps (repeats of
            # the last frame) — an ungated padded re-push would store a
            # second-pass memory/pointer (computed WITH the frame's own
            # pointer in the bank) that upstream — which has no padding —
            # never produces, perturbing the subsequent reverse pass
            do_push = active & (((frame_idx - cond_min) % stride) == 0)
            slot = (frame_idx // stride) % cfg.num_recent
            new_mem = jax.lax.dynamic_update_index_in_dim(
                recent_mem, mem, slot, axis=1)
            recent_mem = jnp.where(do_push, new_mem, recent_mem)
            recent_frame = jnp.where(
                do_push, recent_frame.at[:, slot].set(frame_idx),
                recent_frame)
            recent_valid = jnp.where(
                do_push, recent_valid.at[:, slot].set(True), recent_valid)
            pslot = frame_idx % cfg.max_obj_ptrs
            new_ptrs = jax.lax.dynamic_update_index_in_dim(
                obj_ptrs, obj_ptr_new, pslot, axis=1)
            obj_ptrs = jnp.where(active, new_ptrs, obj_ptrs)
            ptr_frame = jnp.where(active,
                                  ptr_frame.at[:, pslot].set(frame_idx),
                                  ptr_frame)
            ptr_valid = jnp.where(active,
                                  ptr_valid.at[:, pslot].set(True),
                                  ptr_valid)

            # forward pass: stash memories of the first R (stride-aligned)
            # post-cond frames to re-seed the ring for the reverse pass
            if not reverse:
                rel = frame_idx - cond_min
                sslot = jnp.clip(rel // stride - 1, 0, cfg.num_recent - 1)
                write = active & (rel >= 1) & (
                    rel <= cfg.num_recent * stride) & (rel % stride == 0)
                new_seed = jax.lax.dynamic_update_index_in_dim(
                    seed_buf, mem, sslot, axis=0)
                seed_buf = jnp.where(write, new_seed, seed_buf)

            carry = (cond_mem, cond_valid, recent_mem, recent_frame,
                     recent_valid, obj_ptrs, ptr_frame, ptr_valid, seed_buf,
                     cond_min)
            return carry, (out["low_res_masks"][:, 0].astype(jnp.bfloat16),
                           out["obj_ptr"])

        @partial(jax.jit, static_argnames=("reverse",))
        def scan_pass(v, carry, xs, reverse):
            return jax.lax.scan(
                lambda c, x: step(v, c, x, reverse), carry, xs)

        self._scan_pass = scan_pass

        # resize + threshold + bit-pack on device; 1 bit/pixel crosses to
        # host (32x less transfer than fp32 logits — the host link is the
        # bottleneck for mask-dense outputs)
        def _resize_pack(lo, h, w):
            m = jax.image.resize(
                lo.astype(jnp.float32),
                (lo.shape[0], lo.shape[1], h, w), method="linear") > 0.0
            w8 = (w + 7) // 8 * 8
            bits = jnp.pad(
                m, ((0, 0), (0, 0), (0, 0), (0, w8 - w))).astype(jnp.uint8)
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            return jnp.sum(
                bits.reshape(m.shape[0], m.shape[1], h, w8 // 8, 8)
                * weights, axis=-1, dtype=jnp.uint8)

        self._resize_batch_packed = jax.jit(_resize_pack,
                                            static_argnums=(1, 2))

        # full-res binary + canonical <=960x540 small masklet in ONE
        # program; the small stays DEVICE-RESIDENT (engine dedup and GT
        # metrics consume it on device — fetching it costs ~66 MB fp32 per
        # 32-frame track over the host link, the dominant cost of the
        # sequential engine path before this existed)
        def _resize_pack_small(lo, h, w, sh, sw):
            m = jax.image.resize(
                lo.astype(jnp.float32),
                (lo.shape[0], lo.shape[1], h, w), method="linear") > 0.0
            w8 = (w + 7) // 8 * 8
            bits = jnp.pad(
                m, ((0, 0), (0, 0), (0, 0), (0, w8 - w))).astype(jnp.uint8)
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            packed = jnp.sum(
                bits.reshape(m.shape[0], m.shape[1], h, w8 // 8, 8)
                * weights, axis=-1, dtype=jnp.uint8)
            # reshape_masklet semantics (core/mask_ops.py): binary ->
            # linear resize -> > 0.5
            small = jax.image.resize(
                m.astype(jnp.float32),
                (m.shape[0], m.shape[1], sh, sw), method="linear") > 0.5
            return packed, small

        self._resize_pack_small = jax.jit(_resize_pack_small,
                                          static_argnums=(1, 2, 3, 4))

        # cond-frame output in ONE program: the uploaded uint8 prompt
        # buffer round-trips through +-10 logits -> resize > 0 -> bit-pack
        # (+ canonical small), replacing a full-res fp32 logit fetch per
        # pass direction — numerically identical to _resize_logits(.) > 0
        # because linear resize is affine (resize(20m-10) > 0 <=>
        # resize(m) > 0.5), the same route packed.py uses for cond frames
        def _cond_pack(masks, h, w, sh, sw):
            lo = (masks.astype(jnp.float32) * 20.0 - 10.0)[None]
            return _resize_pack_small(lo, h, w, sh, sw)

        self._cond_pack_small = jax.jit(_cond_pack,
                                        static_argnums=(1, 2, 3, 4))

        # conditioning consolidation fused to ONE dispatch per cond frame:
        # mask-as-output + memory encode + every bank write (the unfused
        # path issued ~13 eager ops per cond frame — each a relay round
        # trip in this environment)
        def _cond_frame_update(v, pix1, s01, s11, masks, slot, fidx, banks):
            b = self.obj_batch
            pix = jnp.broadcast_to(pix1.astype(cdt), (b,) + pix1.shape)
            s0 = jnp.broadcast_to(s01.astype(cdt), (b,) + s01.shape)
            s1 = jnp.broadcast_to(s11.astype(cdt), (b,) + s11.shape)
            out = _japply(v, SAM2Model.mask_as_output, pix, s0, s1,
                          masks.astype(jnp.float32))
            mem = _japply(v, SAM2Model.encode_memory, pix,
                          out["high_res_masks"][:, 0])
            banks = list(banks)
            banks[0] = banks[0].at[:, slot].set(mem.astype(cdt))
            banks[1] = banks[1].at[:, slot].set(True)
            pslot = fidx % cfg.max_obj_ptrs
            banks[5] = banks[5].at[:, pslot].set(out["obj_ptr"].astype(cdt))
            banks[6] = banks[6].at[:, pslot].set(fidx)
            banks[7] = banks[7].at[:, pslot].set(True)
            return tuple(banks), out["obj_ptr"]

        self._cond_frame_update = jax.jit(_cond_frame_update)

        # reverse-pass recent-ring re-seed as ONE program (the slot-by-slot
        # eager .at[].set chain was ~3 ops per seed frame)
        def _reseed_banks(seed_buf, seed_frames, valid):
            stride = max(cfg.memory_stride, 1)
            R = cfg.num_recent
            b = self.obj_batch
            rec_mem = jnp.zeros((b, R) + seed_buf.shape[2:], seed_buf.dtype)
            rec_frame = jnp.full((b, R), -10 ** 6, jnp.int32)
            rec_valid = jnp.zeros((b, R), bool)
            for i in range(R):
                f = seed_frames[i]
                oh = (jax.nn.one_hot((f // stride) % R, R, dtype=bool)
                      & valid[i])                      # (R,)
                rec_mem = jnp.where(oh[None, :, None, None, None],
                                    seed_buf[i][:, None], rec_mem)
                rec_frame = jnp.where(oh[None, :], f, rec_frame)
                rec_valid = rec_valid | oh[None, :]
            return rec_mem, rec_frame, rec_valid

        self._reseed_banks = jax.jit(_reseed_banks)

    # ------------------------------------------------------------------
    # Protocol
    # ------------------------------------------------------------------

    def init_state(self, frames: Optional[Sequence[np.ndarray]],
                   video_path: Optional[str] = None) -> InferenceState:
        """frames: list of (H, W, 3) uint8 arrays, or ``video_path`` to a
        JPEG directory. Encodes all frames (chunked) into stacked bf16 HBM
        feature arrays shared by every propagation pass."""
        if video_path is not None:
            frames = _load_frames(video_path)
        s = self.cfg.image_size
        orig_hw = tuple(frames[0].shape[:2])
        t = len(frames)
        pix_list, s0_list, s1_list = [], [], []
        pos = None
        chunk = self.encode_chunk
        for start in range(0, t, chunk):
            batch = list(frames[start:start + chunk])
            n_valid = len(batch)
            if n_valid < chunk:  # pad to one static chunk shape
                batch = batch + [batch[-1]] * (chunk - n_valid)
            raw = jnp.asarray(np.stack(batch, axis=0))  # uint8 upload
            f = self._encode_from_raw(self.compute_variables, raw)
            pix_list.append(f["pix"][:n_valid].astype(self.feature_dtype))
            s0_list.append(f["s0"][:n_valid].astype(self.feature_dtype))
            s1_list.append(f["s1"][:n_valid].astype(self.feature_dtype))
            if pos is None:
                pos = f["pos"][0]
        features = {
            "pix": jnp.concatenate(pix_list, axis=0),
            "s0": jnp.concatenate(s0_list, axis=0),
            "s1": jnp.concatenate(s1_list, axis=0),
        }
        return InferenceState(num_frames=t, obj_batch=self.obj_batch,
                              features=features, pos=pos, orig_hw=orig_hw)

    def encode_frames_device(self, raw_all: jax.Array) -> dict:
        """(T, H, W, 3) uint8 DEVICE frames -> stacked feature dict in ONE
        XLA program (lax.map over encode_chunk-sized chunks). T must be a
        multiple of ``encode_chunk``; pad with repeated frames and slice
        if needed. Use when frames are already device-resident — the
        chunked ``init_state`` path pays a dispatch per chunk to overlap
        host uploads instead."""
        t = raw_all.shape[0]
        ck = self.encode_chunk
        assert t % ck == 0, (t, ck)
        raw = raw_all.reshape((t // ck, ck) + raw_all.shape[1:])
        f = self._encode_all_from_raw(self.compute_variables, raw)
        return {k: v.astype(self.feature_dtype) for k, v in f.items()}

    def reset_state(self, state: InferenceState) -> None:
        state.banks = None
        state.prompts = {}
        state.output_tokens = {}
        state.obj_ids = []
        state.seed_buf = None
        state.seed_frames = None
        state.small_parts = None
        state.prompt_dev = {}
        state.cond_host = {}

    def add_new_mask(self, state: InferenceState, frame_idx: int,
                     obj_id: int, mask: np.ndarray):
        """Register a mask prompt; returns (frame_idx, obj_ids, mask_logits)
        with the input mask as +-10 logits (SAM2's
        use_mask_input_as_output_without_sam semantics)."""
        s = self.cfg.image_size
        mask = np.asarray(mask)
        orig_mask = (mask > 0.5).astype(np.float32)
        if mask.shape != (s, s):
            from sola_tpu.core.mask_ops import resize_nearest_np
            mask = resize_nearest_np(np.asarray(mask, np.float32), (s, s))
        mask = (mask > 0.5).astype(np.float32)
        state.prompts.setdefault(int(frame_idx), {})[int(obj_id)] = mask
        # a new prompt invalidates any cached device buffer / cond output
        # for this frame (harmless after reset_state, which clears both)
        state.prompt_dev.pop(int(frame_idx), None)
        state.cond_host = {k: v for k, v in state.cond_host.items()
                           if k[0] != int(frame_idx)}
        if obj_id not in state.obj_ids:
            state.obj_ids.append(obj_id)
        if orig_mask.shape == state.orig_hw:
            # host array (consumers np.asarray it or discard it — an
            # eager device constant would upload ~1.6 MB fp32 per prompt)
            out_logits = orig_mask[None] * 20.0 - 10.0
        else:
            out_logits = _resize_logits(jnp.asarray(mask)[None] * 20.0 - 10.0,
                                        state.orig_hw)
        return frame_idx, list(state.obj_ids), out_logits

    # ------------------------------------------------------------------

    def _empty_banks(self):
        cfg = self.cfg
        b = self.obj_batch
        h = cfg.feat_hw
        cdt = self.compute_dtype
        return (
            jnp.zeros((b, cfg.max_cond_frames, h, h, cfg.mem_dim), cdt),
            jnp.zeros((b, cfg.max_cond_frames), bool),            # cond_valid
            jnp.zeros((b, cfg.num_recent, h, h, cfg.mem_dim), cdt),
            jnp.full((b, cfg.num_recent), -10 ** 6, jnp.int32),   # recent_frame
            jnp.zeros((b, cfg.num_recent), bool),                 # recent_valid
            jnp.zeros((b, cfg.max_obj_ptrs, cfg.d_model), cdt),   # obj_ptrs
            jnp.full((b, cfg.max_obj_ptrs), -10 ** 6, jnp.int32),  # ptr_frame
            jnp.zeros((b, cfg.max_obj_ptrs), bool),               # ptr_valid
        )

    def _prompt_masks(self, state: InferenceState,
                      frame_idx: int) -> np.ndarray:
        s = self.cfg.image_size
        masks = np.zeros((self.obj_batch, s, s), np.uint8)
        for slot, obj_id in enumerate(state.obj_ids[:self.obj_batch]):
            m = state.prompts.get(frame_idx, {}).get(obj_id)
            if m is not None:
                masks[slot] = m > 0.5
        return masks

    def _prompt_dev(self, state: InferenceState,
                    frame_idx: int) -> jax.Array:
        """Device uint8 (obj_batch, S, S) prompt buffer, uploaded once per
        prompted frame and reused by every consumer in the batch."""
        dev = state.prompt_dev.get(frame_idx)
        if dev is None:
            dev = jnp.asarray(self._prompt_masks(state, frame_idx))
            state.prompt_dev[frame_idx] = dev
        return dev

    def _run_cond_frames(self, state: InferenceState) -> None:
        """Consolidate every prompted frame into a conditioning slot (one
        fused dispatch per cond frame)."""
        cfg = self.cfg
        f = state.features
        banks = self._empty_banks()
        for slot, frame_idx in enumerate(
                sorted(state.prompts.keys())[:cfg.max_cond_frames]):
            masks_dev = self._prompt_dev(state, frame_idx)
            banks, obj_ptr = self._cond_frame_update(
                self.compute_variables, f["pix"][frame_idx],
                f["s0"][frame_idx], f["s1"][frame_idx], masks_dev,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(frame_idx, jnp.int32), banks)
            state.output_tokens[frame_idx] = obj_ptr
        state.banks = tuple(banks)

    def propagate_in_video(self, state: InferenceState,
                           reverse: bool = False,
                           start_frame_idx: Optional[int] = None,
                           output_mode: str = "logits"
                           ) -> Iterator[tuple]:
        """Yields (frame_idx, obj_ids, outputs) for every frame of the pass
        (conditioning frame included, like upstream).

        ``output_mode``:
          * "logits" — outputs are (n_obj, 1, H, W) float32 +-10 logits,
            upstream's contract (consumers binarize at 0,
            generate_tokens_grid.py:215-222);
          * "masks" — outputs are (n_obj, H, W) uint8 binary masks. Skips
            reconstructing dense float logits on the host (~4 bytes/pixel
            of pure allocation per frame that every in-repo consumer
            immediately re-thresholds away) — the production trackgen path.
          * "none" — outputs are None and nothing is fetched to host
            (``output_tokens`` not populated): runs the scan compute only,
            for benchmarking the compute/transfer split.
        """
        cfg = self.cfg
        if not state.prompts:
            return
        cond_idx = min(state.prompts.keys())
        if state.banks is None:
            self._run_cond_frames(state)

        start = start_frame_idx if start_frame_idx is not None else cond_idx
        if reverse:
            frame_idxs = np.arange(start - 1, -1, -1, dtype=np.int32)
        else:
            frame_idxs = np.arange(start + 1, state.num_frames,
                                   dtype=np.int32)
        n_obj = len(state.obj_ids)

        # conditioning-frame output: the consolidated prompt (upstream yields
        # the prompt-based output for cond frames). Fetched once per batch
        # (both pass directions yield the same cond output — cond_host
        # caches the forward pass's fetch for the reverse pass).
        oh_, ow_ = state.orig_hw
        if output_mode == "none":
            # nothing is fetched in this mode (docstring contract)
            yield (cond_idx, list(state.obj_ids), None)
        elif output_mode == "masks":
            from sola_tpu.core import mask_ops
            sh, sw = mask_ops.reshape_hw(oh_, ow_)
            if state.small_parts is None:
                state.small_parts = []
            cached = state.cond_host.get((cond_idx, "masks"))
            if cached is None:
                masks_dev = self._prompt_dev(state, cond_idx)
                packed, small = self._cond_pack_small(
                    masks_dev[:n_obj], oh_, ow_, sh, sw)
                # record the canonical small once (device-resident)
                if not any(len(p[0]) == 1 and p[0][0] == cond_idx
                           for p in state.small_parts):
                    state.small_parts.append((np.asarray([cond_idx]),
                                              small))
                packed_np = np.asarray(packed)      # 1 bit/pixel fetch
                cached = np.unpackbits(
                    packed_np.reshape(n_obj, -1), axis=1).reshape(
                        n_obj, oh_, -1)[..., :ow_]
                state.cond_host[(cond_idx, "masks")] = cached
            yield (cond_idx, list(state.obj_ids), cached)
        else:
            cached = state.cond_host.get((cond_idx, "logits"))
            if cached is None:
                masks_dev = self._prompt_dev(state, cond_idx)
                prompt_logits = (masks_dev.astype(jnp.float32)
                                 * 20.0 - 10.0)
                cached = np.asarray(_resize_logits(prompt_logits[:n_obj],
                                                   state.orig_hw))
                state.cond_host[(cond_idx, "logits")] = cached
            yield (cond_idx, list(state.obj_ids), cached[:, None])
        if len(frame_idxs) == 0:
            return

        # assemble the scan carry
        b = self.obj_batch
        h = cfg.feat_hw
        banks = list(state.banks)
        if reverse:
            # re-seed the recent ring with post-cond forward memories
            # (one fused program; empty ring when no forward pass ran)
            if state.seed_buf is not None and state.seed_frames is not None:
                R = cfg.num_recent
                sf = np.zeros((R,), np.int32)
                sv = np.zeros((R,), bool)
                k = len(state.seed_frames)
                sf[:k] = state.seed_frames
                sv[:k] = True
                banks[2], banks[3], banks[4] = self._reseed_banks(
                    state.seed_buf, jnp.asarray(sf), jnp.asarray(sv))
            else:
                banks[2] = jnp.zeros_like(banks[2])
                banks[3] = jnp.full_like(banks[3], -10 ** 6)
                banks[4] = jnp.zeros_like(banks[4])
        seed_buf = jnp.zeros((cfg.num_recent, b, h, h, cfg.mem_dim),
                             self.compute_dtype)
        carry = tuple(banks) + (seed_buf, jnp.asarray(cond_idx, jnp.int32))

        # fixed-size scan segments: pad the pass to a multiple of scan_chunk
        # (padding repeats the last frame; its outputs are discarded) and
        # chain segments, carrying the banks — each segment is one compiled
        # program of bounded size
        n_valid = len(frame_idxs)
        chunk = self.scan_chunk
        n_pad = ((n_valid + chunk - 1) // chunk) * chunk
        idxs = np.concatenate([
            frame_idxs,
            np.full(n_pad - n_valid, frame_idxs[-1], np.int32)])
        f = state.features
        act = np.arange(n_pad) < n_valid
        lo_parts, ptr_parts = [], []
        for seg in range(0, n_pad, chunk):
            seg_idx = idxs[seg:seg + chunk]
            xs = (f["pix"][seg_idx], f["s0"][seg_idx], f["s1"][seg_idx],
                  jnp.asarray(seg_idx), jnp.asarray(act[seg:seg + chunk]))
            carry, (lo, ptr) = self._scan_pass(self.compute_variables, carry,
                                               xs, reverse=reverse)
            lo_parts.append(lo)
            ptr_parts.append(ptr)
        low_res = jnp.concatenate(lo_parts, axis=0)
        obj_ptrs = jnp.concatenate(ptr_parts, axis=0)
        state.banks = tuple(carry[:8])
        if not reverse:
            state.seed_buf = carry[8]
            stride = max(cfg.memory_stride, 1)
            seed_frames = [cond_idx + stride * (i + 1)
                           for i in range(cfg.num_recent)
                           if cond_idx + stride * (i + 1) <
                           state.num_frames]
            state.seed_frames = np.asarray(seed_frames, np.int32)

        # two-phase output fetch: enqueue EVERY chunk's resize+pack program
        # before fetching any result — the device pipelines resize of chunk
        # k+1 behind the host transfer of chunk k instead of a synchronous
        # round trip per chunk (round-2 VERDICT: the per-16-frame
        # `np.asarray` fetch serialized device compute with the host link)
        oh, ow = state.orig_hw
        if output_mode == "none":
            for j in range(n_valid):
                yield (int(frame_idxs[j]), list(state.obj_ids), None)
            return
        chunk = 16
        bounds = [(s, min(s + chunk, n_valid))
                  for s in range(0, n_valid, chunk)]
        if output_mode == "masks":
            from sola_tpu.core import mask_ops
            sh, sw = mask_ops.reshape_hw(oh, ow)
            packed_chunks = []
            if state.small_parts is None:
                state.small_parts = []
            for s, e in bounds:
                packed, small = self._resize_pack_small(
                    low_res[s:e, :n_obj], oh, ow, sh, sw)
                packed_chunks.append(packed)
                state.small_parts.append((frame_idxs[s:e], small))
        else:
            packed_chunks = [self._resize_batch_packed(
                low_res[s:e, :n_obj], oh, ow) for s, e in bounds]
        # queue every chunk's device->host copy NOW: the link transfer of
        # chunk k+1 overlaps the host-side unpackbits of chunk k, and the
        # first transfer starts the moment its program finishes instead of
        # when the host loop reaches it (the np.asarray below just waits)
        toks_dev = obj_ptrs[:n_valid]
        toks_dev.copy_to_host_async()
        for p in packed_chunks:
            p.copy_to_host_async()
        toks_np = np.asarray(toks_dev)  # one small fetch per pass
        for (cstart, cend), packed_dev in zip(bounds, packed_chunks):
            packed = np.asarray(packed_dev)
            bsz, nob = packed.shape[:2]
            hi_np = np.unpackbits(
                packed.reshape(bsz * nob, -1), axis=1).reshape(
                    bsz, nob, oh, -1)[..., :ow]
            for j in range(cend - cstart):
                fidx = int(frame_idxs[cstart + j])
                state.output_tokens[fidx] = toks_np[cstart + j]
                if output_mode == "masks":
                    yield (fidx, list(state.obj_ids), hi_np[j])
                else:
                    # consumers binarize at 0 (generate_tokens_grid.py:
                    # 215-222); reconstruct +-10 logits from the
                    # device-thresholded masks
                    logits = hi_np[j].astype(np.float32) * 20.0 - 10.0
                    yield (fidx, list(state.obj_ids), logits[:, None])

    def get_small_masklets(self, state: InferenceState) -> jax.Array:
        """(T, n_obj, sh, sw) bool DEVICE array of canonical <=960x540
        small masklets, assembled from the per-pass device chunks of
        "masks"-mode propagation (engine dedup and GT metrics consume
        this on device; it is never fetched to host).

        Requires full bidirectional coverage (every frame seen once)."""
        parts = state.small_parts or []
        assert parts, "no masks-mode propagation has run on this state"
        fidx = np.concatenate([p[0] for p in parts])
        assert len(fidx) == state.num_frames and (
            np.sort(fidx) == np.arange(state.num_frames)).all(), (
            f"small masklets cover {len(fidx)} of {state.num_frames} "
            "frames")
        all_small = jnp.concatenate([p[1] for p in parts], axis=0)
        perm = np.zeros(state.num_frames, np.int64)
        perm[fidx] = np.arange(len(fidx))
        return all_small[jnp.asarray(perm)]

    def get_output_tokens(self, state: InferenceState) -> dict:
        """frame_idx -> (n_obj, d) obj_ptr array (host)."""
        n_obj = len(state.obj_ids)
        return {f: np.asarray(tok)[:n_obj].astype(np.float32)
                for f, tok in state.output_tokens.items()}


def _resize_logits(logits: jax.Array, orig_hw: tuple) -> jax.Array:
    """(B, S, S) -> (B, H, W) bilinear."""
    h, w = orig_hw
    return jax.image.resize(logits, (logits.shape[0], h, w),
                            method="linear")


def _load_frames(video_path: str) -> list:
    import os

    from PIL import Image
    names = sorted(os.listdir(video_path))
    return [np.asarray(Image.open(os.path.join(video_path, n)).convert("RGB"))
            for n in names]
