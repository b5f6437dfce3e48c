"""SAM2 video predictor: the 5-method tracking protocol on static state.

Implements the protocol the reference's generation loops drive
(init_state / reset_state / add_new_mask / propagate_in_video / per-frame
``obj_ptr`` harvesting — protocol defined by usage at
generate_tokens_grid.py:142-237), re-designed for XLA:

* upstream SAM2 keeps a Python dict-of-dicts inference state with
  variable-length memory lists; here the state is a pytree of fixed-shape
  device arrays (conditioning slots, a recent-memory ring with absolute
  frame indices, a 16-slot object-pointer bank) so every per-frame step is
  one compiled program;
* the object axis is a padded batch dimension (obj_batch slots);
* frame features are encoded once per video (bf16 cache in HBM) and shared
  across objects and both propagation directions;
* the reverse pass re-seeds the recent ring from a side buffer of the first
  ``num_recent`` post-conditioning frames, matching upstream's use of
  forward-pass outputs as reverse-pass memories.

Exposes per-frame outputs compatible with the reference loops:
``propagate_in_video`` yields (frame_idx, obj_ids, high_res_logits) and
``state.output_tokens`` collects per-frame obj_ptr tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.trackgen.sam2.image_encoder import normalize_image
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


@dataclasses.dataclass
class MemoryBanks:
    cond_mem: jax.Array      # (B, C, h, w, mem)
    cond_valid: jax.Array    # (B, C) bool
    recent_mem: jax.Array    # (B, R, h, w, mem)
    recent_frame: jax.Array  # (B, R) int32 absolute frame index
    recent_valid: jax.Array  # (B, R) bool
    obj_ptrs: jax.Array      # (B, P, d)
    ptr_frame: jax.Array     # (B, P) int32
    ptr_valid: jax.Array     # (B, P) bool


@dataclasses.dataclass
class InferenceState:
    num_frames: int
    obj_batch: int
    features: list            # per-frame dict(s0, s1, pix, pos) device arrays
    orig_hw: tuple
    banks: Optional[MemoryBanks] = None
    prompts: dict = dataclasses.field(default_factory=dict)
    # harvested per-frame outputs: frame_idx -> (B, d) obj_ptr
    output_tokens: dict = dataclasses.field(default_factory=dict)
    obj_ids: list = dataclasses.field(default_factory=list)
    seed_mem: dict = dataclasses.field(default_factory=dict)


class SAM2VideoPredictor:
    def __init__(self, model: SAM2Model, variables: dict,
                 obj_batch: int = 4, feature_dtype=jnp.bfloat16):
        self.model = model
        self.cfg: SAM2Config = model.cfg
        self.variables = variables
        self.obj_batch = obj_batch
        self.feature_dtype = feature_dtype

        cfg = self.cfg

        def _apply(method, *args):
            return model.apply(variables, *args, method=method)

        self._encode_image = jax.jit(
            lambda img: _apply(SAM2Model.encode_image, img))
        self._mask_as_output = jax.jit(
            lambda pix, s0, s1, m: _apply(SAM2Model.mask_as_output, pix, s0,
                                          s1, m))
        self._encode_memory = jax.jit(
            lambda pix, m: _apply(SAM2Model.encode_memory, pix, m))

        def _track(pix, pos, s0, s1, banks_tuple, frame_idx):
            (cond_mem, cond_valid, recent_mem, recent_frame, recent_valid,
             obj_ptrs, ptr_frame, ptr_valid) = banks_tuple
            tpos = jnp.abs(frame_idx - recent_frame)
            rec_ok = recent_valid & (tpos >= 1) & (tpos <= cfg.num_recent)
            ptr_ok = ptr_valid & (jnp.abs(frame_idx - ptr_frame)
                                  < cfg.max_obj_ptrs)
            conditioned = _apply(
                SAM2Model.condition_features, pix, pos, cond_mem, cond_valid,
                recent_mem, rec_ok, jnp.clip(tpos, 1, cfg.num_recent),
                obj_ptrs, ptr_ok)
            b = pix.shape[0]
            coords = jnp.zeros((b, 1, 2), jnp.float32)
            labels = jnp.full((b, 1), -1, jnp.int32)
            out = _apply(SAM2Model.sam_heads, conditioned, s0, s1, coords,
                         labels, None, cfg.multimask_output_for_tracking)
            mem = _apply(SAM2Model.encode_memory, conditioned,
                         out["high_res_masks"][:, 0])
            return out["high_res_masks"][:, 0], out["obj_ptr"], mem

        self._track_step = jax.jit(_track)

    # ------------------------------------------------------------------
    # Protocol
    # ------------------------------------------------------------------

    def init_state(self, frames: Sequence[np.ndarray],
                   video_path: Optional[str] = None) -> InferenceState:
        """frames: list of (H, W, 3) uint8 arrays (pre-decoded), or pass
        ``video_path`` to a JPEG directory."""
        if video_path is not None:
            frames = _load_frames(video_path)
        s = self.cfg.image_size
        orig_hw = frames[0].shape[:2]
        feats = []
        for frame in frames:
            img = jax.image.resize(
                jnp.asarray(frame, jnp.float32), (s, s, 3), method="linear")
            img = normalize_image(img.astype(jnp.uint8))
            f = self._encode_image(img[None])
            feats.append({k: v.astype(self.feature_dtype)
                          for k, v in f.items()})
        return InferenceState(num_frames=len(frames),
                              obj_batch=self.obj_batch,
                              features=feats, orig_hw=orig_hw)

    def reset_state(self, state: InferenceState) -> None:
        state.banks = None
        state.prompts = {}
        state.output_tokens = {}
        state.obj_ids = []
        state.seed_mem = {}

    def add_new_mask(self, state: InferenceState, frame_idx: int,
                     obj_id: int, mask: np.ndarray):
        """Register a mask prompt; returns (frame_idx, obj_ids, mask_logits)
        with the input mask as +-10 logits (SAM2's
        use_mask_input_as_output_without_sam semantics)."""
        s = self.cfg.image_size
        mask = np.asarray(mask)
        if mask.shape != (s, s):
            m = jax.image.resize(jnp.asarray(mask, jnp.float32), (s, s),
                                 method="nearest")
            mask = np.asarray(m)
        mask = (mask > 0.5).astype(np.float32)
        state.prompts.setdefault(int(frame_idx), {})[int(obj_id)] = mask
        if obj_id not in state.obj_ids:
            state.obj_ids.append(obj_id)
        logits = jnp.asarray(mask) * 20.0 - 10.0
        out_logits = _resize_logits(logits[None], state.orig_hw)
        return frame_idx, list(state.obj_ids), out_logits

    # ------------------------------------------------------------------

    def _empty_banks(self) -> MemoryBanks:
        cfg = self.cfg
        b = self.obj_batch
        h = cfg.feat_hw
        return MemoryBanks(
            cond_mem=jnp.zeros((b, cfg.max_cond_frames, h, h, cfg.mem_dim),
                               jnp.float32),
            cond_valid=jnp.zeros((b, cfg.max_cond_frames), bool),
            recent_mem=jnp.zeros((b, cfg.num_recent, h, h, cfg.mem_dim),
                                 jnp.float32),
            recent_frame=jnp.full((b, cfg.num_recent), -10 ** 6, jnp.int32),
            recent_valid=jnp.zeros((b, cfg.num_recent), bool),
            obj_ptrs=jnp.zeros((b, cfg.max_obj_ptrs, cfg.d_model),
                               jnp.float32),
            ptr_frame=jnp.full((b, cfg.max_obj_ptrs), -10 ** 6, jnp.int32),
            ptr_valid=jnp.zeros((b, cfg.max_obj_ptrs), bool),
        )

    def _frame_feats(self, state: InferenceState, frame_idx: int):
        f = state.features[frame_idx]
        b = self.obj_batch
        pix = jnp.broadcast_to(f["pix"].astype(jnp.float32),
                               (b,) + f["pix"].shape[1:])
        pos = jnp.broadcast_to(f["pos"].astype(jnp.float32),
                               (b,) + f["pos"].shape[1:])
        s0 = jnp.broadcast_to(f["s0"].astype(jnp.float32),
                              (b,) + f["s0"].shape[1:])
        s1 = jnp.broadcast_to(f["s1"].astype(jnp.float32),
                              (b,) + f["s1"].shape[1:])
        return pix, pos, s0, s1

    def _run_cond_frame(self, state: InferenceState, frame_idx: int):
        """Consolidate all prompts on ``frame_idx`` into conditioning memory;
        returns the high-res logits (B, S, S)."""
        cfg = self.cfg
        b = self.obj_batch
        s = cfg.image_size
        pix, pos, s0, s1 = self._frame_feats(state, frame_idx)
        masks = np.zeros((b, s, s), np.float32)
        for slot, obj_id in enumerate(state.obj_ids[:b]):
            m = state.prompts.get(frame_idx, {}).get(obj_id)
            if m is not None:
                masks[slot] = m
        out = self._mask_as_output(pix, s0, s1, jnp.asarray(masks))
        mem = self._encode_memory(pix, out["high_res_masks"][:, 0])
        banks = state.banks
        slot = int(np.argmin(np.asarray(banks.cond_valid[0])))  # first free
        banks.cond_mem = banks.cond_mem.at[:, slot].set(mem)
        banks.cond_valid = banks.cond_valid.at[:, slot].set(True)
        self._push_obj_ptr(state, frame_idx, out["obj_ptr"])
        state.output_tokens[frame_idx] = out["obj_ptr"]
        return out["high_res_masks"][:, 0]

    def _push_obj_ptr(self, state: InferenceState, frame_idx: int,
                      obj_ptr: jax.Array) -> None:
        banks = state.banks
        slot = frame_idx % self.cfg.max_obj_ptrs
        banks.obj_ptrs = banks.obj_ptrs.at[:, slot].set(obj_ptr)
        banks.ptr_frame = banks.ptr_frame.at[:, slot].set(frame_idx)
        banks.ptr_valid = banks.ptr_valid.at[:, slot].set(True)

    def _push_recent(self, state: InferenceState, frame_idx: int,
                     mem: jax.Array) -> None:
        banks = state.banks
        slot = frame_idx % self.cfg.num_recent
        banks.recent_mem = banks.recent_mem.at[:, slot].set(mem)
        banks.recent_frame = banks.recent_frame.at[:, slot].set(frame_idx)
        banks.recent_valid = banks.recent_valid.at[:, slot].set(True)

    def propagate_in_video(self, state: InferenceState,
                           reverse: bool = False,
                           start_frame_idx: Optional[int] = None
                           ) -> Iterator[tuple]:
        """Yields (frame_idx, obj_ids, high_res_logits (n_obj, 1, H, W))."""
        cfg = self.cfg
        if not state.prompts:
            return
        cond_idx = min(state.prompts.keys())
        if state.banks is None:
            state.banks = self._empty_banks()
            cond_logits = self._run_cond_frame(state, cond_idx)
        else:
            cond_logits = None

        start = start_frame_idx if start_frame_idx is not None else cond_idx
        if reverse:
            frame_range = range(start, -1, -1)
            # reverse pass: re-seed the ring with post-cond forward memories
            banks = state.banks
            banks.recent_valid = jnp.zeros_like(banks.recent_valid)
            for fidx, mem in state.seed_mem.items():
                self._push_recent(state, fidx, mem)
        else:
            frame_range = range(start, state.num_frames)

        n_obj = len(state.obj_ids)
        for frame_idx in frame_range:
            if frame_idx == cond_idx:
                if cond_logits is None:
                    # cond output recomputation not needed: replay the prompt
                    s = cfg.image_size
                    masks = np.zeros((self.obj_batch, s, s), np.float32)
                    for slot, obj_id in enumerate(state.obj_ids):
                        m = state.prompts.get(cond_idx, {}).get(obj_id)
                        if m is not None:
                            masks[slot] = m
                    logits = jnp.asarray(masks) * 20.0 - 10.0
                else:
                    logits = cond_logits
                    cond_logits = None
                yield (frame_idx, list(state.obj_ids),
                       _resize_logits(logits[:n_obj], state.orig_hw)[:, None])
                continue
            pix, pos, s0, s1 = self._frame_feats(state, frame_idx)
            banks = state.banks
            banks_tuple = (banks.cond_mem, banks.cond_valid,
                           banks.recent_mem, banks.recent_frame,
                           banks.recent_valid, banks.obj_ptrs,
                           banks.ptr_frame, banks.ptr_valid)
            logits, obj_ptr, mem = self._track_step(
                pix, pos, s0, s1, banks_tuple, jnp.asarray(frame_idx))
            self._push_recent(state, frame_idx, mem)
            self._push_obj_ptr(state, frame_idx, obj_ptr)
            state.output_tokens[frame_idx] = obj_ptr
            if (not reverse and
                    0 < frame_idx - cond_idx <= cfg.num_recent):
                state.seed_mem[frame_idx] = mem
            yield (frame_idx, list(state.obj_ids),
                   _resize_logits(logits[:n_obj], state.orig_hw)[:, None])

    def get_output_tokens(self, state: InferenceState) -> dict:
        """frame_idx -> (n_obj, d) obj_ptr array (host)."""
        n_obj = len(state.obj_ids)
        return {f: np.asarray(tok[:n_obj])
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
