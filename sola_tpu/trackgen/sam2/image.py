"""SAM2 image predictor: single-image box/point -> mask prediction.

The API surface the reference's prompt generators consume
(prompt_generator.py:59-117: set_image / predict with boxes,
multimask_output=False) plus the stability score helper
(prompt_generator.py:169-186).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.trackgen.sam2.image_encoder import normalize_image
from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model


def _bitpack_masks(m: jax.Array) -> jax.Array:
    """(N, h, w) bool -> (N, h, ceil(w/8)) uint8, MSB-first rows (the
    layout ``unpack_masks`` reverses) — 1 bit/pixel across the host link."""
    n, h, w = m.shape
    w8 = (w + 7) // 8 * 8
    bits = jnp.pad(m, ((0, 0), (0, 0), (0, w8 - w))).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(bits.reshape(n, h, w8 // 8, 8)
                   * weights[None, None, None, :], axis=-1, dtype=jnp.uint8)


def _stability_from_logits(low: jax.Array, offset) -> jax.Array:
    """|logit > +off| / |logit > -off| over the last two axes (SAM AMG
    stability rule; prompt_generator.py:169-186)."""
    inter = jnp.sum(low > offset, axis=(-2, -1))
    union = jnp.sum(low > -offset, axis=(-2, -1))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)


class SAM2ImagePredictor:
    def __init__(self, model: SAM2Model, variables: dict,
                 max_prompts: int = 8, compute_dtype=jnp.bfloat16):
        """``compute_dtype=bfloat16`` mirrors the reference's autocast bf16
        around the AMG / image-predict path (generate_prompts_grid.py:57-63).
        """
        self.model = model
        self.cfg: SAM2Config = model.cfg
        self.variables = variables
        if compute_dtype == jnp.float32:
            self.compute_variables = variables
        else:
            self.compute_variables = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables)
        self.max_prompts = max_prompts
        self._feats = None
        self._orig_hw = None

        # variables are explicit jit args (closure capture would bake the
        # parameter tree into the program as constants); the normalized
        # image is cast to compute_dtype so the Hiera runs at the MXU bf16
        # rate (fp32 input would promote the whole backbone)
        enc_dt = compute_dtype
        self._encode = jax.jit(lambda v, img: model.apply(
            v, img.astype(enc_dt), method=SAM2Model.encode_image))

        # raw uint8 in: 1-byte/pixel upload + one dispatch (fp32 frames
        # would ship 4x the bytes over the host link)
        s_ = self.cfg.image_size

        def _encode_raw(v, raw):  # (H, W, 3) uint8
            x = jax.image.resize(raw.astype(jnp.float32), (s_, s_, 3),
                                 method="linear")
            img = normalize_image(x.astype(jnp.uint8)).astype(enc_dt)
            return model.apply(v, img[None], method=SAM2Model.encode_image)

        self._encode_raw = jax.jit(_encode_raw)

        def _predict(v, pix, s0, s1, coords, labels, multimask):
            # batch-1 features in, per-prompt broadcast fused inside jit
            n = coords.shape[0]
            pix = jnp.broadcast_to(pix, (n,) + pix.shape[1:])
            s0 = jnp.broadcast_to(s0, (n,) + s0.shape[1:])
            s1 = jnp.broadcast_to(s1, (n,) + s1.shape[1:])
            return model.apply(v, pix, s0, s1, coords, labels, None,
                               multimask, method=SAM2Model.sam_heads)

        self._predict_single = jax.jit(
            lambda v, pix, s0, s1, c, l: _predict(v, pix, s0, s1, c, l,
                                                  False))
        self._predict_multi = jax.jit(
            lambda v, pix, s0, s1, c, l: _predict(v, pix, s0, s1, c, l,
                                                  True))

        def _predict_packed(v, pix, s0, s1, coords, labels, stability_offset,
                            h, w):
            """Box/point -> mask with the full-res mask bit-packed and the
            stability score computed ON DEVICE: the dense path fetches
            (N, H, W) bool + (N, 1, lh, lw) fp32 logits (~10 MB/frame at
            production box counts) where this ships N x H x W/8 bytes + 2N
            scalars — the fetch the gdino prompt stage pays per frame
            (prompt_generator.py:92-117 + :169-186 semantics)."""
            out = _predict(v, pix, s0, s1, coords, labels, False)
            n = coords.shape[0]
            high = out["high_res_masks"][:, 0]        # (N, S, S) logits
            up = jax.image.resize(high, (n, h, w), method="linear")
            low = out["low_res_masks"][:, 0].astype(jnp.float32)
            stab = _stability_from_logits(low, stability_offset)
            return _bitpack_masks(up > 0.0), out["ious"][:, 0], stab

        self._predict_packed = jax.jit(_predict_packed,
                                       static_argnums=(7, 8))

        # AMG fast path: everything stays on device; only (iou, stability)
        # scalars come back per proposal. High-res masks are never built
        # (compute_high_res=False skips the 128 x 3 x S^2 upscale the
        # upstream AMG pays per point batch), and the image features enter
        # the program at batch 1 — the per-prompt broadcast happens inside
        # jit where XLA fuses it into the decoder instead of materializing
        # N copies in HBM.
        def _propose(v, pix, s0, s1, coords, labels, stability_offset):
            n = coords.shape[0]
            pix_n = jnp.broadcast_to(pix, (n,) + pix.shape[1:])
            s0_n = jnp.broadcast_to(s0, (n,) + s0.shape[1:])
            s1_n = jnp.broadcast_to(s1, (n,) + s1.shape[1:])
            out = model.apply(v, pix_n, s0_n, s1_n, coords, labels, None,
                              True, compute_high_res=False,
                              method=SAM2Model.sam_heads)
            low = out["low_res_masks"]          # (N, 3, 4h, 4w) fp32
            stab = _stability_from_logits(low, stability_offset)
            return out["ious"], stab, low

        self._propose = jax.jit(_propose)

        def _finalize(low_sel, h, w):
            """Upscale selected low-res logits to image res -> uint8 masks."""
            up = jax.image.resize(low_sel, (low_sel.shape[0], h, w),
                                  method="linear")
            return (up > 0.0).astype(jnp.uint8)

        self._finalize = jax.jit(_finalize, static_argnums=(1, 2))

        def _finalize_packed(low_sel, h, w, k_fin=None):
            """Upscale + threshold + bit-pack on device, with boxes/areas.

            The full-res boolean masks are 8x bit-packed before crossing to
            host, and xyxy boxes + areas come from device-side reductions —
            on the AMG path this replaces a (K, H, W) uint8 fetch plus a
            per-mask host np.nonzero loop (the two dominant costs of dense
            proposal generation once decode is fast). ``k_fin`` (static)
            slices the leading axis inside the program: the AMG survivor
            buffer is score-sorted, so finalizing a bucket-padded prefix
            costs O(survivors), not O(buffer)."""
            if k_fin is not None:
                low_sel = low_sel[:k_fin]
            k = low_sel.shape[0]
            up = jax.image.resize(low_sel, (k, h, w), method="linear")
            m = up > 0.0                                  # (K, h, w) bool
            areas = jnp.sum(m, axis=(1, 2), dtype=jnp.int32)
            any_y = jnp.any(m, axis=2)                    # (K, h)
            any_x = jnp.any(m, axis=1)                    # (K, w)
            ys = jnp.arange(h, dtype=jnp.int32)
            xs = jnp.arange(w, dtype=jnp.int32)
            big = jnp.int32(1 << 30)
            y0 = jnp.min(jnp.where(any_y, ys, big), axis=1)
            y1 = jnp.max(jnp.where(any_y, ys, -1), axis=1) + 1
            x0 = jnp.min(jnp.where(any_x, xs, big), axis=1)
            x1 = jnp.max(jnp.where(any_x, xs, -1), axis=1) + 1
            empty = areas == 0
            boxes = jnp.stack([
                jnp.where(empty, 0, x0), jnp.where(empty, 0, y0),
                jnp.where(empty, 0, x1), jnp.where(empty, 0, y1)],
                axis=1).astype(jnp.float32)
            return _bitpack_masks(m), boxes, areas

        self._finalize_packed = jax.jit(_finalize_packed,
                                        static_argnums=(1, 2, 3))

        def _propose_filter_finalize(v, pix, s0, s1, coords, valid,
                                     stability_offset, iou_thresh,
                                     stab_thresh, k_max):
            """Whole-grid AMG propose/filter in ONE program: scan point
            chunks through the decoder and keep a bounded top-k_max survivor
            buffer (score = predicted IoU where both thresholds pass, else
            -inf). Finalize (upscale/threshold/bit-pack) is a SEPARATE
            program dispatched by the caller on a bucket-padded prefix of
            the score-sorted buffer — at reference thresholds ~100 of the
            1024 buffer rows survive, so fusing finalize here paid ~10x its
            useful resize/bit-pack cost every frame.

            Replaces the per-point-batch dispatch chain (8 round trips
            through the host relay per frame) with a single dispatch, and
            bounds HBM to one chunk's logits + the survivor buffer instead
            of every batch's full (bsz, 3, lh, lw) fp32 logits
            (sam2/amg.py round-2 kept ~0.8 GB alive and doubled it at the
            concat; quadratic in points_per_side).

            coords: (n_chunks, bsz, 1, 2) pre-scaled; valid: (n_chunks, bsz)
            bool. Returns buffers sorted by score desc; entries beyond
            n_valid (or with score == -inf) are padding.
            """
            n_chunks, bsz = coords.shape[:2]
            labels = jnp.ones((bsz, 1), jnp.int32)
            pix_n = jnp.broadcast_to(pix, (bsz,) + pix.shape[1:])
            s0_n = jnp.broadcast_to(s0, (bsz,) + s0.shape[1:])
            s1_n = jnp.broadcast_to(s1, (bsz,) + s1.shape[1:])

            def chunk_step(carry, inp):
                top_scores, top_low, top_flat, top_iou, top_stab, n_kept = \
                    carry
                c, vmask, offset = inp
                out = model.apply(v, pix_n, s0_n, s1_n, c, labels, None,
                                  True, compute_high_res=False,
                                  method=SAM2Model.sam_heads)
                low = out["low_res_masks"]            # (bsz, 3, lh, lw)
                lh, lw = low.shape[-2:]
                stab = _stability_from_logits(
                    low, stability_offset).astype(jnp.float32)
                ious = out["ious"].astype(jnp.float32)  # (bsz, 3)
                keep = ((ious > iou_thresh) & (stab > stab_thresh)
                        & vmask[:, None])
                scores = jnp.where(keep, ious, -jnp.inf).reshape(-1)
                flat = (offset + jnp.arange(bsz, dtype=jnp.int32))[:, None] \
                    * 3 + jnp.arange(3, dtype=jnp.int32)[None, :]
                cat_scores = jnp.concatenate([top_scores, scores])
                cat_low = jnp.concatenate(
                    [top_low, low.reshape(-1, lh, lw).astype(top_low.dtype)])
                cat_flat = jnp.concatenate([top_flat, flat.reshape(-1)])
                cat_iou = jnp.concatenate([top_iou, ious.reshape(-1)])
                cat_stab = jnp.concatenate(
                    [top_stab, stab.reshape(-1).astype(top_stab.dtype)])
                new_scores, sel = jax.lax.top_k(cat_scores, k_max)
                n_kept = n_kept + jnp.sum(keep, dtype=jnp.int32)
                return (new_scores, cat_low[sel], cat_flat[sel],
                        cat_iou[sel], cat_stab[sel], n_kept), None

            lh = lw = self.cfg.image_size // 4
            init = (jnp.full((k_max,), -jnp.inf, jnp.float32),
                    jnp.zeros((k_max, lh, lw), jnp.float32),
                    jnp.full((k_max,), -1, jnp.int32),
                    jnp.zeros((k_max,), jnp.float32),
                    jnp.zeros((k_max,), jnp.float32),
                    jnp.zeros((), jnp.int32))
            offsets = jnp.arange(n_chunks, dtype=jnp.int32) * bsz
            (scores, low_k, flat_k, iou_k, stab_k, n_valid), _ = \
                jax.lax.scan(chunk_step, init, (coords, valid, offsets))
            return (scores, low_k, flat_k, iou_k, stab_k, n_valid)

        self._propose_filter_finalize = jax.jit(
            _propose_filter_finalize, static_argnums=(9,))

    def set_image(self, image: np.ndarray) -> None:
        """(H, W, 3) uint8."""
        self._orig_hw = image.shape[:2]
        self._feats = self._encode_raw(
            self.compute_variables, jnp.asarray(image, jnp.uint8))

    def snapshot_features(self):
        """Capture the current image's cached features, so a pipelined
        caller can ``set_image`` the NEXT frame (enqueueing its encode)
        and later ``restore_features`` to predict against this one."""
        return (self._feats, self._orig_hw)

    def restore_features(self, snapshot) -> None:
        self._feats, self._orig_hw = snapshot

    def _scale_coords(self, coords: np.ndarray) -> np.ndarray:
        h, w = self._orig_hw
        s = self.cfg.image_size
        out = np.asarray(coords, np.float32).copy()
        out[..., 0] *= s / w
        out[..., 1] *= s / h
        return out

    def propose(self, point_coords: np.ndarray,
                stability_offset: float = 1.0):
        """AMG proposal pass: (N, 1, 2) point prompts -> host (iou (N,3),
        stability (N,3)) + DEVICE low-res logits (N, 3, 4h, 4w). Only the
        scalars cross to host; callers gather survivors on device."""
        ious, stab, low = self.propose_device(point_coords, stability_offset)
        return np.asarray(ious), np.asarray(stab), low

    def propose_device(self, point_coords: np.ndarray,
                       stability_offset: float = 1.0):
        """Async propose: returns DEVICE (iou, stability, low_res) without
        forcing a host sync, so callers can enqueue every point batch before
        fetching any result (dispatch overlaps compute + transfers)."""
        assert self._feats is not None, "call set_image first"
        coords = self._scale_coords(np.asarray(point_coords, np.float32))
        labels = np.ones(coords.shape[:2], np.int32)
        f = self._feats
        return self._propose(
            self.compute_variables, f["pix"], f["s0"], f["s1"],
            jnp.asarray(coords), jnp.asarray(labels), stability_offset)

    def propose_filter(self, point_coords: np.ndarray,
                       stability_offset: float,
                       iou_thresh: float, stab_thresh: float,
                       chunk: int, k_max: int):
        """Single-dispatch AMG propose/filter: (N, 1, 2) image-space points
        -> DEVICE (scores, low-res logits, flat idx, ious, stabs, n_valid)
        for the top-``k_max`` threshold survivors, score-sorted desc.
        ``n_valid`` (total survivors) lets the caller detect k_max overflow
        and fall back; callers finalize a bucket-padded prefix via
        ``finalize_masks_device``."""
        assert self._feats is not None, "call set_image first"
        coords = self._scale_coords(np.asarray(point_coords, np.float32))
        n = coords.shape[0]
        n_chunks = (n + chunk - 1) // chunk
        pad = n_chunks * chunk - n
        coords = np.concatenate(
            [coords, np.tile(coords[-1:], (pad, 1, 1))], axis=0)
        valid = np.concatenate(
            [np.ones(n, bool), np.zeros(pad, bool)])
        f = self._feats
        return self._propose_filter_finalize(
            self.compute_variables, f["pix"], f["s0"], f["s1"],
            jnp.asarray(coords.reshape(n_chunks, chunk, 1, 2)),
            jnp.asarray(valid.reshape(n_chunks, chunk)),
            stability_offset, iou_thresh, stab_thresh, k_max)

    def finalize_masks(self, low_sel, h: int, w: int) -> np.ndarray:
        """Upscale selected (K, 4h, 4w) device logits -> host (K, h, w) uint8."""
        return np.asarray(self._finalize(low_sel, h, w))

    def finalize_masks_packed(self, low_sel, h: int, w: int):
        """AMG finalize: returns (masks (K, h, w) bool, boxes (K, 4) xyxy,
        areas (K,)) with the mask transfer bit-packed 8x and boxes/areas
        computed on device (no per-mask host scans)."""
        packed, boxes, areas = self._finalize_packed(low_sel, h, w)
        return (unpack_masks(np.asarray(packed), h, w),
                np.asarray(boxes), np.asarray(areas))

    def finalize_masks_dispatch(self, low_sel, h: int, w: int,
                                k_fin: Optional[int] = None):
        """Dispatch-only finalize: (packed, boxes, areas) as DEVICE arrays,
        no host fetch. The pipelined AMG path dispatches this for frame k
        BEFORE enqueuing frame k+1's encode/propose, so the later
        boxes/areas fetch blocks only on this program — not on the next
        frame's whole propose (the in-order stream would otherwise
        serialize the fetch behind it)."""
        return self._finalize_packed(low_sel, h, w, k_fin)

    def finalize_masks_device(self, low_sel, h: int, w: int,
                              k_fin: Optional[int] = None):
        """Deferred-fetch finalize: returns (packed DEVICE array, host boxes,
        host areas). Callers NMS on the cheap boxes first, then fetch only
        the kept rows (``packed_dev[idx]`` + unpack_masks). ``k_fin``
        (static) finalizes only the leading k_fin rows — pass a bucket-padded
        survivor count to avoid upscaling a mostly-padding buffer."""
        packed, boxes, areas = self._finalize_packed(low_sel, h, w, k_fin)
        return packed, np.asarray(boxes), np.asarray(areas)

    def _prep_prompts(self, point_coords, point_labels, box):
        """Shared box/point -> padded (coords, labels, n_real) prep.

        Bucket-pads the prompt axis: the jitted programs are specialized
        on N, and production box counts vary per (frame, expression) — an
        unpadded call would compile a fresh program for every distinct
        count (minutes each through a compile relay). Pads by repeating
        the last prompt row to the next multiple of 4; callers slice."""
        prompts = []
        if box is not None:
            box = np.asarray(box, np.float32)
            if box.ndim == 1:
                box = box[None]
            corners = self._scale_coords(box.reshape(-1, 2, 2))
            labels = np.tile(np.asarray([2, 3], np.int32)[None],
                             (corners.shape[0], 1))
            prompts.append((corners, labels))
        if point_coords is not None:
            pts = self._scale_coords(
                np.asarray(point_coords, np.float32).reshape(
                    -1, point_coords.shape[-2]
                    if point_coords.ndim > 2 else 1, 2))
            lbl = np.asarray(point_labels, np.int32).reshape(pts.shape[:2])
            prompts.append((pts, lbl))
        assert prompts, "no prompts given"
        if len(prompts) == 1:
            coords, labels = prompts[0]
        else:
            n = prompts[0][0].shape[0]
            coords = np.concatenate([p[0] for p in prompts], axis=1)
            labels = np.concatenate([p[1] for p in prompts], axis=1)
            assert coords.shape[0] == n

        n_real = coords.shape[0]
        n_pad = ((n_real + 3) // 4) * 4
        if n_pad != n_real:
            reps = (n_pad - n_real, 1, 1)
            coords = np.concatenate(
                [coords, np.tile(coords[-1:], reps)], axis=0)
            labels = np.concatenate(
                [labels, np.tile(labels[-1:], reps[:2])], axis=0)
        return coords, labels, n_real

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                multimask_output: bool = False):
        """Returns (masks (N, K, H, W) bool, scores (N, K),
        low_res_logits (N, K, 4h, 4w)); N prompt sets, K=3 if multimask."""
        assert self._feats is not None, "call set_image first"
        coords, labels, n_real = self._prep_prompts(point_coords,
                                                    point_labels, box)
        f = self._feats
        fn = self._predict_multi if multimask_output else self._predict_single
        out = fn(self.compute_variables, f["pix"], f["s0"], f["s1"],
                 jnp.asarray(coords), jnp.asarray(labels))
        high = _resize_masks(out["high_res_masks"][:n_real], self._orig_hw)
        masks = np.asarray(high > 0.0)
        return (masks, np.asarray(out["ious"][:n_real]),
                np.asarray(out["low_res_masks"][:n_real]))

    def predict_packed(self, point_coords: Optional[np.ndarray] = None,
                       point_labels: Optional[np.ndarray] = None,
                       box: Optional[np.ndarray] = None,
                       stability_offset: float = 1.0):
        """Single-mask predict with a bit-packed fetch and device-side
        stability: returns (masks (N, H, W) bool, scores (N,),
        stability (N,)). ~10x fewer host-link bytes than ``predict`` +
        host ``compute_stability_score`` — same numerics (linear resize of
        the high-res logits > 0; stability from the low-res logits with
        the standard +-offset rule)."""
        assert self._feats is not None, "call set_image first"
        h, w = self._orig_hw
        coords, labels, n_real = self._prep_prompts(point_coords,
                                                    point_labels, box)
        f = self._feats
        packed, ious, stab = self._predict_packed(
            self.compute_variables, f["pix"], f["s0"], f["s1"],
            jnp.asarray(coords), jnp.asarray(labels), stability_offset,
            h, w)
        masks = unpack_masks(np.asarray(packed), h, w)[:n_real]
        return (masks, np.asarray(ious, np.float32)[:n_real],
                np.asarray(stab, np.float32)[:n_real])


def unpack_masks(packed: np.ndarray, h: int, w: int) -> np.ndarray:
    """(K, h, ceil(w/8)) bit-packed uint8 -> (K, h, w) bool."""
    k = packed.shape[0]
    if k == 0:
        return np.zeros((0, h, w), bool)
    return np.unpackbits(
        packed.reshape(k, -1), axis=1,
        count=packed.shape[1] * packed.shape[2] * 8).reshape(
            k, h, -1)[:, :, :w].astype(bool)


def _resize_masks(masks: jax.Array, orig_hw) -> jax.Array:
    h, w = orig_hw
    return jax.image.resize(
        masks, masks.shape[:2] + (h, w), method="linear")


def compute_stability_score(logits: np.ndarray, mask_threshold: float = 0.0,
                            threshold_offset: float = 1.0) -> np.ndarray:
    """Stability = |logit > thr+off| / |logit > thr-off| over the last two
    axes (prompt_generator.py:169-186 / SAM AMG semantics)."""
    logits = np.asarray(logits)
    inter = (logits > (mask_threshold + threshold_offset)).sum(
        axis=(-2, -1)).astype(np.float64)
    union = (logits > (mask_threshold - threshold_offset)).sum(
        axis=(-2, -1)).astype(np.float64)
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)
