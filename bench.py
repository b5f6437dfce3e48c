"""Driver benchmark: one JSON line covering BOTH pipeline stages.

Headline metric: SAM2 propagation throughput in object-frames/s (hiera-L,
1024px, 8-object batch, 480x854 frames) — the hot loop where the reference's
end-to-end track-generation time is spent (SURVEY.md §3.4). ``vs_baseline``
compares against upstream SAM2 hiera-L propagation on an A100, ~15-20 fps at
ONE object => ~17.5 object-frames/s (the reference's own execution model:
one video per GPU process, runtime_info fps at generate_tokens_gdino.py:329).

``metrics`` carries the full dict the round is judged on:
  - sam2_encode_fps / sam2_propagation_fps / sam2_propagation_object_fps
  - selection_forward_pairs_per_s (+ analytic MFU on v5e bf16 peak)
  - selection_train_pairs_per_s (full fwd+bwd+AdamW step)

Knobs: SOLA_BENCH_FRAMES (default 32), SOLA_BENCH_SKIP_TRACKGEN=1 to skip
the SAM2 stage (slow first compile through this sandbox's remote relay),
SOLA_BENCH_ONLY=sec1,sec2 to run selected sections only
(selection/train/loader/roberta/gdino/trackgen/e2e/packed/longvideo).

Un-losable under external timeouts (round-4 lesson: the driver's watchdog
killed the run and the official record got NOTHING, BENCH_r04.json):
  - a full cumulative record line (same JSON schema, flushed) prints after
    EVERY completed section, so the newest complete record is always the
    last JSON line on stdout no matter when the process dies;
  - sections emit partial {"metrics": ...} lines as sub-results land, and
    the parent salvages the last JSON line from a child it had to kill;
  - the whole run plans inside SOLA_BENCH_TOTAL_BUDGET seconds (default
    2400): headline `trackgen` first with a hard slice, then the cheap
    sections, then optional ones — anything that no longer fits is skipped
    and recorded as skipped, never silently lost.
"""

import json
import os
import sys
import time
from typing import Optional

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()

V5E_BF16_PEAK_FLOPS = 197e12
A100_PROPAGATION_OBJECT_FPS = 17.5  # upstream SAM2-L, 1 object, 15-20 fps
# SAM/SAM2 automatic mask generation (32x32 point grid + per-mask post)
# is commonly reported around ~1 s/frame on A100-class GPUs; used only to
# COMPOSE the e2e baseline below (no published e2e number exists,
# BASELINE.md "publishes no benchmark numbers").
A100_AMG_S_PER_FRAME = 1.0


def _partial(metrics: dict) -> None:
    """Emit an in-section partial-metrics line. If an external watchdog
    kills this process (or the parent driver kills this child on budget),
    the last such line is salvaged into the record — a section that dies
    80% done no longer reports nothing."""
    print(json.dumps({"metrics": metrics}), flush=True)


def bench_selection(n_pairs: int = 512, batch: int = 8, n_tracks: int = 64,
                    n_frames: int = 64, n_words: int = 16,
                    iters: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from sola_tpu.models.selection import SelectionConfig, SelectionModel

    cfg = SelectionConfig()
    model = SelectionModel(cfg)
    key = jax.random.PRNGKey(0)
    obj = jax.random.normal(key, (batch, n_tracks, n_frames,
                                  cfg.object_token_dim), jnp.float32)
    lang = jax.random.normal(key, (batch, n_words, cfg.lang_token_dim),
                             jnp.float32)
    variables = model.init(key, obj, lang)
    track_mask = jnp.ones((batch, n_tracks), bool)
    frame_lengths = jnp.full((batch,), n_frames, jnp.int32)
    lang_mask = jnp.ones((batch, n_words), bool)

    # each call's input depends on the previous call's output (chained
    # INSIDE the program) and the timing window ends with a value fetch:
    # this environment's relay acks block_until_ready before execution
    # completes, so unchained loops measure dispatch rate, not compute
    def fwd(v, o, l):
        score_map, _ = model.apply(
            v, o, l, track_mask=track_mask, frame_lengths=frame_lengths,
            lang_mask=lang_mask)
        score = jax.nn.sigmoid(score_map)
        o_next = o + jnp.mean(score) * 0.0
        return o_next, score

    step = jax.jit(fwd)
    o, out = step(variables, obj, lang)
    float(out.sum())

    def run(n):
        o, out = obj, None
        for _ in range(n):
            o, out = step(variables, o, lang)
        return float(out.sum())

    n_steps = max(8, n_pairs // batch)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run(8)
        t8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n_steps + 8)
        tn = time.perf_counter() - t0
        best = min(best, (tn - t8) / n_steps)  # slope: fixed sync removed
    pairs_per_s = batch / best

    # analytic MFU from XLA's own flop count for one step
    mfu = None
    try:
        cost = step.lower(variables, obj, lang).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = (flops * pairs_per_s / batch) / V5E_BF16_PEAK_FLOPS
    except Exception:
        pass
    return {"selection_forward_pairs_per_s": round(pairs_per_s, 2),
            **({"selection_forward_mfu_v5e": round(mfu, 4)}
               if mfu is not None else {})}


def bench_train_step(batch: int = 8, n_tracks: int = 64, n_frames: int = 64,
                     n_words: int = 16, n_steps: int = 24,
                     iters: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    from sola_tpu.train import state as state_lib
    from sola_tpu.train.loop import make_train_step

    cfg = SelectionConfig()
    model = SelectionModel(cfg)
    optimizer = state_lib.make_optimizer(lr=5e-6, grad_clip_norm=1.0)
    tstate = state_lib.create_train_state(cfg, optimizer)
    train_step = make_train_step(model, optimizer, {
        "positive_weight": 1.5, "alignment_weight": 0.3,
        "temperature": 0.07})
    rng = np.random.default_rng(0)
    batch_data = {
        "object_tokens": jnp.asarray(rng.standard_normal(
            (batch, n_tracks, n_frames, cfg.object_token_dim),
            dtype=np.float32)),
        "track_mask": jnp.ones((batch, n_tracks), bool),
        "frame_lengths": jnp.full((batch,), n_frames, jnp.int32),
        "lang_tokens": jnp.asarray(rng.standard_normal(
            (batch, n_words, cfg.lang_token_dim), dtype=np.float32)),
        "lang_mask": jnp.ones((batch, n_words), bool),
        "pos_tokens": jnp.asarray(rng.standard_normal(
            (batch, 1, cfg.lang_token_dim), dtype=np.float32)),
        "labels": jnp.asarray(
            (rng.random((batch, n_tracks)) > 0.5).astype(np.float32)),
    }
    import jax as _jax
    key = _jax.random.PRNGKey(0)
    tstate, parts = train_step(tstate, batch_data, key)  # compile
    float(parts["total"])
    best = float("inf")
    for _ in range(iters):
        # value fetch of the LAST step's loss transitively waits for the
        # whole state-chained window (block_until_ready can ack early here)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            tstate, parts = train_step(tstate, batch_data, key)
        float(parts["total"])
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = (n_steps * batch) / best
    out = {"selection_train_pairs_per_s": round(pairs_per_s, 2)}
    # analytic MFU from XLA's own flop count for one fwd+bwd+AdamW step
    # (mirrors the forward section's MFU at bench_selection)
    try:
        cost = train_step.lower(tstate, batch_data, key).compile(
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            out["selection_train_mfu_v5e"] = round(
                (flops * pairs_per_s / batch) / V5E_BF16_PEAK_FLOPS, 4)
    except Exception:
        pass
    return out


def bench_loader_train(n_videos: int = 48, n_objects: int = 4,
                       n_distractors: int = 36, n_frames: int = 64,
                       batch: int = 32, steps_per_dispatch: int = 6,
                       epochs: int = 2) -> dict:
    # batch 32 x 3 steps/dispatch: with tokens device-cached and batches
    # carried as rows, per-DISPATCH relay latency (~100 ms through this
    # sandbox's tunnel) is the residual bound; bigger batches and the
    # multi-step scan amortize it (the reference is pinned to batch_size=1
    # with one dispatch per sample — train.py:93-146)
    """Measured loader+train throughput on an on-disk synthetic dataset
    (sam2_tracks layout, one token .npy per track like the reference's
    dataloader.py:162): does the input pipeline feed the train step?"""
    import shutil
    import tempfile

    import jax

    from sola_tpu.data import synthetic
    from sola_tpu.data.dataset import get_loader_dict
    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    from sola_tpu.models.text import CachingTextEncoder, HashTextEncoder
    from sola_tpu.train import state as state_lib
    from sola_tpu.train.loop import (make_train_multi_step, make_train_step,
                                     prepare_batch)

    root = tempfile.mkdtemp(prefix="sola_bench_loader_")
    try:
        gen = synthetic.generate(
            root, n_videos=n_videos, n_frames=n_frames, n_objects=n_objects,
            n_distractors=n_distractors, data_type="train")
        cfgs = gen["configs"]
        cfgs["train"]["batch_size"] = batch
        cfgs["num_workers"] = 4
        loader = get_loader_dict(cfgs)["train"]
        # production train-loop configuration: tokens live in the device
        # cache, batches carry per-sample rows only (train/loop.py does
        # the same when the cache is on)
        loader.materialize_tokens = False

        cfg = SelectionConfig()
        model = SelectionModel(cfg)
        optimizer = state_lib.make_optimizer(lr=5e-6, grad_clip_norm=1.0)
        tstate = state_lib.create_train_state(cfg, optimizer)
        train_cfg = {"positive_weight": 1.5, "alignment_weight": 0.3,
                     "temperature": 0.07, "positive_metric": "iou",
                     "positive_threshold": 0.7,
                     # halve host->device bytes: this sandbox's device link
                     # is the binding constraint for loader-fed training
                     "bf16_token_transfer": True}
        step = make_train_step(model, optimizer, train_cfg)
        multi = make_train_multi_step(model, optimizer, train_cfg)
        # device-resident token cache: one upload per video, device-side
        # stack per batch — steady-state epochs ship only labels/masks/text
        from sola_tpu.data.device_cache import DeviceTokenCache
        import jax.numpy as jnp
        cache = DeviceTokenCache(per_expression=False, dtype=jnp.bfloat16)
        text = CachingTextEncoder(HashTextEncoder(cfg.lang_token_dim))
        key = jax.random.PRNGKey(0)

        n_pairs = n_videos * n_objects

        def one_epoch(st):
            n = 0
            nbytes = 0
            metrics = None
            pending, pkey = [], None
            for raw in loader:
                misses0 = cache.misses
                b = prepare_batch(raw, text, train_cfg, token_cache=cache)
                # transferred bytes: every non-token tensor + only the
                # cache-miss token rows (hits never touch the host link)
                nbytes += sum(int(np.prod(v.shape)) * v.dtype.itemsize
                              for k2, v in b.items()
                              if hasattr(v, "dtype") and k2 != "object_tokens")
                row_bytes = int(np.prod(
                    raw["object_token_rows"][0].shape)) * 2  # bf16
                nbytes += (cache.misses - misses0) * row_bytes
                shp = (jax.tree_util.tree_structure(b), tuple(
                    getattr(x, "shape", None)
                    for x in jax.tree_util.tree_leaves(b)))
                if pending and shp != pkey:  # bucket changed: drain singly
                    for pb in pending:
                        st, metrics = step(st, pb, key)
                    pending = []
                pending.append(b)
                pkey = shp
                if len(pending) >= steps_per_dispatch:
                    st, metrics = multi(
                        st, tuple(pending),
                        jnp.stack([key] * len(pending)))
                    metrics = {k2: v[-1] for k2, v in metrics.items()}
                    pending, pkey = [], None
                n += int(np.sum(np.asarray(raw["track_mask"]).any(axis=1)))
            for b in pending:  # remainder: per-step dispatches
                st, metrics = step(st, b, key)
            # value fetch transitively waits the state-chained epoch
            float(metrics["total"])
            return st, n, nbytes

        tstate, _, _ = one_epoch(tstate)  # warmup: compiles + text cache
        t0 = time.perf_counter()
        total = 0
        total_bytes = 0
        for _ in range(epochs):
            tstate, n, nbytes = one_epoch(tstate)
            total += n
            total_bytes += nbytes
        elapsed = time.perf_counter() - t0
        hit_rate = cache.hits / max(cache.hits + cache.misses, 1)
        return {"loader_train_pairs_per_s": round(total / elapsed, 2),
                "loader_epoch_s": round(elapsed / epochs, 2),
                "loader_epoch_pairs": n_pairs,
                "loader_token_cache_hit_rate": round(hit_rate, 3),
                # when this ~matches the link bandwidth, the epoch is
                # host->device transfer-bound, not loader- or compute-bound
                "loader_host_to_device_MBps": round(
                    total_bytes / elapsed / 1e6, 1)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_trackgen(n_frames: int, obj_batch: int = 8) -> dict:
    # 8-object batches: measured 82 object-fps vs 57 at the reference's
    # 4-object ceiling (the object axis is a compile-time knob here;
    # upstream is capped at 4 by GPU memory)
    import jax

    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor

    model, variables = build_sam2(None)
    pred = SAM2VideoPredictor(model, variables, obj_batch=obj_batch)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
              for _ in range(n_frames)]

    state = pred.init_state(frames)  # includes compile
    float(state.features["pix"].astype("float32").sum())
    t0 = time.perf_counter()
    state = pred.init_state(frames)
    # value fetch: block_until_ready can ack before execution completes
    float(state.features["pix"].astype("float32").sum())
    t_encode = time.perf_counter() - t0

    # compute-only encode: the same chunked hiera-L encode over frames
    # ALREADY device-resident — isolates the XLA program from this
    # sandbox's ~10 MB/s tunneled host link (a real v5e host feeds frames
    # over PCIe; the link-inclusive number above is environment-bound,
    # this one is hardware-bound)
    import jax.numpy as jnp
    raw_all = jnp.asarray(np.stack(frames))  # one upload, outside timing
    jax.block_until_ready(raw_all)
    ck = pred.encode_chunk
    n_enc = n_frames - n_frames % ck
    pred.encode_frames_device(raw_all[:n_enc])  # compile
    t_enc_compute = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f = pred.encode_frames_device(raw_all[:n_enc])
        float(f["pix"].astype(jnp.float32).sum())  # value-fetch drain
        t_enc_compute = min(t_enc_compute, time.perf_counter() - t0)

    # a half-length view sharing the encoded features: the SLOPE between
    # the full and half pass removes per-pass fixed costs (cond-frame
    # consolidation, dispatch pipeline fill, link-phase jitter on small
    # transfers) from the per-frame number — the quantity that scales
    import dataclasses as _dc
    state_half = _dc.replace(state, num_frames=n_frames // 2, prompts={},
                             output_tokens={}, obj_ids=[], banks=None,
                             seed_buf=None, seed_frames=None)

    mask = np.zeros((480, 854), np.float32)
    mask[100:220, 200:400] = 1.0

    def run_pass(st, output_mode="masks"):
        pred.reset_state(st)
        pred.add_new_mask(st, 0, 0, mask)
        n = 0
        for _ in pred.propagate_in_video(st, output_mode=output_mode):
            n += 1
        for _ in pred.propagate_in_video(st, reverse=True,
                                         output_mode=output_mode):
            n += 1
        if output_mode == "none":
            # nothing was fetched: force execution of the chained scans
            float(jnp.sum(st.banks[2].astype(jnp.float32)))
        return n

    def paired_slope(output_mode="masks", repeats=3):
        """Per repeat, time the full and half pass back-to-back (same link
        phase) and difference them; min over repeats. Differencing inside
        one repeat is what makes the slope robust to the tunneled link's
        multi-second phase changes between repeats.

        Degenerate pairs are clamped: a host-load or link burst during the
        half pass can make t_half >= t_full, giving a non-positive (or
        absurdly small) slope — a pair's slope is only accepted inside
        (5% .. 100%] of the full pass's naive per-frame time; otherwise
        that repeat falls back to the naive bound (fixed costs included,
        conservative). Without this the headline can print negative
        (observed once under concurrent host load)."""
        best_slope, best_fixed, n_full = float("inf"), 0.0, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            n_full = run_pass(state, output_mode)
            t_full = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_half = run_pass(state_half, output_mode)
            t_half = time.perf_counter() - t0
            d = max((n_full - 1) - (n_half - 1), 1)
            naive = t_full / max(n_full - 1, 1)
            slope = (t_full - t_half) / d
            if not (0.05 * naive < slope <= naive):
                slope = naive  # degenerate pairing; see docstring
            if slope < best_slope:
                best_slope = slope
                best_fixed = max(t_half - slope * (n_half - 1), 0.0)
        return best_slope, best_fixed

    _partial({"sam2_encode_fps": round(n_frames / t_encode, 2),
              "sam2_encode_compute_fps": round(n_enc / t_enc_compute, 2)})
    run_pass(state)        # warmup/compile (full)
    run_pass(state_half)   # warmup/compile (half buckets)
    slope, fixed = paired_slope()

    # scan-only slope: the same passes with no output transfer/host work —
    # the compute+dispatch floor; 1 - scan/full = non-compute fraction
    run_pass(state, "none")
    run_pass(state_half, "none")
    slope_scan, _ = paired_slope("none")
    slope_scan = min(slope_scan, slope)  # the floor cannot exceed the total

    out = {
        "sam2_encode_fps": round(n_frames / t_encode, 2),
        "sam2_encode_compute_fps": round(n_enc / t_enc_compute, 2),
        "sam2_propagation_fps": round(1.0 / slope, 2),
        "sam2_propagation_object_fps": round(obj_batch / slope, 2),
        "sam2_propagation_fixed_s_per_pass": round(fixed, 3),
        "sam2_propagation_scan_only_fps": round(1.0 / max(slope_scan, 1e-9),
                                                2),
        "sam2_propagation_noncompute_frac": round(
            max(0.0, 1.0 - slope_scan / max(slope, 1e-9)), 3),
        "sam2_obj_batch": obj_batch,
        "sam2_frames": n_frames,
    }
    _partial(out)

    # grid-prompt proposal stage (generate_prompts_grid.py:100): AMG over the
    # 32x32 grid with reference thresholds, steady-state seconds per frame
    try:
        from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator
        from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor

        ipred = SAM2ImagePredictor(model, variables)
        amg = SAM2AutomaticMaskGenerator(ipred, points_per_batch=256)
        amg.generate(frames[0])  # compile
        # production path: pipelined over frames (next frame's encode
        # overlaps this frame's host post-processing)
        n_amg = 3
        t0 = time.perf_counter()
        for _ in amg.generate_many(frames[:n_amg]):
            pass
        out["amg_s_per_frame"] = round((time.perf_counter() - t0) / n_amg, 3)
    except Exception as e:
        out["amg_error"] = f"{type(e).__name__}: {e}"
    return out


def bench_packed(n_frames: int = 32, repeats: int = 3) -> dict:
    """Cross-video packed propagation (sam2/packed.py): N videos' objects
    share one lax.scan program's slots — a capability the reference cannot
    express (its loop is one-video-at-a-time, <=4 objects per pass,
    generate_tokens_grid.py:181-186). Scenario: 2 videos x 4 prompts at an
    8-slot program — sequential runs 2 propagation passes at 50% slot
    utilization; packing runs 1 at 100%.

    Timing uses the same paired full/half-length slope method as the
    headline (per-frame marginal cost, mask fetch included): engine-level
    absolute times are dominated by this sandbox's bursty host link and
    shared host finalize work, which the slope differences out. The
    reported fps are per-frame-step aggregate object throughputs:
    sequential carries 4 live objects per step and needs 2 passes for the
    8 objects; packed carries all 8 in one pass."""
    import dataclasses as _dc

    from sola_tpu.trackgen import packed_engine
    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.packed import (PackedFeatures,
                                               PackedPropagator, SlotPlan)
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor

    model, variables = build_sam2(None)
    pred = SAM2VideoPredictor(model, variables, obj_batch=8)
    H, W = 480, 854
    size = pred.cfg.image_size

    def make_frames(seed):
        r = np.random.default_rng(seed)
        return [r.integers(0, 255, (H, W, 3), dtype=np.uint8)
                for _ in range(n_frames)]

    prompt_masks = []
    for i in range(4):
        m = np.zeros((H, W), np.uint8)
        y = 40 + (i * 97) % (H - 140)
        x = 60 + (i * 211) % (W - 220)
        m[y:y + 100, x:x + 160] = 1
        prompt_masks.append(m)

    states = [pred.init_state(make_frames(i)) for i in range(2)]
    halves = [_dc.replace(st, num_frames=n_frames // 2, prompts={},
                          output_tokens={}, obj_ids=[], banks=None,
                          seed_buf=None, seed_frames=None, small_parts=None)
              for st in states]
    prop = PackedPropagator(pred)
    pack = PackedFeatures.build(states)
    cond_masks = np.zeros((8, size, size), np.float32)
    for s in range(8):
        cond_masks[s] = packed_engine._resize_prompt(
            prompt_masks[s % 4], size)

    import jax.numpy as jnp

    def run_packed(t, collect=True):
        plan = SlotPlan(video=np.asarray([0] * 4 + [1] * 4),
                        cond=np.zeros(8, np.int64),
                        length=np.full(8, t, np.int64))
        t0 = time.perf_counter()
        r = prop.run_round(pack, plan, cond_masks, collect=collect)
        if not collect:  # force the chained scans (value fetch)
            float(jnp.sum(r["banks"][2].astype(jnp.float32)))
        return time.perf_counter() - t0

    def run_seq(sts, output_mode="masks"):
        t0 = time.perf_counter()
        for st in sts:
            pred.reset_state(st)
            for i, m in enumerate(prompt_masks):
                pred.add_new_mask(st, 0, i, m)
            for _ in pred.propagate_in_video(st, output_mode=output_mode):
                pass
            if output_mode == "none":
                float(jnp.sum(st.banks[2].astype(jnp.float32)))
            else:
                pred.get_small_masklets(st)  # device-side assembly
        return time.perf_counter() - t0

    full_steps, half_steps = n_frames - 1, n_frames // 2 - 1
    d = full_steps - half_steps

    def slope_of(t_full, t_half, d_steps, fsteps):
        naive = t_full / fsteps
        s = (t_full - t_half) / d_steps
        if not (0.05 * naive < s <= naive):
            s = naive  # degenerate pairing under link/host bursts
        return s

    def measure(packed_kw, seq_mode):
        """One repeat = all four timed runs back-to-back (packed full/half,
        seq full/half) so the packed-vs-seq RATIO shares one link phase;
        cross-phase drift once flipped the headline to 0.93x while the
        compute ratio said 1.99x. Returns per-variant slopes + the ratio;
        the caller medians the ratio over repeats."""
        sp = slope_of(run_packed(n_frames, **packed_kw),
                      run_packed(n_frames // 2, **packed_kw), d, full_steps)
        ss = slope_of(run_seq(states, seq_mode), run_seq(halves, seq_mode),
                      2 * d, 2 * full_steps)
        return sp, ss, (8.0 / sp) / (4.0 / ss)

    # warm/compile every schedule (full + half, both modes)
    run_packed(n_frames)
    run_packed(n_frames // 2)
    run_seq(states)
    run_seq(halves)
    run_packed(n_frames, collect=False)
    run_packed(n_frames // 2, collect=False)
    run_seq(states, "none")
    run_seq(halves, "none")

    masks_runs = [measure({}, "masks") for _ in range(repeats)]
    # scan-only: no output fetch — the compute-level utilization win (the
    # masks-mode packed slope carries 2x the per-step fetch bytes over
    # this sandbox's ~10 MB/s link; real hosts feed via PCIe)
    scan_runs = [measure({"collect": False}, "none")
                 for _ in range(repeats)]

    def median_run(runs):
        # the repeat whose RATIO is the median; its fps pair is reported
        # so fps_packed / fps_seq == speedup inside one record (the old
        # min-slope-per-variant fps could disagree with the median ratio)
        runs = sorted(runs, key=lambda r: r[2])
        return runs[len(runs) // 2]

    sp, ss, ratio = median_run(masks_runs)
    _, _, scan_ratio = median_run(scan_runs)
    return {
        "sam2_seq_object_fps_ref_batching": round(4.0 / ss, 2),
        "sam2_packed_object_fps": round(8.0 / sp, 2),
        # engine-level (mask fetch included): LINK-BOUND in this sandbox —
        # packed fetches 2x the bytes per step over a ~10 MB/s tunnel, so
        # this floats with link phase; scan_speedup is the compute-level
        # utilization win and the headline packing metric (STATUS r4 #4)
        "sam2_packed_speedup_linkbound": round(ratio, 2),
        "sam2_packed_scan_speedup": round(scan_ratio, 2),
    }


def bench_longvideo(n_frames: int = 256, obj_batch: int = 8,
                    size: str = "large") -> dict:
    """Long-video propagation datapoint: one full T=256 pass, with and
    without memory_stride (SURVEY §5 long-context), plus the number of XLA
    compile events the pass triggers.

    The reference's >200-frame branch only reduces prompt batching to 2
    to fit GPU memory (generate_tokens_grid.py:181-186); here the memory
    bank is a fixed-size ring and passes are scan-chunked (scan_chunk=16
    compiled segments), so a 256-frame pass reuses the 32-frame bench's
    programs — the compile-event count asserts that claim on chip.
    memory_stride=4 admits every 4th frame into the non-conditioning
    ring: same bank shapes (zero recompiles), fresher long-horizon
    memory, identical per-frame compute."""
    import dataclasses as _dc
    import logging

    import jax
    import jax.numpy as jnp

    from sola_tpu.trackgen.sam2.convert import build_sam2, sam2_config_for
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor

    compile_events = {"n": 0}

    class _CompileCounter(logging.Handler):
        def emit(self, record):
            if "Compiling" in record.getMessage():
                compile_events["n"] += 1

    counter = _CompileCounter(level=logging.DEBUG)
    jax_logger = logging.getLogger("jax")
    jax_logger.addHandler(counter)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    mask = np.zeros((480, 854), np.float32)
    mask[100:220, 200:400] = 1.0

    def one_pass(pred, state, output_mode):
        pred.reset_state(state)
        pred.add_new_mask(state, 0, 0, mask)
        t0 = time.perf_counter()
        for _ in pred.propagate_in_video(state, output_mode=output_mode):
            pass
        if output_mode == "none":
            float(jnp.sum(state.banks[2].astype(jnp.float32)))
        return time.perf_counter() - t0

    out = {"longvideo_frames": n_frames}
    try:
        with jax.log_compiles():
            # one model build + ONE frame upload/encode: params and encoded
            # features are stride-independent (memory_stride only gates
            # which frames enter the memory ring during propagation), and
            # the 256-frame upload dominates this section's wall clock on
            # the tunneled link
            from sola_tpu.trackgen.sam2.model import SAM2Model

            model, variables = build_sam2(None, cfg=sam2_config_for(size))
            pred1 = SAM2VideoPredictor(model, variables,
                                       obj_batch=obj_batch)
            state = pred1.init_state(frames)
            model4 = SAM2Model(_dc.replace(sam2_config_for(size),
                                           memory_stride=4))
            pred4 = SAM2VideoPredictor(model4, variables,
                                       obj_batch=obj_batch)
            for stride, pred in ((1, pred1), (4, pred4)):
                one_pass(pred, state, "none")  # compile + warm
                compiles_before = compile_events["n"]
                t = min(one_pass(pred, state, "none") for _ in range(2))
                key = ("longvideo_object_fps" if stride == 1 else
                       f"longvideo_object_fps_stride{stride}")
                out[key] = round(obj_batch * (n_frames - 1) / t, 2)
                out[f"longvideo_warm_compiles_stride{stride}"] = (
                    compile_events["n"] - compiles_before)
                _partial(out)
                if stride == 1:
                    # link-inclusive number: masks fetched per chunk
                    t_m = one_pass(pred, state, "masks")
                    out["longvideo_object_fps_with_fetch"] = round(
                        obj_batch * (n_frames - 1) / t_m, 2)
    finally:
        jax_logger.removeHandler(counter)
    return out


def bench_e2e(n_frames: int = 32, n_prompts: int = 12,
              repeats: int = 2, size: Optional[str] = None,
              hw: tuple = (480, 854), points_per_side: int = 32) -> dict:
    """End-to-end track-generation + selection throughput, in videos/sec —
    BASELINE.md's target definition ("≥5x A100 end-to-end track-generation
    + selection throughput (videos/sec)"). One synthetic video runs the
    whole production pipeline inside a single timed window:

      1. AMG grid prompts over binned frames (bin_size 4, reference
         generate_prompts_grid.py:80-100 semantics);
      2. frame upload + encode + bidirectional SAM2 propagation + token
         harvest + dedup via trackgen.engine.generate_tracks (the
         generate_tokens_grid.py loop);
      3. selection forward (full 1024-d/2-layer model) + merged-masklet
         J&F against GT (evaluator.py:227-247 semantics, on device).

    Workload pinning: weights are random (zero egress), so AMG's mask
    CONTENT is meaningless — AMG runs for its real compute cost, then the
    prompt list is replaced by ``n_prompts`` fixed rectangles at frame 0
    (12 prompts -> one 8-object pass + one 4-object pass at the 8-slot
    program; the reference needs three 4-object passes). Dedup IoU
    programs run but never filter (miou_thresh pinned > 1), and the
    selection stage always merges the top-2 scoring tracks, so the timed
    work is deterministic run to run.

    Composed A100 baseline (the reference publishes no e2e number,
    BASELINE.md): AMG ~1.0 s/frame + propagation at 17.5 object-frames/s
    (2 * T * n_tracks object-frames per video, batching-independent);
    reference selection+eval (~0.1 s/video on GPU) is charged at zero —
    a conservative baseline.
    """
    import jax
    import jax.numpy as jnp

    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    from sola_tpu.models.text import HashTextEncoder
    from sola_tpu.trackgen import engine
    from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator
    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor

    H, W = hw
    bin_size = 4
    # deterministic scene: moving rectangles on a flat background
    frames = []
    for t in range(n_frames):
        f = np.full((H, W, 3), 30, np.uint8)
        for k in range(6):
            y = (40 + 37 * k + 3 * t) % max(H - 120, 1)
            x = (60 + 131 * k + 5 * t) % max(W - 180, 1)
            f[y:y + 100, x:x + 150] = (40 * (k + 1)) % 226 + 20
        frames.append(f)

    if size == "tiny_test":  # CPU smoke path (tests)
        from sola_tpu.trackgen.sam2.model import SAM2Config
        model, variables = build_sam2(None, cfg=SAM2Config.tiny_test())
    else:
        model, variables = build_sam2(None)
    pred = SAM2VideoPredictor(model, variables, obj_batch=8)
    amg = SAM2AutomaticMaskGenerator(SAM2ImagePredictor(model, variables),
                                     points_per_side=points_per_side,
                                     points_per_batch=256)

    scfg = SelectionConfig()
    sel_model = SelectionModel(scfg)
    n_track_pad = 16
    key = jax.random.PRNGKey(0)
    text_enc = HashTextEncoder(scfg.lang_token_dim)
    hidden, hmask, _ = text_enc.encode_batch(
        ["the red object moving right."])
    lang_b = jnp.asarray(hidden)               # (1, L, lang_dim)
    lang_mask = jnp.asarray(hmask, bool)       # (1, L)
    sel_vars = sel_model.init(
        key, jnp.zeros((1, n_track_pad, n_frames, scfg.object_token_dim)),
        lang_b)

    @jax.jit
    def sel_fwd(v, obj, lng, track_mask):
        score_map, _ = sel_model.apply(
            v, obj, lng, track_mask=track_mask,
            frame_lengths=jnp.full((1,), n_frames, jnp.int32),
            lang_mask=lang_mask)
        return score_map

    W_pad = ((W + 7) // 8) * 8

    @jax.jit
    def jf_packed(pred_packed, gt_packed):
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        def unpack(p):
            bits = (p[..., None] >> shifts) & 1
            return bits.reshape(p.shape[0], H, W_pad)
        from sola_tpu.core import mask_ops
        return mask_ops.compute_JF(unpack(pred_packed), unpack(gt_packed))

    # pinned prompt workload + GT (content deterministic; see docstring)
    prompt_masks = []
    for i in range(n_prompts):
        m = np.zeros((H, W), np.uint8)
        y = 30 + (i * 83) % max(H - 140, 1)
        x = 40 + (i * 197) % max(W - 220, 1)
        m[y:y + 100, x:x + 160] = 1
        prompt_masks.append(m)
    gt = np.broadcast_to(np.maximum(prompt_masks[0], prompt_masks[1]),
                         (n_frames, H, W))

    def pack(masklet):
        padded = np.zeros((masklet.shape[0], H, W_pad), np.uint8)
        padded[:, :, :W] = masklet
        return np.packbits(padded.reshape(masklet.shape[0], -1),
                           axis=-1).reshape(masklet.shape[0], H, W_pad // 8)

    def one_video() -> dict:
        t0 = time.perf_counter()
        # stage 1: grid prompts (AMG on every bin_size-th frame)
        sel_frames = list(range(0, n_frames, bin_size))
        for _ in amg.generate_many(frames[fi] for fi in sel_frames):
            pass
        t1 = time.perf_counter()
        # stage 2: upload + encode + propagate + tokens + dedup
        state = pred.init_state(frames)
        prompts = [engine.PromptMask(prompt_id=i, frame_idx=0,
                                     segmentation=m)
                   for i, m in enumerate(prompt_masks)]
        results: list = []
        engine.generate_tracks(
            pred, state, prompts, n_frames=n_frames, batch_size=8,
            miou_thresh=2.0, n_max_tracks=64, on_track=results.append)
        t2 = time.perf_counter()
        # stage 3: selection forward + merged-masklet J&F vs GT
        toks = np.zeros((1, n_track_pad, n_frames, scfg.object_token_dim),
                        np.float32)
        for i, r in enumerate(results[:n_track_pad]):
            # production SAM2 obj_ptr dim == selection object_token_dim
            # (256); the tiny_test smoke config is narrower — zero-pad
            d = min(r.tokens.shape[-1], scfg.object_token_dim)
            toks[0, i, :, :d] = r.tokens[:, :d]
        tmask = np.zeros((1, n_track_pad), bool)
        tmask[0, :len(results)] = True
        scores = np.asarray(sel_fwd(sel_vars, jnp.asarray(toks), lang_b,
                                    jnp.asarray(tmask)))[0]
        order = np.argsort(scores[:len(results)])[::-1][:2]
        merged = np.maximum(results[int(order[0])].masklet,
                            results[int(order[1])].masklet)
        j, f = jf_packed(jnp.asarray(pack(merged)), jnp.asarray(pack(gt)))
        jf = (float(j) + float(f)) / 2.0
        t3 = time.perf_counter()
        return {"total": t3 - t0, "amg": t1 - t0, "trackgen": t2 - t1,
                "selection_eval": t3 - t2, "n_tracks": len(results),
                "jf": jf}

    one_video()  # warmup: compiles (programs shared with the trackgen
    #              section where shapes coincide)
    runs = [one_video() for _ in range(repeats)]
    best = min(runs, key=lambda r: r["total"])
    n_tracked = best["n_tracks"]
    a100_s = (len(range(0, n_frames, bin_size)) * A100_AMG_S_PER_FRAME
              + 2.0 * n_frames * n_tracked / A100_PROPAGATION_OBJECT_FPS)
    return {
        "e2e_videos_per_s": round(1.0 / best["total"], 4),
        "e2e_s_per_video": round(best["total"], 2),
        "e2e_amg_s": round(best["amg"], 2),
        "e2e_trackgen_s": round(best["trackgen"], 2),
        "e2e_selection_eval_s": round(best["selection_eval"], 2),
        "e2e_n_tracks": n_tracked,
        "e2e_frames": n_frames,
        "e2e_a100_s_composed": round(a100_s, 1),
        "e2e_vs_a100": round(a100_s / best["total"], 2),
    }


def bench_gdino(n_images: int = 3) -> dict:
    """GroundingDINO prompt stage (prompt_generator.py:132-140 hot path):
    steady-state seconds per image at the full SwinT/6+6/900-query model on
    the 800/1333 canvas (random weights; compute shape == production).

    Baseline: upstream GroundingDINO-SwinT inference is commonly reported at
    ~8-12 images/s on an A100 (~0.1 s/image); the prompt stage runs once per
    (video, expression) so it is latency- not throughput-critical.
    """
    from sola_tpu.trackgen.gdino.convert import build_gdino_from_checkpoint
    from sola_tpu.trackgen.gdino.model import GroundingModel

    import jax.numpy as jnp

    model, variables, _ = build_gdino_from_checkpoint(None)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
            for _ in range(n_images)]

    def run(gm):
        gm.get_boxes(imgs[0], "a red object in the scene.")  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for img in imgs:
                gm.get_boxes(img, "a red object in the scene.")
            best = min(best, (time.perf_counter() - t0) / n_images)
        return best

    def run_batched(gm, n_expr=8):
        # production pattern: all expressions of a frame in one forward,
        # frames pipelined (every image's programs enqueue before any
        # result is fetched — prompts_gdino's one-frame lookahead at depth
        # n_images)
        texts = [f"object number {i} in the scene." for i in range(n_expr)]
        gm.get_boxes_many(imgs[0], texts)  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pend = [gm.enqueue_boxes(img, texts) for img in imgs]
            for p in pend:
                gm.harvest_boxes(p)
            best = min(best, (time.perf_counter() - t0)
                       / (n_images * n_expr))
        return best

    # fp32 = upstream parity (the reference runs GDINO without autocast);
    # bf16 = the TPU production mode (prompts_gdino --bf16); batched =
    # all of a frame's expressions in one forward (one Swin trunk, the
    # text-fused stack batched) — the unit comparable to the reference's
    # per-(frame, expression) forward is s/expression
    best = run(GroundingModel(model, variables))
    out = {"gdino_s_per_image": round(best, 3),
           "gdino_vs_a100_0p1s": round(0.1 / best, 2)}
    _partial(out)
    try:
        gm16 = GroundingModel(model, variables, compute_dtype=jnp.bfloat16)
        best16 = run(gm16)
        out["gdino_bf16_s_per_image"] = round(best16, 3)
        b8 = run_batched(gm16)
        out["gdino_bf16_batched8_s_per_expr"] = round(b8, 3)
        out["gdino_batched_vs_a100_0p1s"] = round(0.1 / b8, 2)
    except Exception as e:
        out["gdino_bf16_error"] = f"{type(e).__name__}: {e}"
    return out


def bench_roberta(n_batches: int = 4, batch: int = 8) -> dict:
    """Full-size RoBERTa-large text encode (train.py:80-91 / evaluator.py:
    84-95): ms per expression through the 24-layer/1024-d Flax encoder at
    random weights (the zero-egress stand-in for the real checkpoint; same
    compute shape). The production loop caches embeddings per expression
    (models/text.py CachingTextEncoder), so this cost is paid once per
    expression per run — the reference re-pays it every batch every epoch.
    """
    import jax

    from sola_tpu.models.text import RobertaConfig, TextEncoder

    enc = TextEncoder.random_init(RobertaConfig.large())
    texts = [f"the {w} object moving across the frame number {i}"
             for i, w in enumerate(["red", "blue", "small", "large",
                                    "fast", "slow", "left", "right"])]
    h, _, _ = enc.encode_batch(texts[:batch])  # compile
    jax.block_until_ready(h)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_batches):
            h, _, p = enc.encode_batch(texts[:batch])
        float(np.asarray(p).sum())  # value fetch closes the timing window
        best = min(best, (time.perf_counter() - t0) / (n_batches * batch))
    return {"roberta_ms_per_expression": round(best * 1000, 2),
            "roberta_config": "large-24L-1024d"}


class _SectionTimeout(Exception):
    pass


def _with_timeout(fn, seconds: int):
    """Bound one bench section: the remote-relay backend can stall a
    request indefinitely (observed); a hung section must cost minutes,
    not the whole benchmark."""
    import signal

    def handler(signum, frame):
        raise _SectionTimeout(f"section exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _probe_backend(budget_s: Optional[int] = None,
                   attempts: Optional[int] = None,
                   window_s: Optional[int] = None) -> Optional[str]:
    """Fail fast when the device backend is unreachable (the tunneled
    relay can die mid-session; without this every section would burn its
    full timeout before the error surfaced). Probes in a SUBPROCESS —
    a dead relay can hang the first device op inside native code, where
    SIGALRM never fires. Returns an error string or None. The tiny
    matmul compiles in seconds even through the relay.

    Retries: a relay that is alive but mid-reconnect can leave one probe
    hanging, and a single false negative zeroes the whole bench — round 3
    lost its ENTIRE perf record to a relay outage that outlasted 3x300 s
    of probing. So the probe keeps retrying until a WALL-CLOCK WINDOW
    expires (default 3600 s, SOLA_PROBE_WINDOW), not a fixed attempt
    count: a relay that comes back any time inside the window still
    yields a full record. ``attempts`` (or SOLA_PROBE_ATTEMPTS) caps the
    attempt count when set — the mid-bench cheap-recheck path uses
    attempts=1. Per-attempt patience: SOLA_PROBE_BUDGET (default 300 s)."""
    import subprocess

    budget_s = budget_s or int(os.environ.get("SOLA_PROBE_BUDGET", "300"))
    env_attempts = os.environ.get("SOLA_PROBE_ATTEMPTS")
    if attempts is None and env_attempts is not None:
        attempts = int(env_attempts)
    window_s = window_s if window_s is not None else int(
        os.environ.get("SOLA_PROBE_WINDOW", "3600"))
    code = ("import jax.numpy as jnp\n"
            "x = jnp.ones((128, 128), jnp.float32)\n"
            "print('probe-ok', float(jnp.sum(x @ x)))\n")
    last = "no probe attempts configured"
    t_start = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  timeout=budget_s)
        except subprocess.TimeoutExpired:
            last = (f"device probe timed out after {budget_s}s "
                    f"(attempt {attempt}, "
                    f"{int(time.monotonic() - t_start)}s elapsed)")
            proc = None
        if proc is not None:
            if proc.returncode == 0 and "probe-ok" in proc.stdout:
                return None
            last = (f"device probe failed (attempt {attempt}): "
                    f"{proc.stderr.strip()[-500:]}")
        if attempts is not None and attempt >= max(attempts, 1):
            return last
        if time.monotonic() - t_start >= window_s:
            return last
        time.sleep(min(30, budget_s))  # breathe between attempts


# (name, budget_s) in PRIORITY order. trackgen FIRST: it produces the
# headline metric, and its programs are the ones most likely to need a
# cold recompile (10-25 min each through the relay) — if an external
# watchdog cuts the run short, the headline must already be in hand.
# Budgets are per-section kill caps (sized for one worst-case cold
# compile); the TOTAL wall clock is planned separately against
# SOLA_BENCH_TOTAL_BUDGET (see _effective_budget).
SECTIONS = [("trackgen", 4500), ("e2e", 1800), ("selection", 1200),
            ("train", 1200), ("loader", 1500), ("roberta", 900),
            ("gdino", 2400), ("packed", 1500), ("longvideo", 3600)]

# minimum seconds a WARM section needs to produce metrics: with less than
# this left on the total-budget clock the section is SKIPPED and recorded
# as skipped (a deliberate gap in the record beats a killed child)
SECTION_MIN_S = {"trackgen": 420, "e2e": 300, "selection": 90,
                 "train": 120, "loader": 240, "roberta": 60,
                 "gdino": 240, "packed": 300, "longvideo": 420}

FINAL_RESERVE_S = 30        # clock held back for the final record print
TRACKGEN_BUDGET_FRAC = 0.55  # hard slice: the headline section may not
#                              eat more than this share of the total
#                              budget even when cold


def _section_enabled(name: str, only: Optional[set]) -> bool:
    if only is not None:
        return name in only
    if name == "trackgen":
        return os.environ.get("SOLA_BENCH_SKIP_TRACKGEN") != "1"
    if name == "packed":
        return os.environ.get("SOLA_BENCH_SKIP_PACKED") != "1"
    if name == "longvideo":
        return os.environ.get("SOLA_BENCH_SKIP_LONGVIDEO") != "1"
    return True


def _effective_budget(name: str, budget: int, deadline: Optional[float],
                      total_budget: Optional[int]) -> Optional[int]:
    """Seconds this section may run NOW: its static cap, bounded by the
    remaining total-budget clock (and, for trackgen, by its hard slice).
    Returns None when the remaining clock is below the section's warm
    minimum — the caller records a skip instead of starting it."""
    if deadline is None:
        return budget
    remaining = int(deadline - time.monotonic() - FINAL_RESERVE_S)
    if remaining < SECTION_MIN_S.get(name, 120):
        return None
    eff = min(budget, remaining)
    if name == "trackgen" and total_budget:
        eff = min(eff, max(int(total_budget * TRACKGEN_BUDGET_FRAC),
                           SECTION_MIN_S["trackgen"]))
    return eff


def _run_sections_inprocess(only: Optional[set],
                            emit=None) -> tuple:
    """Run the selected sections in THIS process (the child path of the
    subprocess driver below, and the SOLA_BENCH_ONLY debugging path).
    No total-budget planning here: children are bounded by the parent's
    kill, and standalone SOLA_BENCH_ONLY runs (cache warming) must be
    allowed to sit through cold compiles."""
    metrics: dict = {}
    errors: dict = {}
    fns = {"trackgen": lambda: bench_trackgen(
               n_frames=int(os.environ.get("SOLA_BENCH_FRAMES", "32"))),
           "selection": bench_selection, "train": bench_train_step,
           "loader": bench_loader_train, "roberta": bench_roberta,
           "gdino": bench_gdino, "packed": bench_packed, "e2e": bench_e2e,
           "longvideo": lambda: bench_longvideo(
               n_frames=int(os.environ.get("SOLA_BENCH_LONGVIDEO_FRAMES",
                                           "256")))}
    for name, budget in SECTIONS:
        if not _section_enabled(name, only):
            continue
        try:
            metrics.update(_with_timeout(fns[name], budget))
        except Exception as e:  # report partial results, never crash
            errors[name] = f"{type(e).__name__}: {e}"
        if emit is not None:
            emit(metrics, errors)
    return metrics, errors


def _last_json_line(text: Optional[str]) -> Optional[dict]:
    if not text:
        return None
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    line = next((ln for ln in reversed(text.splitlines())
                 if ln.startswith("{")), None)
    try:
        return json.loads(line) if line else None
    except json.JSONDecodeError:
        return None


def _run_sections_subprocess(only: Optional[set],
                             cmd: Optional[list] = None,
                             emit=None,
                             deadline: Optional[float] = None,
                             total_budget: Optional[int] = None) -> tuple:
    """Run each section as `python bench.py` with SOLA_BENCH_ONLY=<name>,
    hard-killed on budget overrun. The in-process _with_timeout rests on
    SIGALRM, which never fires while a device op is stuck inside native
    code — and the tunneled relay dying mid-bench does exactly that. A
    subprocess can always be killed, so one dead section (or a relay
    flap) costs its budget, not the whole bench. The persistent compile
    cache makes the per-section re-import cheap (~30 s). ``cmd`` overrides
    the child argv (tests substitute a stub).

    ``emit(metrics, errors)`` is called after every section (completed,
    failed, or skipped) so the caller can print a cumulative record line;
    ``deadline``/``total_budget`` plan sections inside the total
    wall-clock budget (see _effective_budget)."""
    import subprocess

    metrics: dict = {}
    errors: dict = {}

    def clock_left() -> float:
        return (float("inf") if deadline is None
                else deadline - time.monotonic() - FINAL_RESERVE_S)

    def relay_state(section: str) -> str:
        """After a section hit a dead backend, classify the outage:
        'alive' — quick probe passes: the relay is fine NOW (for a child
        that REPORTED a backend error, its own fail-fast probe may have
        caught a transient flap, so the section deserves one retry; for
        a child the PARENT had to kill, an alive relay means the section
        deterministically overran its budget — retrying would burn
        another full budget on the same outcome). 'recovered' — the
        quick probe failed but a patient re-probe window succeeded: the
        outage killed the section, retry it once and keep going (round-3
        lesson: never trade the whole record for one outage). 'dead' —
        still unreachable after the window: record and stop."""
        if _probe_backend(attempts=1) is None:
            return "alive"
        window = int(os.environ.get("SOLA_PROBE_REPROBE_WINDOW", "1800"))
        if deadline is not None:
            window = max(min(window, int(clock_left())), 60)
        return ("recovered" if _probe_backend(window_s=window) is None
                else "dead")

    queue = [(name, budget, 0) for name, budget in SECTIONS
             if _section_enabled(name, only)]
    while queue:
        name, budget, tries = queue.pop(0)
        eff = _effective_budget(name, budget, deadline, total_budget)
        if eff is None:
            errors[name] = (f"skipped: {int(max(clock_left(), 0))}s left "
                            f"of the total budget < section minimum "
                            f"{SECTION_MIN_S.get(name, 120)}s")
            if emit is not None:
                emit(metrics, errors)
            continue
        env = dict(os.environ, SOLA_BENCH_ONLY=name,
                   # parent already probed with full patience; children
                   # fail fast so a mid-bench relay death is cheap
                   SOLA_PROBE_ATTEMPTS="1")
        timed_out = False
        payload = None
        try:
            proc = subprocess.run(
                cmd or [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, env=env,
                timeout=eff + 180)
            payload = _last_json_line(proc.stdout)
        except subprocess.TimeoutExpired as exc:
            timed_out = True
            errors[name] = f"section killed after {eff + 180}s"
            # salvage the child's last partial-metrics line: a section
            # that died 80% done still contributes what it measured
            payload = _last_json_line(exc.stdout)
            proc = None
        backend_dead = timed_out
        if payload is None and proc is not None:
            errors[name] = (f"no JSON from section "
                            f"(rc={proc.returncode}):"
                            f" {proc.stderr.strip()[-300:]}")
            if emit is not None:
                emit(metrics, errors)
            continue
        if payload is not None:
            metrics.update(payload.get("metrics", {}))
            child_errors = payload.get("errors", {})
            for key, msg in child_errors.items():
                errors[key if key != "backend" else name] = msg
            backend_dead = backend_dead or "backend" in child_errors
        if backend_dead:
            state = relay_state(name)
            if state == "dead":
                errors["backend"] = ("relay died mid-bench and did not "
                                     "recover within the re-probe window; "
                                     "remaining sections skipped")
                if emit is not None:
                    emit(metrics, errors)
                break
            errors.pop("backend", None)
            if state == "alive" and timed_out:
                # the child overran its budget with the relay alive the
                # whole time: deterministic overrun, keep the error and
                # the salvaged partials, do NOT burn another budget
                pass
            elif tries == 0 and clock_left() > SECTION_MIN_S.get(name, 120):
                # child-reported flap or relay recovery: the outage, not
                # the section, is the likelier culprit — retry once
                errors.pop(name, None)
                queue.insert(0, (name, budget, 1))
                continue
        if emit is not None:
            emit(metrics, errors)
    return metrics, errors


def _build_record(metrics: dict, errors: dict) -> dict:
    """The one-line JSON record schema — identical for every cumulative
    emission and the final print, so the LAST JSON line on stdout is
    always the newest complete record no matter when the process dies."""
    metrics = dict(metrics)
    if ("loader_train_pairs_per_s" in metrics
            and "selection_train_pairs_per_s" in metrics):
        # fraction of wall time the step sits idle waiting on input (approx:
        # resident-batch throughput as the compute-bound ceiling)
        ratio = (metrics["loader_train_pairs_per_s"]
                 / metrics["selection_train_pairs_per_s"])
        metrics["train_step_idle_frac"] = round(max(0.0, 1.0 - ratio), 3)

    if "sam2_propagation_object_fps" in metrics:
        value = metrics["sam2_propagation_object_fps"]
        out = {"metric": "sam2_propagation_object_fps", "value": value,
               "unit": "object-frames/s",
               "vs_baseline": round(value / A100_PROPAGATION_OBJECT_FPS, 2),
               "baseline_note": ("upstream SAM2-L propagation on A100: "
                                 "~17.5 object-frames/s (1 obj x 15-20fps)")}
    else:
        value = metrics.get("selection_forward_pairs_per_s")
        out = {"metric": "selection_forward_throughput_64trk_64frm",
               "value": value, "unit": "pairs/s", "vs_baseline": None,
               "baseline_note": ("no measured A100 reference for the "
                                 "selection stage; see MFU in metrics")}
    out["metrics"] = metrics
    if errors:
        out["errors"] = errors
    return out


def main() -> None:
    t_start = time.monotonic()
    total_budget = int(os.environ.get("SOLA_BENCH_TOTAL_BUDGET", "2400"))
    deadline = t_start + total_budget
    # initial probe patience is bounded by the total budget: burning the
    # whole run probing a dead relay yields the same empty record as not
    # probing at all, so cap at a quarter of the budget
    probe_window = min(int(os.environ.get("SOLA_PROBE_WINDOW", "3600")),
                       max(180, total_budget // 4))
    probe_err = _probe_backend(window_s=probe_window)
    if probe_err is not None:
        print(json.dumps({
            "metric": "sam2_propagation_object_fps", "value": None,
            "unit": "object-frames/s", "vs_baseline": None,
            "errors": {"backend": f"device backend unreachable: {probe_err}"},
            "metrics": {}}), flush=True)
        return

    def emit(metrics: dict, errors: dict) -> None:
        # a full cumulative record after EVERY section: an external kill
        # one second later still leaves this as the last JSON line
        print(json.dumps(_build_record(metrics, errors)), flush=True)

    only = os.environ.get("SOLA_BENCH_ONLY")  # comma list, e.g. "trackgen"
    only = set(only.split(",")) if only else None
    if only is not None or os.environ.get("SOLA_BENCH_INPROCESS") == "1":
        metrics, errors = _run_sections_inprocess(only, emit=emit)
    else:
        metrics, errors = _run_sections_subprocess(
            only, emit=emit, deadline=deadline, total_budget=total_budget)
    print(json.dumps(_build_record(metrics, errors)), flush=True)


if __name__ == "__main__":
    sys.exit(main())
