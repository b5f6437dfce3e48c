"""Isolate the deformable-attention core's cost at production shapes.

profile_gdino.py shows the 6-layer encoder at ~0.78 s of the 0.81 s
bf16 forward; each encoder layer's deformable self-attention samples
21760 queries x 8 heads x 4 levels x 4 points through XLA gathers
(deformable.py bilinear_sample). This times the core alone — and any
experimental variants — at exactly those shapes, so a kernel rewrite's
upside is measured before it is built.

Run on the TPU: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/probe_deformable.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sola_tpu.utils import compcache  # noqa: E402

compcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sola_tpu.trackgen.gdino import deformable  # noqa: E402

LEVELS = [(128, 128), (64, 64), (32, 32), (16, 16)]
B, HEADS, HEAD_DIM, POINTS = 1, 8, 32, 4
LQ = sum(h * w for h, w in LEVELS)  # 21760: encoder self-attn queries


def make_inputs(dtype=jnp.bfloat16, seed: int = 0, local: bool = False):
    """``local=True`` mimics the encoder's actual sampling pattern:
    reference points are each query's own normalized raster position
    (model.py get_encoder_reference_points semantics) plus offsets of up
    to +-8 cells of the sampled level — the banded structure the kernel's
    any-hit tile skip exploits. ``local=False`` is the adversarial
    uniform-random pattern (fully dense interpolation band)."""
    rng = np.random.default_rng(seed)
    values = [jnp.asarray(rng.standard_normal(
        (B, h, w, HEADS * HEAD_DIM), dtype=np.float32), dtype)
        for (h, w) in LEVELS]
    if local:
        refs = []
        for (h, w) in LEVELS:
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            refs.append(np.stack([(xx.ravel() + 0.5) / w,
                                  (yy.ravel() + 0.5) / h], axis=-1))
        ref = np.concatenate(refs, axis=0)  # (LQ, 2) normalized
        loc = np.empty((B, LQ, HEADS, len(LEVELS), POINTS, 2), np.float32)
        for lvl, (h, w) in enumerate(LEVELS):
            cells = rng.uniform(-8, 8, (B, LQ, HEADS, POINTS, 2))
            loc[:, :, :, lvl] = (ref[None, :, None, None]
                                 + cells / np.asarray([w, h], np.float32))
        loc = jnp.asarray(loc)
    else:
        loc = jnp.asarray(rng.random(
            (B, LQ, HEADS, len(LEVELS), POINTS, 2), dtype=np.float32))
    wgt = rng.random((B, LQ, HEADS, len(LEVELS), POINTS),
                     dtype=np.float32)
    wgt = jnp.asarray(wgt / wgt.sum(axis=(-1, -2), keepdims=True))
    return values, loc, wgt


def timed(fn, *args, repeats=5):
    # value fetch, not block_until_ready: through the tunneled relay the
    # ready-ack can arrive before execution completes (see bench.py)
    out = fn(*args)
    float(out.astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out.astype(jnp.float32).sum())
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> int:
    values, loc, wgt = make_inputs()
    core = jax.jit(lambda v, l, w: deformable.ms_deform_attn_core(
        list(v), l, w))
    t_core, ref = timed(core, tuple(values), loc, wgt)
    out = {"core_gather_s": round(t_core, 4),
           "lq": LQ, "heads": HEADS, "points": POINTS}

    from sola_tpu.ops import deformable_interp

    fn = jax.jit(lambda v, l, w: deformable_interp.ms_deform_attn_core_pallas(
        list(v), l, w, interpret=False))
    t_v, got = timed(fn, tuple(values), loc, wgt)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    out.update({"pallas_dense_s": round(t_v, 4),
                "pallas_vs_gather_maxdiff": round(err, 5),
                "pallas_dense_speedup": round(t_core / t_v, 2)})

    # production-like banded pattern (encoder reference points + <=8-cell
    # offsets): the tile-sparse skip's home turf
    values_l, loc_l, wgt_l = make_inputs(local=True)
    t_g, ref_l = timed(core, tuple(values_l), loc_l, wgt_l)
    t_p, got_l = timed(fn, tuple(values_l), loc_l, wgt_l)
    err_l = float(jnp.max(jnp.abs(
        got_l.astype(jnp.float32) - ref_l.astype(jnp.float32))))
    out.update({"gather_local_s": round(t_g, 4),
                "pallas_local_s": round(t_p, 4),
                "pallas_local_maxdiff": round(err_l, 5),
                "pallas_local_speedup": round(t_g / t_p, 2)})

    # block-size sweep on the banded pattern: SOLA_DEFORM_{QBLK,HWBLK} are
    # trace-time constants, so each variant builds a fresh jit
    import os
    sweep = {}
    # guards=1 re-enables the per-head/per-term predication (v2 mode) so
    # its cost is measured against the dense-sweep default on the same
    # banded pattern
    for q_blk, hw_blk, guards in (
            (256, 512, 0), (256, 512, 1), (256, 256, 0), (128, 256, 0),
            (128, 128, 0), (256, 128, 0), (512, 256, 0), (128, 256, 1)):
        os.environ["SOLA_DEFORM_QBLK"] = str(q_blk)
        os.environ["SOLA_DEFORM_HWBLK"] = str(hw_blk)
        os.environ["SOLA_DEFORM_GUARDS"] = str(guards)
        tag = f"q{q_blk}_hw{hw_blk}_g{guards}"
        fn_v = jax.jit(
            lambda v, l, w: deformable_interp.ms_deform_attn_core_pallas(
                list(v), l, w, interpret=False))
        try:
            t_var, got_v = timed(fn_v, tuple(values_l), loc_l, wgt_l)
            err_v = float(jnp.max(jnp.abs(
                got_v.astype(jnp.float32) - ref_l.astype(jnp.float32))))
            sweep[tag] = {"s": round(t_var, 4), "maxdiff": round(err_v, 5)}
        except Exception as e:
            sweep[tag] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(json.dumps({tag: sweep[tag]}), flush=True)
    os.environ.pop("SOLA_DEFORM_QBLK", None)
    os.environ.pop("SOLA_DEFORM_HWBLK", None)
    os.environ.pop("SOLA_DEFORM_GUARDS", None)
    out["block_sweep_local"] = sweep
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
