"""Hiera-L frame-encode stage ablation (run on TPU).

The driver bench reports sam2_encode_compute_fps ~17.6 (57 ms/frame at
1024px bf16) — roughly 20% of what the raw matmul FLOPs support on a v5e.
This script localizes the gap: it times the full encoder, the trunk
without the FPN neck, stage-truncated trunks (per-stage deltas), a
global-attention-free stage 3, and (optionally, --inline) the trunk with
block runs inlined instead of nn.scan'd, and prints achieved TFLOP/s from
XLA's own cost analysis.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_encode.py [--batch 4] [--inline]
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.utils import compcache

compcache.enable()


def _sync(out):
    # value fetch, not block_until_ready: through the tunneled relay the
    # ready-ack can arrive before execution completes (see bench.py) —
    # summing to a scalar and fetching it forces real completion
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[-1].astype(jnp.float32)))


def _time(fn, *args, warmup=2, reps=5):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _flops(fn, *args):
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4,
                    help="frames per encode program (production "
                         "encode_chunk)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--inline", action="store_true",
                    help="also time scan_runs=False (heavy compile)")
    args = ap.parse_args()

    from sola_tpu.trackgen.sam2.hiera import Hiera, HieraConfig
    from sola_tpu.trackgen.sam2.image_encoder import (FpnNeck,
                                                      ImageEncoder,
                                                      ImageEncoderConfig)

    b, s = args.batch, args.size
    x32 = jnp.zeros((b, s, s, 3), jnp.float32)
    x = x32.astype(jnp.bfloat16)
    print(f"input {x.shape} bf16; timings are s/frame (batch {b})")

    def bench_trunk(name, cfg, scan_runs=True):
        model = Hiera(cfg, scan_runs=scan_runs)
        v = model.init(jax.random.PRNGKey(0), x32)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, v)
        fn = jax.jit(lambda v_, x_: model.apply(v_, x_))
        t = _time(fn, v, x)
        fl = _flops(lambda x_: model.apply(v, x_), x)
        tb = fl / t / 1e12 if fl else 0.0
        print(f"{name:34s} {t / b * 1e3:8.2f} ms/frame"
              f"   {tb:6.1f} TFLOP/s" if fl else
              f"{name:34s} {t / b * 1e3:8.2f} ms/frame")
        return t

    large = HieraConfig.large()

    # full encoder (trunk + neck): the production encode_image body
    enc_cfg = ImageEncoderConfig()
    enc = ImageEncoder(enc_cfg)
    ev = enc.init(jax.random.PRNGKey(0), x32)
    ev = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, ev)
    efn = jax.jit(lambda v_, x_: enc.apply(v_, x_))
    t_full = _time(efn, ev, x)
    print(f"{'encoder (trunk + neck)':34s} {t_full / b * 1e3:8.2f} "
          "ms/frame")

    t_trunk = bench_trunk("trunk (production, scanned runs)", large)
    print(f"{'  -> neck cost':34s} {(t_full - t_trunk) / b * 1e3:8.2f} "
          "ms/frame")

    # per-stage deltas via truncated configs
    prev = 0.0
    for n_stage in range(1, 5):
        cfg = dataclasses.replace(
            large, stages=large.stages[:n_stage],
            global_att_blocks=tuple(
                g for g in large.global_att_blocks
                if g < sum(large.stages[:n_stage])))
        t = bench_trunk(f"trunk stages 1..{n_stage}", cfg)
        if n_stage > 1:
            print(f"{'  -> stage ' + str(n_stage) + ' delta':34s} "
                  f"{(t - prev) / b * 1e3:8.2f} ms/frame")
        prev = t

    # how much do the 3 global-attention blocks cost?
    bench_trunk("trunk, global attn -> windowed",
                dataclasses.replace(large, global_att_blocks=()))

    if args.inline:
        bench_trunk("trunk, runs inlined (no nn.scan)", large,
                    scan_runs=False)


if __name__ == "__main__":
    main()
