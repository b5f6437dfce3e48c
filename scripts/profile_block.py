"""Hiera block micro-ablation (run on TPU).

profile_encode.py showed the trunk at ~53 ms/frame real compute (batch 4,
1024px, bf16; the relay adds ~30 ms fixed dispatch+fetch latency per call,
which stage DELTAS cancel) with stage deltas ~9 / 9.5 / 32 / 2.9 ms.
Single-op timings through the relay are useless — the fixed latency
swamps them — so every ablation here runs INSIDE one program, iterated
``--iters`` times under lax.scan with a carried tensor, and the per-op
cost is the slope (t(iters) - t(1)) / (iters - 1): both the relay latency
and the scan's own entry cost cancel.

Measures, per stage config: the full MultiScaleBlock, 2x LayerNorm, the
qkv+proj dense pair, the windowed-attention core (partition + sdpa +
unpartition), sdpa alone, the window-partition round-trip, the MLP, and
exact gelu on the hidden tensor.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_block.py [--batch 4] [--iters 16]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.utils import compcache

compcache.enable()


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[-1].astype(jnp.float32)))


def _time_call(fn, *args, warmup=2, reps=5):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _scanned(step, n):
    """step: carry -> carry, iterated n times under lax.scan."""
    def run(carry):
        out, _ = jax.lax.scan(lambda c, _: (step(c), None), carry,
                              None, length=n)
        return out
    return jax.jit(run)


def _slope(step, carry, iters):
    t1 = _time_call(_scanned(step, 1), carry)
    tn = _time_call(_scanned(step, iters), carry)
    return max(tn - t1, 0.0) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    b, iters = args.batch, args.iters

    from flax import linen as nn

    from sola_tpu.trackgen.sam2.common import (sdpa, window_partition,
                                               window_unpartition)
    from sola_tpu.trackgen.sam2.hiera import MultiScaleBlock

    # (name, dim, heads, window, hw, n_blocks_in_stage)
    stages = [("stage1", 144, 2, 8, 256, 2),
              ("stage2", 288, 4, 4, 128, 6),
              ("stage3", 576, 8, 16, 64, 36),
              ("stage4", 1152, 16, 8, 32, 4)]

    for name, dim, heads, window, hw, n_blocks in stages:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, dim),
                              jnp.bfloat16)
        print(f"== {name}: dim {dim}, heads {heads}, window {window}, "
              f"map {hw}x{hw}, x{n_blocks} blocks ==", flush=True)

        blk = MultiScaleBlock(dim=dim, dim_out=dim, num_heads=heads,
                              window_size=window)
        v = blk.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)

        rows = [("full block", _slope(lambda c: blk.apply(v, c), x, iters))]

        ln = nn.LayerNorm()
        lv = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            ln.init(jax.random.PRNGKey(0), x))
        rows.append(("2x layernorm",
                     _slope(lambda c: ln.apply(lv, ln.apply(lv, c)), x,
                            iters)))

        dq = nn.Dense(3 * dim)
        dp = nn.Dense(dim)
        qv = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            dq.init(jax.random.PRNGKey(0), x))
        pv = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            dp.init(jax.random.PRNGKey(1), x))
        rows.append(("qkv+proj dense",
                     _slope(lambda c: dp.apply(
                         pv, dq.apply(qv, c)[..., :dim]), x, iters)))

        head_dim = dim // heads

        def attn_core(c):
            xw, pad_hw = window_partition(c, window)
            nw = xw.shape[0]
            toks = window * window
            qkv = jnp.concatenate([xw, xw, xw], axis=-1)
            qkv = qkv.reshape(nw, toks, 3, heads, head_dim)
            q, k, vv = (qkv[:, :, i].transpose(0, 2, 1, 3)
                        for i in range(3))
            o = sdpa(q, k, vv)
            o = o.transpose(0, 2, 1, 3).reshape(nw, window, window, dim)
            return window_unpartition(o, window, pad_hw, (hw, hw))
        rows.append(("win-part + sdpa + unpart", _slope(attn_core, x, iters)))

        nw = b * (hw // window) ** 2
        toks = window * window
        q = jax.random.normal(jax.random.PRNGKey(1),
                              (nw, heads, toks, head_dim), jnp.bfloat16)
        rows.append(("sdpa alone",
                     _slope(lambda c: sdpa(c, c, c), q, iters)))

        def part_rt(c):
            xw, pad_hw = window_partition(c, window)
            # the +1 keeps XLA's simplifier from cancelling the round trip
            return window_unpartition(xw + 1.0, window, pad_hw, (hw, hw))
        rows.append(("win partition round-trip", _slope(part_rt, x, iters)))

        d0 = nn.Dense(4 * dim)
        d1 = nn.Dense(dim)
        v0 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            d0.init(jax.random.PRNGKey(0), x))
        xh = jax.random.normal(jax.random.PRNGKey(2), (b, hw, hw, 4 * dim),
                               jnp.bfloat16)
        v1 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            d1.init(jax.random.PRNGKey(1), xh))

        def mlp(c):
            y = d0.apply(v0, c)
            y = jax.nn.gelu(y, approximate=False)
            return d1.apply(v1, y)
        rows.append(("mlp (incl. exact gelu)", _slope(mlp, x, iters)))

        rows.append(("exact gelu on hidden",
                     _slope(lambda c: jax.nn.gelu(c, approximate=False),
                            xh, iters)))

        for label, t in rows:
            per_frame = t / b * 1e3
            print(f"  {label:28s} {per_frame:8.3f} ms/frame"
                  f"   (x{n_blocks}: {per_frame * n_blocks:7.2f})",
                  flush=True)


if __name__ == "__main__":
    main()
