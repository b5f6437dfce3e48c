"""Train-step MFU ablation on chip (VERDICT r4 item 4).

The selection train step runs at MFU 0.331 vs 0.564 forward; the flash
kernel LOSES to dense at these tiny attention shapes (README), so the
lever is not a dropout-capable kernel — this script isolates what the
backward pass actually spends: dropout mask generation (threefry vs rbg),
per-submodule grad-norm reductions, the optimizer update, and batch size.

Each variant is one jitted fwd+bwd+AdamW step timed by the chained
state-carry method bench.py uses (value fetch closes the window).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_train.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sola_tpu.utils import compcache  # noqa: E402

compcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_BF16_PEAK_FLOPS = 197e12


def make_batch(batch, n_tracks, n_frames, n_words, cfg):
    rng = np.random.default_rng(0)
    return {
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


def time_step(step, tstate, batch_data, key, n_steps=24, iters=3):
    tstate, parts = step(tstate, batch_data, key)
    float(parts["total"])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            tstate, parts = step(tstate, batch_data, key)
        float(parts["total"])
        best = min(best, time.perf_counter() - t0)
    return best / n_steps, tstate


def mfu_of(step, tstate, batch_data, key, sec_per_step, batch):
    try:
        cost = step.lower(tstate, batch_data, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            return flops / sec_per_step / V5E_BF16_PEAK_FLOPS
    except Exception:
        pass
    return None


def main() -> None:
    from functools import partial

    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    from sola_tpu.train import state as state_lib
    from sola_tpu.train.loop import _make_train_step_body, make_train_step

    cfg = SelectionConfig()
    model = SelectionModel(cfg)
    optimizer = state_lib.make_optimizer(lr=5e-6, grad_clip_norm=1.0)
    train_cfg = {"positive_weight": 1.5, "alignment_weight": 0.3,
                 "temperature": 0.07}

    out = {}
    batch, n_tracks, n_frames, n_words = 8, 64, 64, 16
    batch_data = make_batch(batch, n_tracks, n_frames, n_words, cfg)

    def report(name, step, key, b=batch, data=None):
        data = batch_data if data is None else data
        tstate = state_lib.create_train_state(cfg, optimizer)
        sec, _ = time_step(step, tstate, data, key)
        mfu = mfu_of(step, state_lib.create_train_state(cfg, optimizer),
                     data, key, sec, b)
        out[name] = {"pairs_per_s": round(b / sec, 1),
                     "ms_per_step": round(sec * 1e3, 2),
                     **({"mfu": round(mfu, 4)} if mfu else {})}
        print(json.dumps({name: out[name]}), flush=True)

    # 1. production step (threefry dropout rng)
    step = make_train_step(model, optimizer, train_cfg)
    report("baseline_b8", step, jax.random.PRNGKey(0))

    # 2. rbg PRNG: hardware-RNG dropout masks (threefry is many int ops)
    key_rbg = jax.random.key(0, impl="rbg")
    report("rbg_rng_b8", step, key_rbg)

    # 3. no dropout (deterministic forward inside the same recipe):
    #    isolates the full dropout cost (mask gen + apply + bwd masking)
    class _DetModel:
        """model.apply with deterministic=True regardless of caller."""
        def __init__(self, m):
            self._m = m

        def apply(self, *a, **kw):
            kw["deterministic"] = True
            kw.pop("rngs", None)
            return self._m.apply(*a, **kw)

    det_step = partial(jax.jit, donate_argnums=(0,))(
        _make_train_step_body(_DetModel(model), optimizer, train_cfg))
    report("no_dropout_b8", det_step, jax.random.PRNGKey(0))

    # 4. no grad-norm metric reductions
    import sola_tpu.train.state as st_mod
    orig = st_mod.grad_norm_dict
    try:
        st_mod.grad_norm_dict = lambda grads: {}
        nogn_step = make_train_step(model, optimizer, train_cfg)
        report("no_gradnorm_b8", nogn_step, jax.random.PRNGKey(0))
    finally:
        st_mod.grad_norm_dict = orig

    # 5. batch 16 (throughput scaling; r4 measured 743.6 pairs/s)
    data16 = make_batch(16, n_tracks, n_frames, n_words, cfg)
    report("baseline_b16", step, jax.random.PRNGKey(0), b=16, data=data16)
    report("rbg_rng_b16", step, key_rbg, b=16, data=data16)

    print(json.dumps({"profile_train": out}), flush=True)


if __name__ == "__main__":
    main()
