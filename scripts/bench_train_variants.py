"""Train-step throughput variants on the real chip (VERDICT round-1 item 6).

Measures the full train step (fwd+bwd+AdamW) at production shapes under:
  - fp32 + dense attention (the default path);
  - fp32 + Pallas fused attention (the flash kernel with custom_vjp);
  - bf16 compute (params + activations cast inside the loss, fp32 loss)
    with each attention path.

The selection model's attention shapes are tiny (t/8<=8 after the motion
encoder, n<=64 tracks, w<=48 words), so the flash kernel is expected to be
neutral-to-negative here — this script produces the measured number either
way. The kernel's real payoff is SAM2 memory attention (4096 x ~29k), which
is wired separately. Prints one JSON line.
"""

import json
import time

import numpy as np


def make_step(cfg, optimizer, compute_dtype, train_cfg):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from sola_tpu.models.selection import SelectionModel
    from sola_tpu.train import state as state_lib

    model = SelectionModel(cfg)
    positive_weight = float(train_cfg["positive_weight"])
    alignment_weight = float(train_cfg["alignment_weight"])
    temperature = float(train_cfg["temperature"])
    from sola_tpu.train import loss as loss_lib

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        def loss_fn(params):
            if compute_dtype != jnp.float32:
                cparams = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype)
                    if x.dtype == jnp.float32 else x, params)
                cbatch = {k: (v.astype(compute_dtype)
                              if hasattr(v, "dtype")
                              and v.dtype == jnp.float32 else v)
                          for k, v in batch.items()}
            else:
                cparams, cbatch = params, batch
            score_logits, score_tokens = model.apply(
                {"params": cparams, "buffers": state.buffers},
                cbatch["object_tokens"], cbatch["lang_tokens"],
                track_mask=cbatch["track_mask"],
                frame_lengths=cbatch["frame_lengths"],
                lang_mask=cbatch["lang_mask"],
                deterministic=False, rngs={"dropout": rng})
            score_logits = score_logits.astype(jnp.float32)
            score_tokens = score_tokens.astype(jnp.float32)
            neg_tokens = jnp.broadcast_to(
                params["negative_token"][None].astype(jnp.float32),
                (score_tokens.shape[0],) + params["negative_token"].shape)
            loss, parts = loss_lib.total_loss(
                score_logits, score_tokens, batch["labels"],
                batch["pos_tokens"], neg_tokens,
                temperature=temperature, positive_weight=positive_weight,
                alignment_weight=alignment_weight,
                track_mask=batch["track_mask"])
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), parts

    return train_step


def main(batch=8, n_tracks=64, n_frames=64, n_words=16, n_steps=24,
         iters=3):
    import jax
    import jax.numpy as jnp

    from sola_tpu.models.selection import SelectionConfig
    from sola_tpu.train import state as state_lib

    train_cfg = {"positive_weight": 1.5, "alignment_weight": 0.3,
                 "temperature": 0.07}
    rng = np.random.default_rng(0)
    results = {}
    # the round-5 kernel applies attention-prob dropout IN-kernel via a
    # counter-based hash (ops/flash_attention.py), so the production recipe
    # (SDPA dropout 0.1, tools/attention.py:12) is now measurable on the
    # pallas path too; *_rbg variants swap the threefry PRNG for the
    # hardware RngBitGenerator to price the dropout-bit generation itself
    for name, use_pallas, dtype_name, attn_p, rng_impl in [
            ("fp32_dense", False, "float32", 0.0, None),
            ("fp32_pallas", True, "float32", 0.0, None),
            ("bf16_dense", False, "bfloat16", 0.0, None),
            ("bf16_pallas", True, "bfloat16", 0.0, None),
            ("fp32_dense_drop", False, "float32", 0.1, None),
            ("fp32_pallas_kerneldrop", True, "float32", 0.1, None),
            ("fp32_dense_drop_rbg", False, "float32", 0.1, "rbg"),
            ("fp32_pallas_kerneldrop_rbg", True, "float32", 0.1, "rbg"),
            ("bf16_pallas_kerneldrop_rbg", True, "bfloat16", 0.1, "rbg")]:
        cfg = SelectionConfig(use_pallas_attention=use_pallas,
                              attn_dropout_p=attn_p)
        dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
        optimizer = state_lib.make_optimizer(lr=5e-6, grad_clip_norm=1.0)
        tstate = state_lib.create_train_state(cfg, optimizer)
        step = make_step(cfg, optimizer, dtype, train_cfg)
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
        key = (jax.random.PRNGKey(0) if rng_impl is None
               else jax.random.key(0, impl=rng_impl))
        try:
            tstate, parts = step(tstate, batch_data, key)
            float(parts["total"])  # value fetch: real completion barrier
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    tstate, parts = step(tstate, batch_data, key)
                # the loss fetch transitively waits the state-chained window
                # (block_until_ready can ack early through the relay)
                float(parts["total"])
                best = min(best, time.perf_counter() - t0)
            pairs_per_s = n_steps * batch / best
            results[name] = {
                "pairs_per_s": round(pairs_per_s, 2),
                "loss": round(float(parts["total"]), 4),
            }
            try:
                cost = step.lower(tstate, batch_data, key).compile(
                ).cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
                if flops > 0:
                    # v5e bf16 peak 197 TFLOP/s (same constant as
                    # bench.py V5E_BF16_PEAK_FLOPS)
                    results[name]["mfu_v5e_bf16peak"] = round(
                        (flops * pairs_per_s / batch) / 1.97e14, 4)
            except Exception:
                pass
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
