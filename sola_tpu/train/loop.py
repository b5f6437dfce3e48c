"""Training loop: jitted steps + host epoch orchestration.

Reproduces the reference training recipe (train.py:23-246): frozen text
encoder, labels = (metric > positive_threshold), weighted BCE + 0.3x
alignment loss, AdamW with global-norm clip at 1.0, per-epoch validation with
acc/P/R/F1 confusion counts, ``log.txt`` epoch lines in the same format,
ReduceLROnPlateau on the validation loss, a checkpoint every epoch.

TPU design: one jit program per (n_bucket, t_bucket) shape; batches hold many
(video, expression) pairs (mask-padded); the text encoder runs as its own jit
program feeding lang/pos tokens; metrics come back as device scalars fetched
once per step.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sola_tpu.config import finalize_train_configs
from sola_tpu.data.dataset import get_loader_dict
from sola_tpu.models.selection import SelectionConfig, SelectionModel
from sola_tpu.models.text import build_text_encoder
from sola_tpu.train import loss as loss_lib
from sola_tpu.train import state as state_lib
from sola_tpu.train.schedule import ReduceLROnPlateau


def _stack_if_rows(x):
    """Per-sample device-row tuples (token/lang caches) stack INSIDE the
    compiled program — no extra dispatch, no host copy."""
    if isinstance(x, (tuple, list)):
        return jnp.stack(x, axis=0)
    return x


def _make_train_step_body(model: SelectionModel, optimizer,
                          train_cfg: dict):
    """Un-jitted single optimizer step: (state, batch, rng) ->
    (state, metrics). Jitted directly by ``make_train_step``; scanned K
    times per dispatch by ``make_train_multi_step``."""
    positive_weight = float(train_cfg["positive_weight"])
    alignment_weight = float(train_cfg["alignment_weight"])
    temperature = float(train_cfg["temperature"])

    def train_step(state: state_lib.TrainState, batch: dict, rng: jax.Array):
        def loss_fn(params):
            obj = _stack_if_rows(batch["object_tokens"])
            score_logits, score_tokens = model.apply(
                {"params": params, "buffers": state.buffers},
                obj, _stack_if_rows(batch["lang_tokens"]),
                track_mask=batch["track_mask"],
                frame_lengths=batch["frame_lengths"],
                lang_mask=_stack_if_rows(batch["lang_mask"]),
                deterministic=False,
                rngs={"dropout": rng})
            neg_tokens = jnp.broadcast_to(
                params["negative_token"][None],
                (score_tokens.shape[0],) + params["negative_token"].shape)
            loss, parts = loss_lib.total_loss(
                score_logits, score_tokens, batch["labels"],
                _stack_if_rows(batch["pos_tokens"]), neg_tokens,
                temperature=temperature, positive_weight=positive_weight,
                alignment_weight=alignment_weight,
                track_mask=batch["track_mask"])
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        metrics = dict(parts)
        metrics.update(state_lib.grad_norm_dict(grads))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, metrics

    return train_step


def make_train_step(model: SelectionModel, optimizer, train_cfg: dict):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics)."""
    body = _make_train_step_body(model, optimizer, train_cfg)
    return partial(jax.jit, donate_argnums=(0,))(body)


def make_train_multi_step(model: SelectionModel, optimizer,
                          train_cfg: dict):
    """K sequential optimizer steps in ONE compiled program:
    multi_step(state, batches, rngs) -> (state, stacked metrics).

    ``batches`` is a tuple of K same-shaped batch dicts; they are stacked
    leaf-wise and scanned. Numerically identical to K separate
    ``train_step`` dispatches (same order, same rngs) — the win is
    dispatch amortization: through a high-latency host link (this
    sandbox's relay: ~100 ms/dispatch) the per-step overhead divides by K;
    on direct-attached TPU it shrinks the host gap between steps. The
    reference dispatches per batch_size=1 sample (train.py:93-146).
    """
    body = _make_train_step_body(model, optimizer, train_cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: state_lib.TrainState, batches: tuple,
                   rngs: jax.Array):
        xs = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves, axis=0), *batches)
        return jax.lax.scan(
            lambda st, inp: body(st, inp[0], inp[1]), state, (xs, rngs))

    return multi_step


def make_eval_step(model: SelectionModel, train_cfg: dict,
                   pred_threshold: float):
    """Returns jitted eval_step(params, buffers, batch) -> metrics dict.

    Loss parts follow the train-time definition (BCE on logits). The
    reference evaluator instead feeds sigmoided scores into BCE-with-logits
    (evaluator.py:101-111) — an inconsistency noted in SURVEY.md §2.5 that we
    deliberately normalize; selection decisions and J&F are unaffected.
    """
    positive_weight = float(train_cfg["positive_weight"])
    alignment_weight = float(train_cfg["alignment_weight"])
    temperature = float(train_cfg["temperature"])

    @jax.jit
    def eval_step(params, buffers, batch: dict):
        obj = _stack_if_rows(batch["object_tokens"])
        score_logits, score_tokens = model.apply(
            {"params": params, "buffers": buffers},
            obj, _stack_if_rows(batch["lang_tokens"]),
            track_mask=batch["track_mask"],
            frame_lengths=batch["frame_lengths"],
            lang_mask=_stack_if_rows(batch["lang_mask"]))
        neg_tokens = jnp.broadcast_to(
            params["negative_token"][None],
            (score_tokens.shape[0],) + params["negative_token"].shape)
        labels = batch.get("labels")
        out = {}
        if labels is not None:
            _, parts = loss_lib.total_loss(
                score_logits, score_tokens, labels,
                _stack_if_rows(batch["pos_tokens"]),
                neg_tokens, temperature=temperature,
                positive_weight=positive_weight,
                alignment_weight=alignment_weight,
                track_mask=batch["track_mask"])
            out.update(parts)
        scores = jax.nn.sigmoid(score_logits)
        preds = (scores > pred_threshold).astype(jnp.float32)
        out["pred_score"] = scores
        out["pred"] = preds
        if labels is not None:
            m = batch["track_mask"]
            out["tp"] = jnp.sum((preds == 1) & (labels == 1) & m)
            out["fp"] = jnp.sum((preds == 1) & (labels == 0) & m)
            out["fn"] = jnp.sum((preds == 0) & (labels == 1) & m)
            out["tn"] = jnp.sum((preds == 0) & (labels == 0) & m)
        return out

    return eval_step


def make_mesh_context(train_cfg: dict):
    """Multi-device training context: a (data, model) mesh + batch/state
    placement helpers, or None on a single device.

    The reference has no distributed training at all (one GPU,
    SURVEY.md §2.3); here any visible device count scales the same jitted
    step via jax.sharding — batch axis over 'data', optionally the wide
    layers tensor-parallel over 'model' (``train.n_model`` config).
    """
    n_dev = len(jax.devices())
    if n_dev <= 1:
        return None
    n_model = int(train_cfg.get("n_model", 1))
    if n_dev % max(n_model, 1) != 0:
        raise ValueError(f"n_model={n_model} must divide {n_dev} devices")

    from sola_tpu.parallel.mesh import (data_sharding, make_mesh,
                                        pad_batch_to, replicated)
    from sola_tpu.parallel.tp import shard_train_state

    mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model)
    n_data = mesh.devices.shape[0]

    class _Ctx:
        def place_state(self, tstate, optimizer):
            if n_model > 1:
                return shard_train_state(mesh, tstate, optimizer)
            return jax.device_put(tstate, replicated(mesh))

        def pad_raw(self, raw: dict) -> dict:
            b = len(raw["expression"])
            target = ((b + n_data - 1) // n_data) * n_data
            return pad_batch_to(raw, target) if target != b else raw

        def place_batch(self, batch: dict) -> dict:
            s = data_sharding(mesh)
            return {k: jax.device_put(v, s) for k, v in batch.items()}

        mesh_obj = mesh

    return _Ctx()


def prepare_batch(batch: dict, text_encoder, train_cfg: Optional[dict] = None,
                  token_cache=None, token_rows: bool = True):
    """Attach language tensors (and thresholded labels) to a collated batch.

    ``train_cfg["bf16_token_transfer"]``: send object tokens to the device
    as bfloat16 (half the host->device bytes; they upcast to fp32 inside
    the step via type promotion). The tokens come out of SAM2's bf16
    autocast compute anyway (generate_tokens_grid.py:84-88), so the wire
    precision matches their provenance. Off by default for bit-parity.

    ``token_cache``: a data.device_cache.DeviceTokenCache — batches then
    reuse device-resident token blocks (one upload per video, device-side
    stack per batch) instead of re-copying multi-MB arrays every step.
    """
    if token_rows and hasattr(text_encoder, "encode_rows"):
        # per-sample device rows (see CachingTextEncoder.encode_rows): the
        # steps stack them in-program; a cached batch ships zero lang bytes
        lang_tokens, lang_mask, pos_tokens = text_encoder.encode_rows(
            batch["expression"])
    else:
        lang_tokens, lang_mask, pos_tokens = text_encoder.encode_batch(
            batch["expression"])
    tok_dtype = (jnp.bfloat16 if train_cfg
                 and train_cfg.get("bf16_token_transfer") else jnp.float32)
    if token_cache is not None:
        # rows as a pytree: the steps stack them inside the compiled
        # program (no extra stack dispatch); mesh mode needs one stacked
        # array for data-axis sharding
        object_tokens = (token_cache.batch_tokens(batch) if not token_rows
                         else token_cache.batch_token_rows(batch))
    elif batch.get("object_tokens") is not None:
        object_tokens = jnp.asarray(batch["object_tokens"], tok_dtype)
    else:  # Loader(materialize_tokens=False) without a device cache
        object_tokens = jnp.stack(
            [jnp.asarray(r, tok_dtype)
             for r in batch["object_token_rows"]], axis=0)
    out = {
        "object_tokens": object_tokens,
        "track_mask": jnp.asarray(batch["track_mask"]),
        "frame_lengths": jnp.asarray(batch["frame_lengths"]),
        "lang_tokens": lang_tokens,
        "lang_mask": lang_mask,
        "pos_tokens": pos_tokens,
    }
    if batch.get("labels") is not None and train_cfg is not None:
        metric = train_cfg["positive_metric"]
        thresh = train_cfg["positive_threshold"]
        out["labels"] = jnp.asarray(
            (batch["labels"][metric] > thresh).astype(np.float32))
    return out


def train(configs: dict, max_steps_per_epoch: Optional[int] = None,
          text_encoder=None, log_fn=print,
          resume: bool = False) -> state_lib.TrainState:
    """Full training run (train.py:23-246).

    ``resume=True`` restores the newest ``epoch_N`` checkpoint from the
    output dir (params + optimizer + schedule) and continues — checkpointing
    the reference lacks (model-only .pth, SURVEY.md §5)."""
    configs = finalize_train_configs(configs)
    out_dir = configs["results"]["output_dir"]
    train_cfg = configs["train"]
    cfg = SelectionConfig.from_dict(configs["model"])
    model = SelectionModel(cfg)
    text_encoder = text_encoder or build_text_encoder(configs["model"])
    from sola_tpu.models.text import CachingTextEncoder
    if not isinstance(text_encoder, CachingTextEncoder):
        text_encoder = CachingTextEncoder(text_encoder)

    optimizer = state_lib.make_optimizer(
        lr=float(train_cfg["lr"]),
        grad_clip_norm=float(train_cfg.get("grad_clip_norm", 0.0)))
    tstate = state_lib.create_train_state(cfg, optimizer)
    init_weights = train_cfg.get("init_weights")
    if init_weights:
        # warm-start from a reference-format checkpoint (.pth or our .npz
        # export) — e.g. fine-tune from a torch-trained epoch_N.pth
        loaded = state_lib.load_torch_weights(init_weights, cfg.n_layers)
        tstate = tstate.replace(params=loaded["params"],
                                buffers=loaded["buffers"])
        log_fn(f"initialized weights from {init_weights}")
    schedule = ReduceLROnPlateau(
        lr=float(train_cfg["lr"]),
        factor=float(train_cfg.get("lr_factor", 0.5)),
        patience=int(train_cfg.get("lr_patience", 5)))
    start_epoch = 0
    if resume:
        latest = state_lib.latest_checkpoint_epoch(out_dir)
        if latest is not None:
            tstate, start_epoch, sched_state = state_lib.restore_checkpoint(
                out_dir, latest, tstate)
            if sched_state:
                schedule.load_state_dict(sched_state)
            tstate = tstate.replace(opt_state=state_lib.set_learning_rate(
                tstate.opt_state, schedule.lr))
            log_fn(f"resumed from epoch {start_epoch}")

    loader_dict = get_loader_dict(configs["dataset"])
    train_step = make_train_step(model, optimizer, train_cfg)
    eval_step = make_eval_step(model, train_cfg,
                               float(train_cfg.get("pred_threshold", 0.5)))
    # rng is re-derived per epoch below, so a run resumed from epoch N
    # replays exactly the dropout stream the uninterrupted run would have
    # used (tests/test_resume.py asserts bit-equal weights)

    mesh_ctx = make_mesh_context(train_cfg)
    if mesh_ctx is not None:
        tstate = mesh_ctx.place_state(tstate, optimizer)
        log_fn(f"mesh training over {mesh_ctx.mesh_obj.devices.shape} "
               f"(data, model) devices")

    token_cache = None
    if bool(train_cfg.get("device_token_cache", True)):
        from sola_tpu.data.device_cache import make_token_cache
        token_cache = make_token_cache(
            configs["dataset"].get("train"),
            dtype=jnp.bfloat16 if train_cfg.get("bf16_token_transfer")
            else jnp.float32)
        if mesh_ctx is None:
            # with tokens device-cached, the stacked host array per batch
            # is dead weight — batches carry per-sample padded rows only
            # (mesh mode needs the stacked array for batch-dim padding)
            for split in ("train", "valid"):
                if split in loader_dict:
                    loader_dict[split].materialize_tokens = False

    # K optimizer steps per dispatch: amortizes per-dispatch host latency
    # (make_train_multi_step); 1 = classic one-dispatch-per-step. Same
    # numbers either way — batches flush in arrival order with their rngs.
    k_steps = int(train_cfg.get("steps_per_dispatch", 1))
    multi_step = (make_train_multi_step(model, optimizer, train_cfg)
                  if k_steps > 1 and mesh_ctx is None else None)

    def _shape_key(batch):
        leaves, treedef = jax.tree_util.tree_flatten(batch)
        return (treedef, tuple(getattr(x, "shape", None) for x in leaves))

    for epoch in range(start_epoch, int(train_cfg["n_epochs"])):
        t0 = time.time()
        rng = jax.random.PRNGKey(42 + epoch)
        # keep per-step metrics as device arrays; fetching only at epoch end
        # lets dispatch run ahead of the host (no per-step sync)
        train_losses = {"total": [], "bce": [], "alignment": []}
        pending: list = []
        pending_rngs: list = []
        pending_key = None

        def flush():
            nonlocal tstate, pending, pending_rngs, pending_key
            if not pending:
                return
            if multi_step is not None and len(pending) == k_steps:
                tstate, metrics = multi_step(
                    tstate, tuple(pending), jnp.stack(pending_rngs))
                for i in range(k_steps):
                    for k in train_losses:
                        train_losses[k].append(metrics[k][i])
            else:  # remainder (or k_steps == 1): per-step dispatches
                for b, r in zip(pending, pending_rngs):
                    tstate, metrics = train_step(tstate, b, r)
                    for k in train_losses:
                        train_losses[k].append(metrics[k])
            pending, pending_rngs, pending_key = [], [], None

        from tqdm import tqdm
        n_epochs = int(train_cfg["n_epochs"])
        with tqdm(loader_dict["train"],
                  desc=f"EPOCH [{epoch + 1} / {n_epochs}]",
                  disable=None) as pbar:
            for step_idx, raw in enumerate(pbar):
                if max_steps_per_epoch and step_idx >= max_steps_per_epoch:
                    break
                rng, step_rng = jax.random.split(rng)
                if mesh_ctx is not None:
                    raw = mesh_ctx.pad_raw(raw)
                batch = prepare_batch(raw, text_encoder, train_cfg,
                                      token_cache=token_cache,
                                      token_rows=mesh_ctx is None)
                if mesh_ctx is not None:
                    batch = mesh_ctx.place_batch(batch)
                if multi_step is None:
                    tstate, metrics = train_step(tstate, batch, step_rng)
                    for k in train_losses:
                        train_losses[k].append(metrics[k])
                    continue
                key = _shape_key(batch)
                if pending and key != pending_key:
                    flush()  # bucket changed: run what we have
                pending.append(batch)
                pending_rngs.append(step_rng)
                pending_key = key
                if len(pending) >= k_steps:
                    flush()
        flush()
        train_losses = {k: [float(x) for x in v]
                        for k, v in train_losses.items()}

        # validation pass (train.py:147-232)
        ev = {"total": [], "bce": [], "alignment": [],
              "tp": 0, "fp": 0, "fn": 0, "tn": 0}
        for step_idx, raw in enumerate(loader_dict["valid"]):
            if max_steps_per_epoch and step_idx >= max_steps_per_epoch:
                break
            if mesh_ctx is not None:
                raw = mesh_ctx.pad_raw(raw)
            batch = prepare_batch(raw, text_encoder, train_cfg,
                                  token_cache=token_cache,
                                  token_rows=mesh_ctx is None)
            if mesh_ctx is not None:
                batch = mesh_ctx.place_batch(batch)
            metrics = eval_step(tstate.params, tstate.buffers, batch)
            for k in ("total", "bce", "alignment"):
                ev[k].append(float(metrics[k]))
            for k in ("tp", "fp", "fn", "tn"):
                ev[k] += int(metrics[k])

        denom = ev["tp"] + ev["tn"] + ev["fp"] + ev["fn"]
        acc = (ev["tp"] + ev["tn"]) / max(denom, 1)
        precision = ev["tp"] / (ev["tp"] + ev["fp"] + 1e-6)
        recall = ev["tp"] / (ev["tp"] + ev["fn"] + 1e-6)
        f1 = 2 * precision * recall / (precision + recall + 1e-6)
        valid_loss = float(np.mean(ev["total"])) if ev["total"] else 0.0

        # log.txt epoch block (train.py:235-240 format)
        with open(os.path.join(out_dir, "log.txt"), "a") as f:
            e = epoch + 1
            f.write(f"EPOCH {e:03d}\n")
            f.write(
                f"TRAIN EPOCH {e:03d} | LOSS: {np.mean(train_losses['total']):.4f} "
                f"({np.std(train_losses['total']):.4f}) | "
                f"BCE: {np.mean(train_losses['bce']):.4f} | "
                f"ALIGNMENT: {np.mean(train_losses['alignment']):.4f}\n")
            f.write(
                f"VALID EPOCH {e:03d} | LOSS: {valid_loss:.4f} "
                f"({np.std(ev['total']) if ev['total'] else 0.0:.4f}) | "
                f"BCE: {np.mean(ev['bce']) if ev['bce'] else 0.0:.4f} | "
                f"ALIGNMENT: {np.mean(ev['alignment']) if ev['alignment'] else 0.0:.4f}\n")
            f.write(
                f"VALID EPOCH {e:03d} | ACC: {acc:.4f} | F1: {f1:.4f} | "
                f"PRECISION: {precision:.4f} | RECALL: {recall:.4f}\n")
            f.write(
                f"VALID EPOCH {e:03d} | TP: {ev['tp']} | FP: {ev['fp']} | "
                f"FN: {ev['fn']} | TN: {ev['tn']}\n")

        new_lr = schedule.step(valid_loss)
        tstate = tstate.replace(
            opt_state=state_lib.set_learning_rate(tstate.opt_state, new_lr))

        state_lib.save_checkpoint(out_dir, epoch + 1, tstate,
                                  schedule.state_dict())
        log_fn(f"epoch {epoch + 1} done in {time.time() - t0:.1f}s | "
               f"train loss {np.mean(train_losses['total']):.4f} | "
               f"valid loss {valid_loss:.4f} | lr {new_lr:.2e}")
    return tstate
