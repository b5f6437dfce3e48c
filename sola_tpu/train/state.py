"""Train state, optimizer, and checkpointing.

Optimizer matches the reference: AdamW(lr from config, torch defaults —
betas (0.9, 0.999), eps 1e-8, weight_decay 0.01; train.py:44-49) with global-
norm clipping at ``grad_clip_norm`` (train.py:120-122; torch's clip_grad_norm_
scales only when above the threshold, which is exactly
``optax.clip_by_global_norm``). The LR is injected as a hyperparameter so the
host-side plateau schedule can lower it between epochs.

Checkpoints are orbax (params + opt state + epoch + schedule state — richer
than the reference's model-only ``epoch_N.pth``, train.py:246), plus
import/export of reference-format torch state_dicts for interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sola_tpu.models import convert
from sola_tpu.models.selection import SelectionConfig, SelectionModel


@flax.struct.dataclass
class TrainState:
    params: Any
    buffers: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float, grad_clip_norm: float = 1.0,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    steps = []
    if grad_clip_norm and grad_clip_norm > 0:
        steps.append(optax.clip_by_global_norm(grad_clip_norm))
    steps.append(optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay))
    return optax.chain(*steps)


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in-place-functionally (plateau schedule hook)."""
    inner = opt_state[-1]
    hyper = dict(inner.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_inner = inner._replace(hyperparams=hyper)
    return opt_state[:-1] + (new_inner,)


def create_train_state(cfg: SelectionConfig, optimizer, seed: int = 42,
                       example_shapes: tuple = (1, 4, 16)) -> TrainState:
    model = SelectionModel(cfg)
    b, n, t = example_shapes
    obj = jnp.zeros((b, n, t, cfg.object_token_dim), jnp.float32)
    lang = jnp.zeros((b, 4, cfg.lang_token_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), obj, lang)
    params = variables["params"]
    return TrainState(
        params=params,
        buffers=variables["buffers"],
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def grad_norm_dict(grads) -> dict:
    """Per-submodule grad L2 norms (module/module.py:164-199 grouping):
    short_motion_encoder (convs + their norms), scmola_layer_i (alignment
    layers), negative_token, and the total."""
    flat = flax.traverse_util.flatten_dict(grads)
    sq = {"short_motion_encoder": 0.0, "negative_token": 0.0}
    total = 0.0
    for path, g in flat.items():
        s = jnp.sum(jnp.square(g))
        total = total + s
        top = path[0]
        if top.startswith("conv"):
            sq["short_motion_encoder"] = sq["short_motion_encoder"] + s
        elif top.startswith("align_"):
            key = "scmola_layer_" + top.split("_")[1]
            sq[key] = sq.get(key, 0.0) + s
        elif top == "negative_token":
            sq["negative_token"] = sq["negative_token"] + s
    out = {k: jnp.sqrt(v) for k, v in sq.items()}
    out["total_grad_norm"] = jnp.sqrt(total)
    return out


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, epoch: int, state: TrainState,
                    schedule_state: Optional[dict] = None) -> str:
    import json

    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    payload = {
        "params": jax.device_get(state.params),
        "buffers": jax.device_get(state.buffers),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    # schedule state is a tiny host-side dict; JSON sidecar keeps the orbax
    # tree structure independent of schedule fields
    with open(path + ".schedule.json", "w") as f:
        json.dump(schedule_state or {}, f)
    return path


def latest_checkpoint_epoch(ckpt_dir: str) -> Optional[int]:
    """Highest N with an ``epoch_N`` checkpoint dir, or None."""
    import re
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [int(m.group(1)) for name in os.listdir(ckpt_dir)
              if (m := re.fullmatch(r"epoch_(\d+)", name))
              and os.path.isdir(os.path.join(ckpt_dir, name))]
    return max(epochs) if epochs else None


def restore_checkpoint(ckpt_dir: str, epoch: int,
                       state: Optional[TrainState] = None):
    import json

    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    ckptr = ocp.PyTreeCheckpointer()
    if state is None:
        return ckptr.restore(path)
    payload = ckptr.restore(path, item={
        "params": jax.device_get(state.params),
        "buffers": jax.device_get(state.buffers),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0, "epoch": 0,
    })
    schedule: dict = {}
    sched_path = path + ".schedule.json"
    if os.path.exists(sched_path):
        with open(sched_path, "r") as f:
            schedule = json.load(f)
    new_state = state.replace(
        params=payload["params"], buffers=payload["buffers"],
        opt_state=payload["opt_state"],
        step=jnp.asarray(payload["step"], jnp.int32))
    return new_state, payload["epoch"], schedule


def export_torch_npz(path: str, state: TrainState, n_layers: int) -> None:
    """Reference-naming weight export (loadable as an epoch_N.pth equivalent)."""
    sd = convert.params_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "buffers": jax.device_get(state.buffers)}, n_layers=n_layers)
    np.savez(path, **sd)


def load_torch_weights(path: str, n_layers: int) -> dict:
    """Load reference weights from a .pth (torch) or .npz (our export)."""
    if path.endswith(".npz"):
        data = dict(np.load(path))
    else:
        import torch
        data = torch.load(path, map_location="cpu", weights_only=True)
    return convert.torch_state_dict_to_params(data, n_layers=n_layers)
