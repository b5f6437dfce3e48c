"""Tensor-parallel parameter sharding for the selection model.

Megatron-style sharding of the selection model's wide (1024-d) layers over
the mesh "model" axis, expressed purely as `jax.sharding` annotations — XLA's
SPMD partitioner inserts the collectives (all-gather / reduce-scatter on ICI)
so the math is bit-identical to the replicated program:

* attention q/k/v projections: kernel (in, out) split on `out` — each shard
  computes its own heads (1024 = 8 heads x 128, so any model-axis size that
  divides 8 keeps whole heads per shard);
* attention out projection: kernel split on `in` (row parallel), bias
  replicated — the product psums over shards;
* motion-encoder convs: kernel (k, in, out) split on output channels; weight
  standardization is per-output-channel so it needs no cross-shard stats;
* everything else (GroupNorm affine, negative tokens, PE buffer) replicated.

The reference has no tensor parallelism at all (one process per GPU,
SURVEY.md §2.3); this exists to scale the selection model's per-chip batch
on a v5e pod slice (mesh axes (data, model)), and as the sharding the
driver's `dryrun_multichip` exercises end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def selection_param_specs(params) -> dict:
    """PartitionSpec pytree for a SelectionModel params tree.

    Rules are name-based so they survive model-size changes; anything
    unmatched is replicated.
    """

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf_name = names[-1] if names else ""
        joined = "/".join(str(n) for n in names)
        ndim = getattr(leaf, "ndim", 0)
        if "q_proj" in joined or "k_proj" in joined or "v_proj" in joined:
            if leaf_name == "kernel" and ndim == 2:
                return P(None, "model")     # column parallel
            if leaf_name == "bias" and ndim == 1:
                return P("model")
        if "out_proj" in joined:
            if leaf_name == "kernel" and ndim == 2:
                return P("model", None)     # row parallel
            return P()                       # bias replicated (added post-psum)
        if "norm" not in joined:
            if leaf_name == "kernel" and ndim == 3:  # WSConv1d (k, in, out)
                return P(None, None, "model")
            if (joined.startswith("conv_") and leaf_name == "bias"
                    and ndim == 1):
                return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Place params per `selection_param_specs` on the mesh."""
    specs = selection_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_train_state(mesh: Mesh, tstate, optimizer):
    """TP-shard a TrainState: params by spec, optimizer state VALUES preserved
    (Adam mu/nu, bias-correction count, injected LR) and re-placed onto the
    shardings a fresh ``optimizer.init`` would produce — so a restored
    checkpoint keeps its optimizer state when training resumes under TP.

    ``optimizer.init(params)`` is jitted over the already-sharded params only
    to *derive* the target sharding for every opt-state leaf (moment tensors
    mirror the param PartitionSpecs, scalars replicate); the template's values
    are discarded and the existing leaves are device_put onto its shardings.
    """
    params = shard_params(mesh, tstate.params)
    template = jax.jit(optimizer.init)(params)
    repl = NamedSharding(mesh, P())

    def _place(old, tmpl):
        # moment tensors derive from the sharded params, so jit propagated
        # their NamedShardings; leaves with no input dependence (Adam count,
        # injected hyperparams) land on the default device — replicate those
        sh = tmpl.sharding if isinstance(tmpl.sharding, NamedSharding) \
            else repl
        return jax.device_put(jnp.asarray(old), sh)

    opt_state = jax.tree_util.tree_map(_place, tstate.opt_state, template)
    return tstate.replace(
        params=params,
        opt_state=opt_state,
        buffers=jax.device_put(tstate.buffers, repl),
        step=jax.device_put(tstate.step, repl),
    )
