"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, (
        "conftest must force an 8-device CPU platform")


def test_mesh_construction():
    from sola_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (8, 1)
    mesh42 = make_mesh(n_data=4, n_model=2)
    assert mesh42.devices.shape == (4, 2)


def test_dryrun_multichip_executes():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_devices():
    """Reproduce the driver's environment (MULTICHIP_r01 failure): NO
    conftest platform forcing, fewer visible devices than requested.
    dryrun_multichip must provision a virtual mesh itself (in a subprocess)
    rather than crash reshaping 1 device into (8, 1)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # single CPU device, no forced host device count — like the bench box
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["JAX_PLATFORMS"] = "cpu"
    # drop the axon relay plugin from the subprocess: its sitecustomize
    # register() performs relay I/O at import time, and a down relay turns
    # this CPU-only test into a 600 s hang (observed when the tunnel died)
    env["PYTHONPATH"] = repo + os.pathsep + os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        "assert len(jax.devices()) < 8, 'precondition: scarce devices'\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout


def test_tp_sharded_train_step_matches_replicated(rng):
    """dp x tp (4 data x 2 model) train step must produce the same params and
    loss as the pure data-parallel (replicated-params) step: the tp specs are
    annotations only; XLA's SPMD partitioner must preserve the math."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    from sola_tpu.parallel.mesh import make_mesh
    from sola_tpu.parallel.tp import selection_param_specs, shard_train_state
    from sola_tpu.train import state as state_lib
    from sola_tpu.train.loop import make_train_step

    cfg = SelectionConfig(object_token_dim=16, lang_token_dim=64, n_layers=2,
                          n_negative=4, dropout_p=0.0, attn_dropout_p=0.0,
                          n_groups=4, n_groups_module=4)
    model = SelectionModel(cfg)
    optimizer = state_lib.make_optimizer(lr=1e-3, grad_clip_norm=1.0)
    tstate = state_lib.create_train_state(cfg, optimizer)
    train_cfg = {"positive_weight": 1.5, "alignment_weight": 0.3,
                 "temperature": 0.07}
    step = make_train_step(model, optimizer, train_cfg)

    b, n, t, w = 8, 4, 16, 5
    batch = {
        "object_tokens": jnp.asarray(rng.standard_normal(
            (b, n, t, 16), dtype=np.float32)),
        "track_mask": jnp.ones((b, n), bool),
        "frame_lengths": jnp.full((b,), t, jnp.int32),
        "lang_tokens": jnp.asarray(rng.standard_normal(
            (b, w, 64), dtype=np.float32)),
        "lang_mask": jnp.ones((b, w), bool),
        "pos_tokens": jnp.asarray(rng.standard_normal(
            (b, 1, 64), dtype=np.float32)),
        "labels": jnp.asarray((rng.random((b, n)) > 0.5).astype(np.float32)),
    }
    key = jax.random.PRNGKey(7)

    # reference: single-device (no mesh) step
    ref_state, ref_metrics = step(tstate, batch, key)
    ref_params = jax.tree_util.tree_map(np.asarray, ref_state.params)

    # dp x tp: params sharded by the tp specs, batch on the data axis
    mesh = make_mesh(n_data=4, n_model=2)
    specs = selection_param_specs(tstate.params)
    spec_vals = set(
        str(s) for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)))
    assert any("model" in s for s in spec_vals), "tp specs must shard params"

    tstate2 = state_lib.create_train_state(cfg, optimizer)
    tstate2 = shard_train_state(mesh, tstate2, optimizer)
    data = NamedSharding(mesh, P("data"))
    batch_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data), batch)
    with mesh:
        new_state, metrics = step(tstate2, batch_s, key)
        jax.block_until_ready(new_state.params)
    got_params = jax.tree_util.tree_map(np.asarray, new_state.params)

    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_metrics["total"]), atol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_got = jax.tree_util.tree_leaves(got_params)
    for a, g in zip(flat_ref, flat_got):
        # atol: sharded matmuls/psums reduce in a different order than the
        # single-device program; observed max drift ~2e-5 after one Adam step
        np.testing.assert_allclose(g, a, atol=1e-4)


def test_entry_compiles_small():
    """entry() is the full-size model; here just check the same path compiles
    at a reduced size via dryrun (full-size compile is the driver's job)."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None  # traced + lowered without executing


def test_sharded_eval_matches_single_device(rng):
    """Data-parallel eval step over the mesh must equal single-device output."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sola_tpu.models.selection import SelectionConfig, SelectionModel
    from sola_tpu.parallel.mesh import make_mesh

    cfg = SelectionConfig(object_token_dim=16, lang_token_dim=64, n_layers=1,
                          n_negative=4, dropout_p=0.0, n_groups=4,
                          n_groups_module=4)
    model = SelectionModel(cfg)
    b, n, t, w = 8, 4, 16, 5
    obj = rng.standard_normal((b, n, t, 16), dtype=np.float32)
    lang = rng.standard_normal((b, w, 64), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(obj[:1]),
                           jnp.asarray(lang[:1]))

    single_map, _ = model.apply(variables, jnp.asarray(obj),
                                jnp.asarray(lang))

    mesh = make_mesh(n_data=8)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    obj_s = jax.device_put(jnp.asarray(obj), data)
    lang_s = jax.device_put(jnp.asarray(lang), data)
    vars_s = jax.device_put(variables, repl)

    @jax.jit
    def fwd(v, o, l):
        return model.apply(v, o, l)

    with mesh:
        sharded_map, _ = fwd(vars_s, obj_s, lang_s)
    np.testing.assert_allclose(np.asarray(sharded_map),
                               np.asarray(single_map), atol=1e-5)
