"""Loss parity vs torch oracles (tools/loss.py semantics) + mask correctness."""

import numpy as np
import pytest

import jax.numpy as jnp

from sola_tpu.train import loss as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_alignment_loss(score_tokens, labels, pos_tokens, neg_tokens,
                         temperature, positive_weight):
    """Oracle for tools/loss.py:14-58."""
    st = torch.as_tensor(score_tokens)
    lb = torch.as_tensor(labels)
    pt = torch.as_tensor(pos_tokens)
    nt = torch.as_tensor(neg_tokens)
    n_pos, n_neg = pt.shape[1], nt.shape[1]
    assert n_pos == 1
    pos_labels = lb.unsqueeze(-1).repeat(1, 1, n_pos)
    neg_labels = (1 - lb).unsqueeze(-1).repeat(1, 1, n_neg)
    scale = float(np.exp(temperature))
    pos_logits = torch.einsum("bnd,bmd->bnm", st, pt) * scale
    neg_logits = torch.einsum("bnd,bmd->bnm", st, nt) * scale
    mask = torch.zeros_like(neg_labels)
    mask.scatter_(-1, neg_logits.argmax(dim=-1, keepdim=True), 1)
    neg_labels = neg_labels * mask
    pos_loss = F.binary_cross_entropy_with_logits(pos_logits, pos_labels)
    neg_loss = F.binary_cross_entropy_with_logits(neg_logits, neg_labels)
    return float(positive_weight * pos_loss + neg_loss)


def torch_bce(logits, labels, positive_weight):
    lg = torch.as_tensor(logits)
    lb = torch.as_tensor(labels)
    w = torch.ones_like(lb)
    w[lb > 0] = positive_weight
    return float(F.binary_cross_entropy_with_logits(lg, lb, weight=w))


def test_bce_parity(rng):
    logits = rng.standard_normal((2, 7), dtype=np.float32) * 3
    labels = (rng.random((2, 7)) > 0.6).astype(np.float32)
    ours = float(L.selection_bce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                      positive_weight=1.5))
    ref = torch_bce(logits, labels, 1.5)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_alignment_parity(rng):
    b, n, m, d = 2, 6, 5, 16
    st = rng.standard_normal((b, n, d), dtype=np.float32)
    lb = (rng.random((b, n)) > 0.5).astype(np.float32)
    pt = rng.standard_normal((b, 1, d), dtype=np.float32)
    nt = rng.standard_normal((b, m, d), dtype=np.float32)
    ours = float(L.alignment_loss(jnp.asarray(st), jnp.asarray(lb),
                                  jnp.asarray(pt), jnp.asarray(nt),
                                  temperature=0.07, positive_weight=1.5))
    ref = torch_alignment_loss(st, lb, pt, nt, 0.07, 1.5)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_total_loss_combination(rng):
    b, n, m, d = 1, 4, 3, 8
    logits = rng.standard_normal((b, n), dtype=np.float32)
    st = rng.standard_normal((b, n, d), dtype=np.float32)
    lb = np.array([[1, 0, 0, 1]], np.float32)
    pt = rng.standard_normal((b, 1, d), dtype=np.float32)
    nt = rng.standard_normal((b, m, d), dtype=np.float32)
    loss, parts = L.total_loss(
        jnp.asarray(logits), jnp.asarray(st), jnp.asarray(lb),
        jnp.asarray(pt), jnp.asarray(nt), temperature=0.07,
        positive_weight=1.5, alignment_weight=0.3)
    expected = torch_bce(logits, lb, 1.5) + 0.3 * torch_alignment_loss(
        st, lb, pt, nt, 0.07, 1.5)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(
        float(parts["bce"]) + 0.3 * float(parts["alignment"]),
        float(parts["total"]), rtol=1e-6)


def test_masked_loss_equals_unpadded(rng):
    """Padding tracks with garbage + masking must reproduce the unpadded loss."""
    b, n, m, d = 2, 5, 4, 8
    logits = rng.standard_normal((b, n), dtype=np.float32)
    st = rng.standard_normal((b, n, d), dtype=np.float32)
    lb = (rng.random((b, n)) > 0.5).astype(np.float32)
    pt = rng.standard_normal((b, 1, d), dtype=np.float32)
    nt = rng.standard_normal((b, m, d), dtype=np.float32)

    base, _ = L.total_loss(jnp.asarray(logits), jnp.asarray(st),
                           jnp.asarray(lb), jnp.asarray(pt), jnp.asarray(nt),
                           temperature=0.07, positive_weight=1.5,
                           alignment_weight=0.3)

    pad = 3
    logits_p = np.concatenate(
        [logits, rng.standard_normal((b, pad), dtype=np.float32) * 9], axis=1)
    st_p = np.concatenate(
        [st, rng.standard_normal((b, pad, d), dtype=np.float32) * 9], axis=1)
    lb_p = np.concatenate([lb, np.ones((b, pad), np.float32)], axis=1)
    mask = np.concatenate([np.ones((b, n), bool), np.zeros((b, pad), bool)],
                          axis=1)
    padded, _ = L.total_loss(jnp.asarray(logits_p), jnp.asarray(st_p),
                             jnp.asarray(lb_p), jnp.asarray(pt),
                             jnp.asarray(nt), temperature=0.07,
                             positive_weight=1.5, alignment_weight=0.3,
                             track_mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-5)


def test_plateau_schedule_matches_torch():
    from sola_tpu.train.schedule import ReduceLROnPlateau
    lr0 = 5e-6
    ours = ReduceLROnPlateau(lr=lr0, factor=0.5, patience=2)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2)
    metrics = [1.0, 0.9, 0.95, 0.96, 0.97, 0.98, 0.5, 0.6, 0.7, 0.8, 0.9]
    for m in metrics:
        sched.step(m)
        ours_lr = ours.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(ours_lr, torch_lr, rtol=1e-9,
                                   err_msg=f"metric {m}")


def test_adamw_clip_trajectory_matches_torch():
    """Our optimizer chain (clip_by_global_norm -> adamw, state.py:38-46)
    must track torch's clip_grad_norm_ + AdamW trajectory (train.py:44-49,
    120-125) step for step, including steps where the clip triggers and
    a mid-run plateau LR drop."""
    import optax
    from sola_tpu.train.state import make_optimizer, set_learning_rate

    rng = np.random.default_rng(5)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) * s
             for s in (0.1, 5.0, 0.5, 20.0, 0.01, 3.0)]  # some trip the clip
    lr0, clip, wd = 5e-6, 1.0, 0.01

    p = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    opt = torch.optim.AdamW([p], lr=lr0, weight_decay=wd)
    ours = make_optimizer(lr0, grad_clip_norm=clip, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = ours.init(params)

    for i, g in enumerate(grads):
        if i == 3:  # plateau-style LR drop mid-run
            for group in opt.param_groups:
                group["lr"] = lr0 * 0.5
            opt_state = set_learning_rate(opt_state, lr0 * 0.5)
        opt.zero_grad()
        p.grad = torch.as_tensor(g.copy())
        torch.nn.utils.clip_grad_norm_([p], clip)
        opt.step()
        updates, opt_state = ours.update({"w": jnp.asarray(g)}, opt_state,
                                         params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), p.detach().numpy(), atol=1e-7,
            rtol=1e-5, err_msg=f"diverged at step {i}")
