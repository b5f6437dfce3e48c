"""Independent functional PyTorch oracle of the selection-model math.

Written from the spec in SURVEY.md §2.1 / the reference call structure, used
only to validate numerical parity of the JAX model (eval mode, fp32). It
consumes a reference-style state_dict so the converter is exercised on the
exact checkpoint naming.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

CONV_SEQ = [0, 4, 8, 12, 16, 20]
NORM_SEQ = [1, 5, 9, 13, 17]
CONV_SPECS = [(2, 1), (2, 1), (2, 1), (1, 1), (1, 1), (1, 0)]  # (stride, pad)


def make_state_dict(seed=0, d_obj=32, d_lang=64, n_layers=2, n_negative=8,
                    n_groups=4):
    """Random reference-style state_dict for a small model."""
    g = torch.Generator().manual_seed(seed)
    hidden = d_obj * 2
    dims = [(d_obj, hidden, 3), (hidden, hidden, 3), (hidden, hidden, 3),
            (hidden, d_lang, 3), (d_lang, d_lang, 3), (d_lang, d_lang, 1)]
    state = {}
    for seq, (cin, cout, k) in zip(CONV_SEQ, dims):
        state[f"short_motion_encoder.{seq}.weight"] = torch.randn(
            cout, cin, k, generator=g) * 0.2
        state[f"short_motion_encoder.{seq}.bias"] = torch.randn(
            cout, generator=g) * 0.1
    norm_dims = [hidden, hidden, hidden, d_lang, d_lang]
    for seq, c in zip(NORM_SEQ, norm_dims):
        state[f"short_motion_encoder.{seq}.weight"] = 1.0 + 0.1 * torch.randn(
            c, generator=g)
        state[f"short_motion_encoder.{seq}.bias"] = 0.1 * torch.randn(
            c, generator=g)
    for layer in range(n_layers):
        p = f"object_lang_align_layers.{layer}"
        for attn in ("obj_attn", "motion_attn", "object2lang_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                state[f"{p}.{attn}.{proj}.weight"] = torch.randn(
                    d_lang, d_lang, generator=g) / math.sqrt(d_lang)
                state[f"{p}.{attn}.{proj}.bias"] = 0.05 * torch.randn(
                    d_lang, generator=g)
        for i in range(3):
            state[f"{p}.norm.{i}.weight"] = 1.0 + 0.1 * torch.randn(
                d_lang, generator=g)
            state[f"{p}.norm.{i}.bias"] = 0.1 * torch.randn(
                d_lang, generator=g)
    state["negative_token.weight"] = torch.randn(
        n_negative, d_lang, generator=g)
    state["positional_encoding_gaussian_matrix"] = torch.randn(
        1, d_lang // 2, generator=g)
    return state


def ws_conv1d(x, w, b, stride, padding):
    mu = w.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True)
    wc = w - mu
    std = wc.reshape(wc.size(0), -1).std(dim=1).view(-1, 1, 1) + 1e-5
    return F.conv1d(x, wc / std, b, stride=stride, padding=padding)


def attention(state, prefix, xq, xk, xv, heads=8):
    def proj(name, x):
        return x @ state[f"{prefix}.{name}.weight"].T + state[
            f"{prefix}.{name}.bias"]

    q, k, v = proj("q_proj", xq), proj("k_proj", xk), proj("v_proj", xv)
    bsz, lq, d = q.shape
    lk = k.shape[1]
    hd = d // heads
    q = q.view(bsz, lq, heads, hd).transpose(1, 2)
    k = k.view(bsz, lk, heads, hd).transpose(1, 2)
    v = v.view(bsz, lk, heads, hd).transpose(1, 2)
    out = F.scaled_dot_product_attention(q, k, v)  # eval: no dropout
    out = out.transpose(1, 2).reshape(bsz, lq, d)
    return proj("out_proj", out)


def group_norm_cl(state, prefix, x, groups):
    """GroupNorm on a channel-last (B, L, C) tensor via the (B, C, L) route."""
    y = F.group_norm(x.transpose(1, 2), groups, state[f"{prefix}.weight"],
                     state[f"{prefix}.bias"], eps=1e-5)
    return y.transpose(1, 2)


@torch.no_grad()
def forward(state, object_tokens, lang_tokens, n_layers=2,
            max_temporal_length=100, n_groups=4, n_groups_module=4, heads=8):
    """object_tokens (b, n, t, d_obj); lang_tokens (b, w, d_lang)."""
    object_tokens = torch.as_tensor(np.asarray(object_tokens),
                                    dtype=torch.float32)
    lang_tokens = torch.as_tensor(np.asarray(lang_tokens),
                                  dtype=torch.float32)
    b, n, t, d0 = object_tokens.shape
    x = object_tokens.permute(0, 1, 3, 2).reshape(b * n, d0, t)
    for i, (seq, (stride, pad)) in enumerate(zip(CONV_SEQ, CONV_SPECS)):
        x = ws_conv1d(x, state[f"short_motion_encoder.{seq}.weight"],
                      state[f"short_motion_encoder.{seq}.bias"], stride, pad)
        if i < len(CONV_SEQ) - 1:
            x = F.group_norm(x, n_groups,
                             state[f"short_motion_encoder.{NORM_SEQ[i]}.weight"],
                             state[f"short_motion_encoder.{NORM_SEQ[i]}.bias"])
            x = F.leaky_relu(x)
    d = x.shape[1]
    t2 = x.shape[2]
    x = x.reshape(b, n, d, t2).permute(0, 1, 3, 2)  # (b, n, t2, d)

    # temporal positional encoding
    pe = torch.arange(t2, dtype=torch.float32).view(1, 1, t2, 1) / \
        max_temporal_length
    pe = pe.expand(b, n, t2, 1) @ state["positional_encoding_gaussian_matrix"]
    pe = 2 * math.pi * pe
    pe = torch.cat([torch.sin(pe), torch.cos(pe)], dim=-1)

    # negatives appended to language tokens
    neg = state["negative_token.weight"].unsqueeze(0).expand(b, -1, -1)
    lang = torch.cat([lang_tokens, neg], dim=1)

    for layer in range(n_layers):
        p = f"object_lang_align_layers.{layer}"
        # inter-object
        xo = x.permute(0, 2, 1, 3).reshape(b * t2, n, d)
        xo = xo + attention(state, f"{p}.obj_attn", xo, xo, xo, heads)
        xo = group_norm_cl(state, f"{p}.norm.0", xo, n_groups_module)
        x = xo.reshape(b, t2, n, d).permute(0, 2, 1, 3)
        # motion
        xq = (x + pe).reshape(b * n, t2, d)
        xv = x.reshape(b * n, t2, d)
        xm = xv + attention(state, f"{p}.motion_attn", xq, xq, xv, heads)
        xm = group_norm_cl(state, f"{p}.norm.1", xm, n_groups_module)
        x = xm.reshape(b, n, t2, d)
        # object -> language
        xf = x.reshape(b, n * t2, d)
        xf = xf + attention(state, f"{p}.object2lang_attn", xf, lang, lang,
                            heads)
        xf = group_norm_cl(state, f"{p}.norm.2", xf, n_groups_module)
        x = xf.reshape(b, n, t2, d)

    score_logits = torch.einsum("bntd,bwd->bntw", x, lang).mean(dim=-1)
    w = torch.softmax(score_logits, dim=-1)
    score_tokens = (x * w.unsqueeze(-1)).sum(dim=2)
    score_map = torch.einsum("bnd,bwd->bnw", score_tokens, lang).mean(dim=-1)
    return score_map.numpy(), score_tokens.numpy()
