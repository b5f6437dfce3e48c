"""Decompose the propagation frame-step cost at production shape.

The scan step is ~70 ms/frame at a 4-object batch while the memory
attention stack accounts for ~23 ms; this times the three model stages of
one tracked frame separately — condition_features (memory attention),
sam_heads (prompt enc + decoder + high-res upscale), encode_memory
(1024^2 mask downsampler + fuser) — with relay-proof chained timing.
Prints one JSON line.
"""

import json
import time

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()


def timeit_chained(fn, x0, *rest, n_small=4, n_big=16):
    def run(n):
        x = x0
        for _ in range(n):
            x = fn(x, *rest)
        import jax.numpy as jnp
        return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x)
                     .astype(jnp.float32))

    run(2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(n_small); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(n_big); tb = time.perf_counter() - t0
        best = min(best, (tb - ts) / (n_big - n_small))
    return best


def main(obj_batch: int = 4):
    import jax
    import jax.numpy as jnp

    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.model import SAM2Model

    model, variables = build_sam2(None)
    cfg = model.cfg
    cv = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)

    b = obj_batch
    s = cfg.image_size
    h16 = s // 16
    d = cfg.d_model  # stride-16 feature dim (256)
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    pix = jax.random.normal(key, (b, h16, h16, d), bf)
    pos = jax.random.normal(key, (b, h16, h16, d), bf)
    s0 = jax.random.normal(key, (b, s // 4, s // 4, d // 8), bf)
    s1 = jax.random.normal(key, (b, s // 8, s // 8, d // 4), bf)
    mem_dim = cfg.mem_dim
    C, R, P = cfg.max_cond_frames, cfg.num_recent, cfg.max_obj_ptrs
    cond_mem = jax.random.normal(key, (b, C, h16, h16, mem_dim), bf)
    cond_valid = jnp.ones((b, C), bool)
    recent_mem = jax.random.normal(key, (b, R, h16, h16, mem_dim), bf)
    rec_ok = jnp.ones((b, R), bool)
    tpos = jnp.ones((b, R), jnp.int32)
    obj_ptrs = jax.random.normal(key, (b, P, d), bf)
    ptr_ok = jnp.ones((b, P), bool)

    out = {"obj_batch": b}

    cond = jax.jit(lambda pix_, *a: model.apply(
        cv, pix_, *a, method=SAM2Model.condition_features))
    t = timeit_chained(cond, pix, pos, cond_mem, cond_valid, recent_mem,
                       rec_ok, tpos, obj_ptrs, ptr_ok)
    out["condition_features_ms"] = round(t * 1e3, 2)

    coords = jnp.zeros((b, 1, 2), bf)
    labels = jnp.full((b, 1), -1, jnp.int32)

    def heads(pix_, s0_, s1_):
        o = model.apply(cv, pix_, s0_, s1_, coords, labels, None,
                        cfg.multimask_output_for_tracking, True,
                        method=SAM2Model.sam_heads)
        # chain through the conditioned features so calls serialize
        return pix_ + jnp.mean(o["low_res_masks"]).astype(bf) * 0, o

    heads_j = jax.jit(heads)
    hi = None

    def heads_chain(x, s0_, s1_):
        x2, o = heads_j(x, s0_, s1_)
        return x2

    t = timeit_chained(heads_chain, pix, s0, s1)
    out["sam_heads_ms"] = round(t * 1e3, 2)

    _, o = heads_j(pix, s0, s1)
    hi = o["high_res_masks"][:, 0]

    def encmem(x, hi_):
        m = model.apply(cv, x, hi_, method=SAM2Model.encode_memory)
        return x + jnp.mean(m).astype(bf) * 0

    t = timeit_chained(jax.jit(encmem), pix, hi)
    out["encode_memory_ms"] = round(t * 1e3, 2)

    out["sum_ms"] = round(sum(v for k2, v in out.items()
                              if k2.endswith("_ms")), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
