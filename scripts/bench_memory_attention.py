"""Microbench: SAM2 memory cross-attention at production shape.

The propagation scan runs ~70 ms per frame-step (4-object batch) while a
naive roofline for its FLOPs says ~6 ms — this isolates the flash kernel
at the exact memory-attention shape (B=4 objects, 1 head, 4096 queries,
~28.7k keys, head_dim 64 with 64-d values) plus the dense-fallback
comparison, and a full MemoryAttention module call, to locate the gap.
Prints one JSON line.
"""

import json
import time

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sola_tpu.ops.flash_attention import fused_attention

    b, h, lq, lk, d = 4, 1, 4096, 7 * 4096 + 64, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, lq, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, lk, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, lk, d), jnp.bfloat16)

    out = {}
    flops = 4.0 * b * h * lq * lk * d  # QK^T + AV

    fused = jax.jit(lambda q, k, v: fused_attention(q, k, v, block_q=512,
                                                    block_k=1024))
    t = timeit(fused, q, k, v)
    out["flash_ms"] = round(t * 1e3, 2)
    out["flash_tflops"] = round(flops / t / 1e12, 1)

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / (d ** 0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32)

    t = timeit(jax.jit(dense), q, k, v)
    out["dense_ms"] = round(t * 1e3, 2)
    out["dense_tflops"] = round(flops / t / 1e12, 1)

    # full memory-attention stack (4 layers: self + cross + FFN) at the
    # same shape, through the real module
    from sola_tpu.trackgen.sam2.memory import (MemoryAttention,
                                               MemoryAttentionConfig)
    cfg = MemoryAttentionConfig()
    mod = MemoryAttention(cfg)
    tgt = jax.random.normal(key, (b, lq, cfg.d_model), jnp.bfloat16)
    pos = jax.random.normal(key, (b, lq, cfg.d_model), jnp.bfloat16)
    mem = jax.random.normal(key, (b, lk, cfg.mem_dim), jnp.bfloat16)
    mem_pos = jax.random.normal(key, (b, lk, cfg.mem_dim), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(1), tgt, pos, mem, mem_pos, 64)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)

    f = jax.jit(lambda v_, a, b_, c, d_: mod.apply(v_, a, b_, c, d_, 64))
    t = timeit(f, variables, tgt, pos, mem, mem_pos, iters=5)
    out["memory_attention_stack_ms"] = round(t * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
