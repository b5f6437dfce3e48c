"""Multi-head attention for the selection model.

Semantics of tools/attention.py:7-74: four Dense projections, 8 heads,
softmax(QK^T / sqrt(head_dim)) V, train-only dropout 0.1 on the attention
probabilities (torch SDPA's dropout placement), output projection. Extended
with an optional key-validity mask for padded axes.

Shapes here are small (n_obj<=~128, t/8<=~64, words<=~96), so a single fused
XLA dot chain is already MXU-friendly; the module optionally routes through
the Pallas fused kernel (sola_tpu.ops.flash_attention) for the large-batch
shapes produced by cross-(video,expression) batching.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    return jax.random.uniform(key, shape, dtype, minval=-1.0,
                              maxval=1.0) / jnp.sqrt(fan_in)


class WSDense(nn.Module):
    """Dense layer with on-the-fly weight standardization (ws.Linear
    semantics, module/ws.py:24-38)."""
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from sola_tpu.models.layers import standardize_dense_kernel
        kernel = self.param("kernel", torch_linear_init,
                            (x.shape[-1], self.features))
        bias = self.param("bias", torch_linear_init, (self.features,))
        return x @ standardize_dense_kernel(kernel) + bias


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int = 8
    dropout_p: float = 0.1
    use_pallas: bool = False
    # tools/attention.py:20-24 option (the reference never enables it)
    weight_standardization: bool = False

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        key_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """q: (B, Lq, D); k, v: (B, Lk, D); key_mask: (B, Lk) bool or None."""
        d = self.embed_dim
        h = self.num_heads
        hd = d // h

        def dense(name):
            if self.weight_standardization:
                return WSDense(d, name=name)
            return nn.Dense(d, kernel_init=torch_linear_init,
                            bias_init=torch_linear_init, name=name)

        qp = dense("q_proj")(q)
        kp = dense("k_proj")(k)
        vp = dense("v_proj")(v)

        b, lq, _ = qp.shape
        lk = kp.shape[1]
        qh = qp.reshape(b, lq, h, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)

        # the fused kernel handles key-validity masks, has a custom_vjp
        # backward, and (since round 5) applies train-time attention-prob
        # dropout IN-kernel via a counter-based hash mask (torch SDPA
        # placement, tools/attention.py:71) — the fwd and bwd kernels
        # regenerate the identical mask from one per-call seed, so the
        # pallas path is now eligible in training too
        if self.use_pallas:
            from sola_tpu.ops.flash_attention import fused_attention
            if deterministic or self.dropout_p == 0.0:
                out = fused_attention(qh, kh, vh, key_mask=key_mask)
            else:
                seed = jax.random.bits(self.make_rng("dropout"), (1,),
                                       jnp.uint32)
                out = fused_attention(qh, kh, vh, key_mask=key_mask,
                                      dropout_rate=self.dropout_p,
                                      dropout_seed=seed)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, qh.dtype))
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            if key_mask is not None:
                logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1).astype(qh.dtype)
            if not deterministic and self.dropout_p > 0.0:
                probs = nn.Dropout(rate=self.dropout_p)(
                    probs, deterministic=False)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                             preferred_element_type=jnp.float32).astype(
                                 qh.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return dense("out_proj")(out)
