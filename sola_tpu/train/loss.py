"""Training losses for track selection.

* Weighted BCE on per-track logits with positive upweighting
  (train.py:98-104: ``weight[labels > 0] = positive_weight``, mean reduction).
* Contrastive alignment loss (tools/loss.py:4-58): pooled score tokens vs the
  mean-pooled sentence embedding (single positive) and the learned negative
  tokens, logits scaled by ``exp(temperature)``, with hard-negative mining —
  only the argmax negative logit per track carries a positive target for
  non-referred tracks; all elements contribute to the mean.

Both are mask-aware: padded tracks are excluded from every mean, so a padded
multi-pair batch reproduces the reference's batch_size=1 numbers exactly.
Note the reference never optimizes the loss temperature (train.py:44-49 passes
only module parameters to AdamW), so here it is a plain scalar input.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array,
                    weight: Optional[jax.Array] = None,
                    valid_mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean binary cross-entropy with logits, torch-compatible weighting.

    torch's ``binary_cross_entropy_with_logits(weight=w)`` computes
    mean(w * elementwise_bce); with a validity mask the mean runs over valid
    elements only.
    """
    # numerically stable: max(x,0) - x*z + log(1 + exp(-|x|))
    per_elem = (jnp.maximum(logits, 0.0) - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if weight is not None:
        per_elem = per_elem * weight
    if valid_mask is None:
        return per_elem.mean()
    m = valid_mask.astype(per_elem.dtype)
    return jnp.sum(per_elem * m) / jnp.maximum(jnp.sum(m), 1.0)


def selection_bce_loss(score_logits: jax.Array, labels: jax.Array,
                       positive_weight: float,
                       track_mask: Optional[jax.Array] = None) -> jax.Array:
    """Weighted BCE on (b, n) track logits (train.py:98-104)."""
    weight = 1.0 + (positive_weight - 1.0) * labels
    return bce_with_logits(score_logits, labels, weight, track_mask)


def alignment_loss(score_tokens: jax.Array,   # (b, n, d)
                   labels: jax.Array,         # (b, n) in {0, 1}
                   pos_tokens: jax.Array,     # (b, 1, d)
                   neg_tokens: jax.Array,     # (b, m, d)
                   temperature: jax.Array | float,
                   positive_weight: float,
                   track_mask: Optional[jax.Array] = None) -> jax.Array:
    """Contrastive alignment loss (tools/loss.py:14-58)."""
    scale = jnp.exp(jnp.asarray(temperature, score_tokens.dtype))
    pos_logits = jnp.einsum("bnd,bmd->bnm", score_tokens, pos_tokens,
                            preferred_element_type=jnp.float32) * scale
    neg_logits = jnp.einsum("bnd,bmd->bnm", score_tokens, neg_tokens,
                            preferred_element_type=jnp.float32) * scale

    m = neg_tokens.shape[1]
    pos_labels = labels[..., None]                      # (b, n, 1)
    neg_labels = (1.0 - labels)[..., None]              # broadcast to (b, n, m)

    # hard-negative mining: keep the target only at the argmax negative logit
    argmax = jnp.argmax(neg_logits, axis=-1)            # (b, n)
    onehot = jax.nn.one_hot(argmax, m, dtype=neg_logits.dtype)
    neg_targets = jnp.broadcast_to(neg_labels, neg_logits.shape) * onehot

    if track_mask is not None:
        pos_mask = track_mask[..., None]
        neg_mask = jnp.broadcast_to(track_mask[..., None], neg_logits.shape)
    else:
        pos_mask = None
        neg_mask = None
    pos_loss = bce_with_logits(pos_logits, pos_labels, valid_mask=pos_mask)
    neg_loss = bce_with_logits(neg_logits, neg_targets, valid_mask=neg_mask)
    return positive_weight * pos_loss + neg_loss


def total_loss(score_logits: jax.Array, score_tokens: jax.Array,
               labels: jax.Array, pos_tokens: jax.Array,
               neg_tokens: jax.Array, *, temperature: jax.Array | float,
               positive_weight: float, alignment_weight: float,
               track_mask: Optional[jax.Array] = None):
    """bce + alignment_weight * alignment (train.py:113); returns (loss, parts)."""
    bce = selection_bce_loss(score_logits, labels, positive_weight, track_mask)
    align = alignment_loss(score_tokens, labels, pos_tokens, neg_tokens,
                           temperature, positive_weight, track_mask)
    loss = bce + alignment_weight * align
    return loss, {"total": loss, "bce": bce, "alignment": align}
