"""Language-aligned track-selection transformer (the trainable core of SOLA).

JAX/Flax re-design of the reference model (module/module.py:54-162):

* short-term motion encoder: 6 weight-standardized 1-D convs with GroupNorm +
  LeakyReLU + dropout, 8x temporal downsample, dims 256->512->512->512->1024
  ->1024->1024 (module/module.py:74-96);
* random-Fourier temporal positional encoding from a fixed Gaussian buffer
  (module/module.py:104-128);
* ``n_negative`` learned negative tokens appended to the language sequence
  (module/module.py:110,146-147);
* N alignment layers, each = inter-object attention (per frame, across
  tracks) + motion attention (per track, across frames, PE on q/k only) +
  object->language cross-attention, each with residual + GroupNorm
  (module/module.py:8-52);
* einsum scoring head: per-(track, frame) logits -> softmax over frames ->
  frame-weighted pooled score tokens -> per-track logits
  (module/module.py:152-161).

TPU-first differences from the reference (numerics identical on the valid
region, verified in tests/test_selection_parity.py):

* every ragged axis (tracks n, frames t, words w) is padded to static shapes
  with explicit validity masks, so MANY (video, expression) pairs batch into
  one jit program — the reference is locked to batch_size=1 by ragged shapes;
* all attention/GroupNorm/softmax/mean ops are mask-aware;
* feature-last (B, L, C) layout throughout (XLA's preferred conv/matmul
  layout) instead of torch's channel-first permute dance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sola_tpu.models.attention import MultiHeadAttention
from sola_tpu.models.layers import (
    MaskedGroupNorm,
    WSConv1d,
    downsampled_length,
    leaky_relu,
    prefix_mask,
)


@dataclasses.dataclass(frozen=True)
class SelectionConfig:
    """Model hyperparameters (configs/mevis/default.yaml:3-13)."""
    object_token_dim: int = 256
    lang_token_dim: int = 1024
    n_layers: int = 2
    max_temporal_length: int = 100
    n_negative: int = 32
    dropout_p: float = 0.2
    n_groups: int = 8
    n_groups_module: int = 8
    num_heads: int = 8
    attn_dropout_p: float = 0.1
    use_pallas_attention: bool = False

    @classmethod
    def from_dict(cls, model_configs: dict) -> "SelectionConfig":
        return cls(
            object_token_dim=model_configs.get("object_token_dim", 256),
            lang_token_dim=model_configs.get("lang_token_dim", 1024),
            n_layers=model_configs.get("n_layers", 2),
            max_temporal_length=model_configs.get("max_temporal_length", 100),
            n_negative=model_configs.get("n_negative", 32),
            dropout_p=model_configs.get("dropout_p", 0.2),
            n_groups=model_configs.get("n_groups", 8),
            n_groups_module=model_configs.get("n_groups_module", 8),
            # upstream hardcodes SDPA dropout 0.1 (tools/attention.py:12);
            # exposing it lets trajectory-parity runs zero the one RNG
            # source no reference config can disable
            attn_dropout_p=model_configs.get("attn_dropout_p", 0.1),
            use_pallas_attention=model_configs.get("use_pallas_attention",
                                                   False),
        )


def masked_mean(x: jax.Array, mask: Optional[jax.Array],
                axis: int) -> jax.Array:
    """Mean over `axis` counting only mask-valid entries (mask broadcastable)."""
    if mask is None:
        return x.mean(axis=axis)
    m = mask.astype(x.dtype)
    total = jnp.sum(x * m, axis=axis)
    count = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return total / count


def masked_softmax(logits: jax.Array, mask: Optional[jax.Array],
                   axis: int) -> jax.Array:
    """Softmax over `axis` with invalid entries forced to 0 probability."""
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    neg = jnp.asarray(-1e30, logits.dtype)
    masked = jnp.where(mask, logits, neg)
    out = jax.nn.softmax(masked, axis=axis)
    return jnp.where(mask, out, 0.0)


class AlignmentLayer(nn.Module):
    """One object-language alignment layer (module/module.py:8-52)."""
    cfg: SelectionConfig

    @nn.compact
    def __call__(
        self,
        object_tokens: jax.Array,    # (b, n, t, d)
        object_tokens_pe: jax.Array,  # (1|b, 1, t, d)
        lang_tokens: jax.Array,       # (b, w, d)
        track_mask: Optional[jax.Array],   # (b, n) bool
        frame_mask: Optional[jax.Array],   # (b, t) bool
        lang_mask: Optional[jax.Array],    # (b, w) bool
        deterministic: bool = True,
    ):
        cfg = self.cfg
        b, n, t, d = object_tokens.shape

        def mha(name):
            return MultiHeadAttention(
                embed_dim=cfg.lang_token_dim, num_heads=cfg.num_heads,
                dropout_p=cfg.attn_dropout_p,
                use_pallas=cfg.use_pallas_attention, name=name)

        # --- inter-object attention: tokens of all tracks at one frame ---
        x = object_tokens.transpose(0, 2, 1, 3).reshape(b * t, n, d)
        kmask = None
        if track_mask is not None:
            kmask = jnp.repeat(track_mask, t, axis=0)  # (b*t, n)
        attn = mha("obj_attn")(x, x, x, key_mask=kmask,
                               deterministic=deterministic)
        x = x + attn
        gmask = kmask if kmask is not None else None
        x = MaskedGroupNorm(cfg.n_groups_module, name="norm_obj")(x, gmask)
        x = x.reshape(b, t, n, d).transpose(0, 2, 1, 3)

        # --- motion attention: one track across frames, PE on q/k only ---
        xq = (x + object_tokens_pe).reshape(b * n, t, d)
        xv = x.reshape(b * n, t, d)
        kmask = None
        if frame_mask is not None:
            kmask = jnp.repeat(frame_mask, n, axis=0)  # (b*n, t)
        attn = mha("motion_attn")(xq, xq, xv, key_mask=kmask,
                                  deterministic=deterministic)
        x = xv + attn
        x = MaskedGroupNorm(cfg.n_groups_module, name="norm_motion")(x, kmask)
        x = x.reshape(b, n, t, d)

        # --- object -> language cross-attention over (n*t) queries ---
        xq = x.reshape(b, n * t, d)
        lmask = lang_mask
        attn = mha("object2lang_attn")(xq, lang_tokens, lang_tokens,
                                       key_mask=lmask,
                                       deterministic=deterministic)
        xq = xq + attn
        nt_mask = None
        if track_mask is not None or frame_mask is not None:
            tm = track_mask if track_mask is not None else jnp.ones(
                (b, n), bool)
            fm = frame_mask if frame_mask is not None else jnp.ones(
                (b, t), bool)
            nt_mask = (tm[:, :, None] & fm[:, None, :]).reshape(b, n * t)
        xq = MaskedGroupNorm(cfg.n_groups_module, name="norm_lang")(xq, nt_mask)
        return xq.reshape(b, n, t, d), lang_tokens


class SelectionModel(nn.Module):
    """LanguageAlignedTrackSelectionModule, TPU-native (module/module.py:54)."""
    cfg: SelectionConfig

    def setup(self):
        cfg = self.cfg
        hidden = cfg.object_token_dim * 2
        d = cfg.lang_token_dim
        # (out_features, kernel, stride, padding): module/module.py:74-96
        conv_specs = [
            (hidden, 3, 2, 1), (hidden, 3, 2, 1), (hidden, 3, 2, 1),
            (d, 3, 1, 1), (d, 3, 1, 1), (d, 1, 1, 0),
        ]
        self.conv_specs = conv_specs
        self.convs = [
            WSConv1d(features=f, kernel_size=k, stride=s, padding=p,
                     name=f"conv_{i}")
            for i, (f, k, s, p) in enumerate(conv_specs)
        ]
        # GroupNorm after every conv except the last (module/module.py:95-96)
        self.conv_norms = [
            MaskedGroupNorm(cfg.n_groups, name=f"conv_norm_{i}")
            for i in range(len(conv_specs) - 1)
        ]
        self.align_layers = [
            AlignmentLayer(cfg, name=f"align_{i}") for i in range(cfg.n_layers)
        ]
        self.conv_dropout = nn.Dropout(rate=cfg.dropout_p)
        # Fixed random-Fourier buffer; a non-trainable variable so optimizers
        # skip it, mirroring the torch registered buffer (module/module.py:104).
        self.pe_gaussian = self.variable(
            "buffers", "positional_encoding_gaussian",
            lambda: jax.random.normal(jax.random.PRNGKey(0),
                                      (1, cfg.lang_token_dim // 2),
                                      jnp.float32))
        self.negative_token = self.param(
            "negative_token", nn.initializers.normal(1.0),
            (cfg.n_negative, cfg.lang_token_dim))

    def temporal_positional_encoding(self, t: int) -> jax.Array:
        """Random-Fourier PE over frame index (module/module.py:112-128)."""
        cfg = self.cfg
        pos = jnp.arange(t, dtype=jnp.float32).reshape(t, 1)
        pos = pos / cfg.max_temporal_length
        proj = 2.0 * np.pi * (pos @ self.pe_gaussian.value)
        pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        return pe.reshape(1, 1, t, cfg.lang_token_dim)

    def encode_motion(self, object_tokens: jax.Array,
                      frame_lengths: Optional[jax.Array],
                      deterministic: bool = True):
        """Short-term motion encoder; returns (tokens', frame_mask')."""
        cfg = self.cfg
        b, n, t, d = object_tokens.shape
        x = object_tokens.reshape(b * n, t, d)
        lengths = None
        if frame_lengths is not None:
            lengths = jnp.repeat(frame_lengths, n, axis=0)  # (b*n,)
        for i, conv in enumerate(self.convs):
            _, k, s, p = self.conv_specs[i]
            if lengths is not None:
                # zero the padded tail so boundary windows see the same zeros
                # torch's conv padding would
                x = x * prefix_mask(lengths, x.shape[1]).astype(x.dtype)[..., None]
            x = conv(x)
            if lengths is not None:
                lengths = downsampled_length(lengths, s, k, p)
            if i < len(self.convs) - 1:
                mask = (prefix_mask(lengths, x.shape[1])
                        if lengths is not None else None)
                x = self.conv_norms[i](x, mask)
                x = leaky_relu(x)
                if not deterministic and cfg.dropout_p > 0:
                    x = self.conv_dropout(x, deterministic=False)
        t_out = x.shape[1]
        x = x.reshape(b, n, t_out, cfg.lang_token_dim)
        out_mask = None
        if frame_lengths is not None:
            out_lengths = frame_lengths
            for (_, k, s, p) in self.conv_specs:
                out_lengths = downsampled_length(out_lengths, s, k, p)
            out_mask = prefix_mask(out_lengths, t_out)
        return x, out_mask

    def __call__(
        self,
        object_tokens: jax.Array,            # (b, n, t, object_token_dim)
        lang_tokens: jax.Array,              # (b, w, lang_token_dim)
        track_mask: Optional[jax.Array] = None,    # (b, n) bool
        frame_lengths: Optional[jax.Array] = None,  # (b,) int valid frames
        lang_mask: Optional[jax.Array] = None,      # (b, w) bool
        deterministic: bool = True,
    ):
        cfg = self.cfg
        b, n, _, _ = object_tokens.shape

        # 1. motion encoding: 8x temporal downsample, 256 -> 1024
        x, frame_mask = self.encode_motion(object_tokens, frame_lengths,
                                           deterministic)
        t = x.shape[2]

        # 2. temporal PE (shared across batch and tracks)
        pe = self.temporal_positional_encoding(t)

        # 3. append learned negative tokens to the language sequence
        neg = jnp.broadcast_to(self.negative_token[None],
                               (b, cfg.n_negative, cfg.lang_token_dim))
        lang_full = jnp.concatenate([lang_tokens, neg], axis=1)
        lang_full_mask = None
        if lang_mask is not None:
            ones = jnp.ones((b, cfg.n_negative), bool)
            lang_full_mask = jnp.concatenate([lang_mask, ones], axis=1)

        # 4. alignment layers
        for layer in self.align_layers:
            x, lang_full = layer(x, pe, lang_full, track_mask, frame_mask,
                                 lang_full_mask, deterministic)

        # 5. scoring head (module/module.py:152-161)
        score_logits = jnp.einsum("bntd,bwd->bntw", x, lang_full,
                                  preferred_element_type=jnp.float32)
        score_logits = masked_mean(
            score_logits,
            lang_full_mask[:, None, None, :]
            if lang_full_mask is not None else None,
            axis=-1)  # (b, n, t)
        weight = masked_softmax(
            score_logits,
            frame_mask[:, None, :] if frame_mask is not None else None,
            axis=-1)
        score_tokens = jnp.sum(x * weight[..., None], axis=2)  # (b, n, d)
        score_map = jnp.einsum("bnd,bwd->bnw", score_tokens, lang_full,
                               preferred_element_type=jnp.float32)
        score_map = masked_mean(
            score_map,
            lang_full_mask[:, None, :] if lang_full_mask is not None else None,
            axis=-1)  # (b, n)
        return score_map, score_tokens

    def get_negative_tokens(self, batch_size: int) -> jax.Array:
        """(b, n_negative, d) copy of the learned negatives (train.py:92)."""
        return jnp.broadcast_to(
            self.negative_token[None],
            (batch_size, self.cfg.n_negative, self.cfg.lang_token_dim))
