"""SAM2 prompt encoder: points / boxes / masks -> sparse + dense embeddings.

Point labels follow SAM2's convention: -1 pad ("not a point"), 0 negative,
1 positive, 2/3 box corners. Static shapes: callers pad the point list and
mark padding with label -1, so one jit program serves any prompt count.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import (LayerNorm2d,
                                           RandomPositionEncoding, conv2d)


@dataclasses.dataclass(frozen=True)
class PromptEncoderConfig:
    embed_dim: int = 256
    image_embedding_size: tuple = (64, 64)
    input_image_size: tuple = (1024, 1024)
    mask_in_chans: int = 16

    @classmethod
    def tiny_test(cls) -> "PromptEncoderConfig":
        return cls(embed_dim=32, image_embedding_size=(4, 4),
                   input_image_size=(64, 64), mask_in_chans=4)


class PromptEncoder(nn.Module):
    cfg: PromptEncoderConfig

    def setup(self):
        cfg = self.cfg
        self.pe_layer = RandomPositionEncoding(cfg.embed_dim, name="pe_layer")
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, cfg.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (cfg.embed_dim,))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (cfg.embed_dim,))
        chans = cfg.mask_in_chans
        self.mask_conv1 = conv2d(chans // 4, 2, stride=2, name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_conv2 = conv2d(chans, 2, stride=2, name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_conv3 = conv2d(cfg.embed_dim, 1, name="mask_conv3")

    def dense_pe(self) -> jax.Array:
        h, w = self.cfg.image_embedding_size
        return self.pe_layer.grid(h, w)  # (h, w, d)

    def embed_points(self, coords: jax.Array,
                     labels: jax.Array) -> jax.Array:
        """coords (B, N, 2) in input-image pixels; labels (B, N) ints.

        Returns (B, N, d) sparse embeddings. Padding entries (label -1) get
        the not-a-point embedding with zero positional term.
        """
        cfg = self.cfg
        coords = coords + 0.5  # pixel centers
        norm = jnp.asarray([cfg.input_image_size[1],
                            cfg.input_image_size[0]], jnp.float32)
        pe = self.pe_layer(coords / norm)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        type_embed = jnp.where(
            (labels == -1)[..., None], self.not_a_point_embed,
            jnp.take(self.point_embeddings,
                     jnp.clip(labels, 0, 3), axis=0))
        return pe + type_embed

    def embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes (B, N, 4) xyxy pixels -> (B, 2N, d) corner embeddings."""
        b, n, _ = boxes.shape
        corners = boxes.reshape(b, n * 2, 2)
        labels = jnp.tile(jnp.asarray([2, 3], jnp.int32)[None], (b, n))
        return self.embed_points(corners, labels)

    def embed_masks(self, masks: jax.Array) -> jax.Array:
        """masks (B, 4*h, 4*w, 1) logits -> dense embeddings (B, h, w, d)."""
        x = self.mask_conv1(masks)
        x = jax.nn.gelu(self.mask_ln1(x), approximate=False)
        x = self.mask_conv2(x)
        x = jax.nn.gelu(self.mask_ln2(x), approximate=False)
        return self.mask_conv3(x)

    def no_mask_dense(self, batch: int) -> jax.Array:
        h, w = self.cfg.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (batch, h, w, self.cfg.embed_dim))

    def __call__(self, coords, labels, masks=None):
        sparse = self.embed_points(coords, labels)
        if masks is None:
            dense = self.no_mask_dense(coords.shape[0])
        else:
            dense = self.embed_masks(masks)
        return sparse, dense
