"""SAM2 image encoder: Hiera trunk + FPN neck + sine position encodings.

Produces the three feature levels SAM2's heads consume: high-res stride-4 and
stride-8 maps (for mask-decoder upsampling skip connections) and the stride-16
"image embedding" that the memory attention and mask decoder operate on.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from sola_tpu.trackgen.sam2.common import (interpolate_nearest,
                                           sine_position_encoding)
from sola_tpu.trackgen.sam2.hiera import Hiera, HieraConfig


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    hiera: HieraConfig = HieraConfig.large()
    d_model: int = 256
    # which top-down levels receive the upsampled coarser map (indices into
    # the stride-ascending level list [4, 8, 16, 32] -> SAM2 uses [2, 3],
    # i.e. stride-16 and stride-32 stay top-down fused)
    fpn_top_down_levels: tuple = (2, 3)

    @classmethod
    def tiny_test(cls) -> "ImageEncoderConfig":
        return cls(hiera=HieraConfig.tiny_test(), d_model=32)


class FpnNeck(nn.Module):
    """1x1 lateral convs to d_model + nearest top-down pathway."""
    cfg: ImageEncoderConfig

    @nn.compact
    def __call__(self, xs: list[jax.Array]):
        cfg = self.cfg
        n = len(xs)
        # lateral convs indexed by ascending stride (trunk output order)
        laterals = [
            nn.Conv(cfg.d_model, (1, 1), name=f"conv_{i}")(xs[i])
            for i in range(n)
        ]
        outs = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):  # coarsest first
            x = laterals[i]
            if i in cfg.fpn_top_down_levels and prev is not None:
                x = x + interpolate_nearest(prev, x.shape[1], x.shape[2])
            outs[i] = x
            prev = x
        poss = [
            jnp.broadcast_to(
                sine_position_encoding(o.shape[1], o.shape[2],
                                       cfg.d_model)[None], o.shape)
            for o in outs
        ]
        return outs, poss


class ImageEncoder(nn.Module):
    cfg: ImageEncoderConfig

    @nn.compact
    def __call__(self, images: jax.Array):
        """images: (B, H, W, 3), ImageNet-normalized.

        Returns dict with:
          backbone_fpn: 3 maps [stride4 (d), stride8 (d), stride16 (d)]
          vision_pos:   matching sine PEs
        (SAM2 keeps the last 3 of 4 FPN levels for its heads.)
        """
        feats = Hiera(self.cfg.hiera, name="trunk")(images)
        outs, poss = FpnNeck(self.cfg, name="neck")(feats)
        # SAM2 consumes the finest 3 levels (stride 4, 8, 16)
        return {"backbone_fpn": outs[:3], "vision_pos": poss[:3]}


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def normalize_image(image_uint8: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 -> normalized float (SAM2's transform)."""
    x = image_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
