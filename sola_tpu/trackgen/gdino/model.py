"""GroundingDINO in JAX: open-vocabulary detection for prompt generation.

Architecture (Swin-T + BERT + deformable transformer, per the SwinT-OGC
config the reference loads at generate_prompts_gdino.py:33-34):

* Swin-T backbone -> 3 levels + an extra stride-64 level, all projected to
  d_model=256;
* BERT text encoder (sola_tpu.models.text RobertaEncoder in bert mode) with
  a 768->256 feature projection;
* feature enhancer: 6 layers of {image deformable self-attention, text
  self-attention, bidirectional image<->text fusion};
* language-guided query selection: top-900 positions by max text similarity;
* cross-modality decoder: 6 layers of {query self-attn, query->text
  cross-attn, query->image deformable attn} with iterative box refinement;
* contrastive embedding head: logits against the text tokens
  (prompt_generator.py:132-140 consumes pred_logits/pred_boxes).

The deformable core is the XLA-native gather kernel in deformable.py —
replacing the reference's CUDA extension (SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sola_tpu.models.text import RobertaConfig, RobertaEncoder
from sola_tpu.trackgen.gdino.deformable import MSDeformAttn
from sola_tpu.trackgen.gdino.swin import SwinConfig, SwinTransformer
from sola_tpu.trackgen.sam2.common import MLP, sine_position_encoding


@dataclasses.dataclass(frozen=True)
class GDINOConfig:
    swin: SwinConfig = SwinConfig()
    text: RobertaConfig = RobertaConfig.bert_base()
    d_model: int = 256
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    num_queries: int = 900
    max_text_len: int = 256
    image_size: int = 800

    @classmethod
    def tiny_test(cls) -> "GDINOConfig":
        return cls(swin=SwinConfig.tiny_test(),
                   text=dataclasses.replace(
                       RobertaConfig.tiny(), position_style="bert",
                       pad_token_id=0),
                   d_model=32, n_heads=2, n_levels=4, n_points=2,
                   enc_layers=1, dec_layers=1, dim_feedforward=64,
                   num_queries=20, max_text_len=32, image_size=64)


def inverse_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def box_sine_embed(boxes: jax.Array, dim_per_coord: int,
                   temperature: float = 10000.0) -> jax.Array:
    """Sine embedding of (B, N, 4) cxcywh boxes -> (B, N, 4*dim_per_coord)
    (upstream gen_sineembed_for_position)."""
    scale = 2.0 * np.pi
    dim_t = jnp.arange(dim_per_coord, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / dim_per_coord)
    pos = boxes[..., None] * scale / dim_t  # (B, N, 4, dim)
    emb = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1).reshape(boxes.shape[:-1] + (-1,))
    return emb


class BiMultiHeadAttention(nn.Module):
    """Bidirectional image<->text fusion (GDINO's fusion layer)."""
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, img, txt, txt_mask):
        d, h = self.d_model, self.n_heads
        hd = d // h
        b, li, _ = img.shape
        lt = txt.shape[1]
        qi = nn.Dense(d, name="img_q")(img).reshape(b, li, h, hd)
        vi = nn.Dense(d, name="img_v")(img).reshape(b, li, h, hd)
        qt = nn.Dense(d, name="txt_q")(txt).reshape(b, lt, h, hd)
        vt = nn.Dense(d, name="txt_v")(txt).reshape(b, lt, h, hd)
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, img.dtype))
        sim = jnp.einsum("bihd,bthd->bhit", qi, qt,
                         preferred_element_type=jnp.float32) * scale
        sim_i2t = jnp.where(txt_mask[:, None, None, :] > 0, sim, -1e30)
        attn_i = jax.nn.softmax(sim_i2t, axis=-1).astype(img.dtype)
        img_out = jnp.einsum("bhit,bthd->bihd", attn_i, vt,
                             preferred_element_type=jnp.float32)
        attn_t = jax.nn.softmax(sim, axis=2).astype(img.dtype)
        txt_out = jnp.einsum("bhit,bihd->bthd", attn_t, vi,
                             preferred_element_type=jnp.float32)
        img_out = nn.Dense(d, name="img_out")(
            img_out.reshape(b, li, d).astype(img.dtype))
        txt_out = nn.Dense(d, name="txt_out")(
            txt_out.reshape(b, lt, d).astype(txt.dtype))
        return img + img_out, txt + txt_out


class EnhancerLayer(nn.Module):
    cfg: GDINOConfig

    @nn.compact
    def __call__(self, img_levels, img_ref, txt, txt_mask):
        cfg = self.cfg
        # fusion first (GDINO ordering: fusion -> text self-attn -> image)
        flat = jnp.concatenate(
            [v.reshape(v.shape[0], -1, cfg.d_model) for v in img_levels],
            axis=1)
        flat, txt = BiMultiHeadAttention(cfg.d_model, cfg.n_heads,
                                         name="fusion")(flat, txt, txt_mask)
        img_levels = _unflatten(flat, img_levels)

        # text self-attention + FFN
        t2 = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, name="text_attn")(
                txt, mask=(txt_mask[:, None, None, :] > 0))
        txt = nn.LayerNorm(name="text_norm1")(txt + t2)
        t2 = nn.Dense(cfg.dim_feedforward, name="text_ffn1")(txt)
        t2 = nn.Dense(cfg.d_model, name="text_ffn2")(nn.relu(t2))
        txt = nn.LayerNorm(name="text_norm2")(txt + t2)

        # image deformable self-attention + FFN
        flat = jnp.concatenate(
            [v.reshape(v.shape[0], -1, cfg.d_model) for v in img_levels],
            axis=1)
        i2 = MSDeformAttn(cfg.d_model, cfg.n_levels, cfg.n_heads,
                          cfg.n_points, name="deform_attn")(
                              flat, img_ref, img_levels)
        flat = nn.LayerNorm(name="img_norm1")(flat + i2)
        i2 = nn.Dense(cfg.dim_feedforward, name="img_ffn1")(flat)
        i2 = nn.Dense(cfg.d_model, name="img_ffn2")(nn.relu(i2))
        flat = nn.LayerNorm(name="img_norm2")(flat + i2)
        return _unflatten(flat, img_levels), txt


def _unflatten(flat, levels):
    out = []
    start = 0
    for v in levels:
        b, h, w, c = v.shape
        out.append(flat[:, start:start + h * w].reshape(b, h, w, c))
        start += h * w
    return out


class DecoderLayer(nn.Module):
    cfg: GDINOConfig

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, img_levels, txt,
                 txt_mask):
        cfg = self.cfg
        q = tgt + query_pos
        t2 = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, name="self_attn")(q)
        tgt = nn.LayerNorm(name="norm1")(tgt + t2)
        # query -> text cross attention
        t2 = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, name="text_cross_attn")(
                tgt + query_pos, txt,
                mask=(txt_mask[:, None, None, :] > 0))
        tgt = nn.LayerNorm(name="norm2")(tgt + t2)
        # query -> image deformable attention
        t2 = MSDeformAttn(cfg.d_model, cfg.n_levels, cfg.n_heads,
                          cfg.n_points, name="deform_attn")(
                              tgt + query_pos, reference_points, img_levels)
        tgt = nn.LayerNorm(name="norm3")(tgt + t2)
        t2 = nn.Dense(cfg.dim_feedforward, name="ffn1")(tgt)
        t2 = nn.Dense(cfg.d_model, name="ffn2")(nn.relu(t2))
        return nn.LayerNorm(name="norm4")(tgt + t2)


class ContrastiveEmbed(nn.Module):
    max_text_len: int

    @nn.compact
    def __call__(self, queries, txt, txt_mask):
        logits = jnp.einsum("bqd,btd->bqt", queries, txt,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(txt_mask[:, None, :] > 0, logits, -jnp.inf)
        pad = self.max_text_len - logits.shape[-1]
        if pad > 0:
            logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)),
                             constant_values=-jnp.inf)
        return logits[:, :, :self.max_text_len]


class GroundingDINO(nn.Module):
    cfg: GDINOConfig

    @nn.compact
    def __call__(self, images: jax.Array, input_ids: jax.Array,
                 attention_mask: jax.Array) -> dict:
        """images (B, S, S, 3) normalized; text ids/mask (B, Lt).

        Returns {"pred_logits": (B, nq, max_text_len) — sigmoid-ready,
        "pred_boxes": (B, nq, 4) cxcywh in [0, 1]}.
        """
        cfg = self.cfg
        b = images.shape[0]

        # ---- backbone + input projections -> 4 levels of d_model ----
        feats = SwinTransformer(cfg.swin, name="backbone")(images)
        levels = []
        for i, f in enumerate(feats):
            x = nn.Conv(cfg.d_model, (1, 1), name=f"input_proj_{i}")(f)
            x = nn.GroupNorm(num_groups=32 if cfg.d_model % 32 == 0 else 1,
                             name=f"input_proj_norm_{i}")(x)
            levels.append(x)
        extra = nn.Conv(cfg.d_model, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        name="input_proj_extra")(feats[-1])
        extra = nn.GroupNorm(num_groups=32 if cfg.d_model % 32 == 0 else 1,
                             name="input_proj_extra_norm")(extra)
        levels.append(extra)

        # positional + level embeddings
        level_embed = self.param("level_embed",
                                 nn.initializers.normal(1.0),
                                 (cfg.n_levels, cfg.d_model))
        pos_levels = []
        for i, v in enumerate(levels):
            pos = sine_position_encoding(v.shape[1], v.shape[2], cfg.d_model)
            pos_levels.append(pos[None] + level_embed[i])
        levels = [v + p for v, p in zip(levels, pos_levels)]

        # ---- text encoder + projection ----
        txt = RobertaEncoder(cfg.text, name="bert")(input_ids,
                                                    attention_mask)
        txt = nn.Dense(cfg.d_model, name="feat_map")(txt)

        # ---- reference grid for encoder deformable self-attention ----
        refs = []
        for v in levels:
            h, w = v.shape[1], v.shape[2]
            ys = (jnp.arange(h) + 0.5) / h
            xs = (jnp.arange(w) + 0.5) / w
            grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
            refs.append(grid.reshape(-1, 2))
        ref_pts = jnp.concatenate(refs, axis=0)  # (sumHW, 2)
        img_ref = jnp.broadcast_to(
            ref_pts[None, :, None, :],
            (b, ref_pts.shape[0], cfg.n_levels, 2))

        # ---- feature enhancer ----
        for i in range(cfg.enc_layers):
            levels, txt = EnhancerLayer(cfg, name=f"enc_{i}")(
                levels, img_ref, txt, attention_mask)

        # ---- language-guided query selection ----
        memory = jnp.concatenate(
            [v.reshape(b, -1, cfg.d_model) for v in levels], axis=1)
        enc_out = nn.LayerNorm(name="enc_out_norm")(
            nn.Dense(cfg.d_model, name="enc_out_proj")(memory))
        sim = ContrastiveEmbed(cfg.max_text_len, name="enc_class")(
            enc_out, txt, attention_mask)
        scores = jnp.max(jnp.where(jnp.isfinite(sim), sim, -1e30), axis=-1)
        nq = min(cfg.num_queries, scores.shape[1])
        _, topk = jax.lax.top_k(scores, nq)

        anchors = jnp.take_along_axis(
            jnp.broadcast_to(ref_pts[None], (b,) + ref_pts.shape),
            topk[..., None], axis=1)  # (B, nq, 2)
        sel = jnp.take_along_axis(enc_out, topk[..., None], axis=1)
        delta = MLP(cfg.d_model, 4, 3, name="enc_bbox_head")(sel)
        wh_init = jnp.full_like(anchors, 0.1)
        ref_box = jnp.concatenate([anchors, wh_init], axis=-1)
        ref_box = jax.nn.sigmoid(inverse_sigmoid(ref_box) + delta)

        # ---- cross-modality decoder with iterative refinement ----
        tgt = self.param("tgt_embed", nn.initializers.normal(1.0),
                         (cfg.num_queries, cfg.d_model))[:nq]
        tgt = jnp.broadcast_to(tgt[None], (b, nq, cfg.d_model))
        bbox_head = MLP(cfg.d_model, 4, 3, name="bbox_head")
        query_pos_head = MLP(cfg.d_model, cfg.d_model, 2,
                             name="query_pos_head")
        for i in range(cfg.dec_layers):
            query_pos = query_pos_head(
                box_sine_embed(ref_box, cfg.d_model // 2))
            dec_ref = jnp.broadcast_to(
                ref_box[:, :, None, :], (b, nq, cfg.n_levels, 4))
            tgt = DecoderLayer(cfg, name=f"dec_{i}")(
                tgt, query_pos, dec_ref, levels, txt, attention_mask)
            delta = bbox_head(tgt)
            ref_box = jax.nn.sigmoid(inverse_sigmoid(ref_box) + delta)
            ref_box = jax.lax.stop_gradient(ref_box)

        logits = ContrastiveEmbed(cfg.max_text_len, name="class_head")(
            tgt, txt, attention_mask)
        return {"pred_logits": logits, "pred_boxes": ref_box}


# ---------------------------------------------------------------------------
# Inference wrapper with the PromptGenerator-facing API
# ---------------------------------------------------------------------------

class GroundingModel:
    """get_boxes(image, text) facade over the jitted GroundingDINO forward."""

    def __init__(self, model: GroundingDINO, variables: dict,
                 tokenizer=None, max_text_len: int = 64):
        self.model = model
        self.cfg = model.cfg
        self.variables = variables
        if tokenizer is None:
            from sola_tpu.models.text import HashTokenizer
            tokenizer = HashTokenizer(self.cfg.text.vocab_size,
                                      self.cfg.text.pad_token_id)
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        # variables as explicit jit args (no closure-baked constants)
        self._forward = jax.jit(
            lambda v, img, ids, mask: model.apply(v, img, ids, mask))

    def get_boxes(self, image: np.ndarray, text: str,
                  box_threshold: float = 0.2,
                  text_threshold: float = 0.25) -> list[dict]:
        """Returns [{"bbox": xyxy pixels, "phrase": str,
        "token_score": [...]}] (prompt_generator.py:133-160 semantics)."""
        h, w = image.shape[:2]
        s = self.cfg.image_size
        img = jax.image.resize(jnp.asarray(image, jnp.float32), (s, s, 3),
                               method="linear") / 255.0
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        img = (img - mean) / std
        ids, mask = self.tokenizer([text], max_len=self.max_text_len)
        out = self._forward(self.variables, img[None], jnp.asarray(ids),
                            jnp.asarray(mask))
        logits = jax.nn.sigmoid(out["pred_logits"][0])
        logits = np.asarray(jnp.where(jnp.isfinite(logits), logits, 0.0))
        boxes = np.asarray(out["pred_boxes"][0])
        n_tokens = int(mask.sum())
        keep = logits.max(axis=-1) > box_threshold
        preds = []
        for i in np.nonzero(keep)[0]:
            cx, cy, bw, bh = boxes[i]
            bbox = np.asarray([
                (cx - bw / 2) * w, (cy - bh / 2) * h,
                (cx + bw / 2) * w, (cy + bh / 2) * h,
            ], np.float32)
            token_mask = logits[i, :n_tokens] > text_threshold
            phrase = self._phrase_from_posmap(text, token_mask)
            preds.append({
                "phrase": phrase,
                "bbox": bbox,
                "token_score": logits[i, :n_tokens].tolist(),
            })
        return preds

    def _phrase_from_posmap(self, text: str, token_mask: np.ndarray) -> str:
        """Best-effort phrase reconstruction: without a subword decoder the
        hash tokenizer maps token positions 1..n-2 onto whitespace words."""
        words = text.rstrip(".").split()
        picked = [words[i - 1] for i in range(1, len(words) + 1)
                  if i < len(token_mask) and token_mask[i]]
        return " ".join(picked)


def build_gdino(ckpt_path: Optional[str] = None,
                cfg: Optional[GDINOConfig] = None, seed: int = 0):
    if ckpt_path:
        from sola_tpu.trackgen.gdino.convert import \
            build_gdino_from_checkpoint
        model, variables, _ = build_gdino_from_checkpoint(ckpt_path, cfg,
                                                          seed)
        return model, variables
    cfg = cfg or GDINOConfig()
    model = GroundingDINO(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), img, ids, mask)
    return model, variables


def load_grounding_dino(ckpt_path: Optional[str] = None,
                        cfg: Optional[GDINOConfig] = None) -> GroundingModel:
    model, variables = build_gdino(ckpt_path, cfg)
    return GroundingModel(model, variables)
