"""Frozen text encoder: RoBERTa in Flax + mean pooling.

The reference encodes expressions with a frozen HF RoBERTa
(``sentence-transformers/all-roberta-large-v1``) and attention-mask mean
pooling (train.py:31-32,80-91; evaluator.py:84-95; inference.py:50-55). Here
the encoder is a native Flax implementation (one jit program, bf16-friendly)
with a converter from HF torch checkpoints; tokenization stays on host.

When no pretrained weights/tokenizer are available (air-gapped TPU pods, CI),
``HashTextEncoder`` provides a deterministic stand-in with the same API so
every downstream stage (train/eval/inference, tests, benches) runs unchanged.
"""

from __future__ import annotations

import dataclasses
import hashlib
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    # "roberta": positions offset past pad_token_id; "bert": plain arange
    position_style: str = "roberta"

    @classmethod
    def large(cls) -> "RobertaConfig":
        return cls()

    @classmethod
    def bert_base(cls) -> "RobertaConfig":
        """BERT-base-uncased (GroundingDINO's text encoder)."""
        return cls(vocab_size=30522, hidden_size=768, num_layers=12,
                   num_heads=12, intermediate_size=3072,
                   max_position_embeddings=512, pad_token_id=0,
                   layer_norm_eps=1e-12, position_style="bert")

    @classmethod
    def tiny(cls) -> "RobertaConfig":
        """Small config for tests."""
        return cls(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                   intermediate_size=128, max_position_embeddings=64)


def create_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """RoBERTa position ids: pad positions keep padding_idx; real tokens get
    padding_idx + cumulative index (HF ``create_position_ids_from_input_ids``)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


class RobertaLayer(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = d // h
        b, l, _ = x.shape
        q = nn.Dense(d, name="query")(x)
        k = nn.Dense(d, name="key")(x)
        v = nn.Dense(d, name="value")(x)
        q = q.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, logits.dtype))
        logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        attn_out = nn.Dense(d, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(
            x + attn_out)
        ffn = nn.Dense(cfg.intermediate_size, name="ffn_in")(x)
        ffn = jax.nn.gelu(ffn, approximate=False)
        ffn = nn.Dense(d, name="ffn_out")(ffn)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_ln")(
            x + ffn)


class RobertaEncoder(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 position_ids: Optional[jax.Array] = None) -> jax.Array:
        """attention_mask: (B, L) padding mask, or (B, L, L) full
        self-attention mask (GroundingDINO's sub-sentence blocks);
        position_ids: optional explicit positions (GDINO restarts them per
        phrase)."""
        cfg = self.cfg
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_emb")(
            input_ids)
        if position_ids is not None:
            pos_ids = position_ids
        elif cfg.position_style == "bert":
            pos_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None],
                input_ids.shape)
        else:
            pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="pos_emb")(pos_ids)
        tok_type = self.param("token_type_emb", nn.initializers.zeros,
                              (cfg.hidden_size,))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_ln")(x)
        if attention_mask.ndim == 3:
            attn_bias = jnp.where(attention_mask[:, None, :, :] > 0, 0.0,
                                  -1e30).astype(jnp.float32)
        else:
            attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                                  -1e30).astype(jnp.float32)
        for i in range(cfg.num_layers):
            x = RobertaLayer(cfg, name=f"layer_{i}")(x, attn_bias)
        return x


def mean_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Attention-mask mean pooling (train.py:86-89), clamp min 1e-9."""
    m = attention_mask.astype(hidden.dtype)[..., None]
    return jnp.sum(hidden * m, axis=1) / jnp.clip(
        jnp.sum(m, axis=1), min=1e-9)


def hf_roberta_state_dict_to_params(state, cfg: RobertaConfig) -> dict:
    """Convert an HF torch RobertaModel state_dict to RobertaEncoder params."""
    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, dtype=np.float32)

    def dense(prefix):
        return {"kernel": _np(state[f"{prefix}.weight"]).T,
                "bias": _np(state[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _np(state[f"{prefix}.weight"]),
                "bias": _np(state[f"{prefix}.bias"])}

    params = {
        "word_emb": {"embedding": _np(
            state["embeddings.word_embeddings.weight"])},
        "pos_emb": {"embedding": _np(
            state["embeddings.position_embeddings.weight"])},
        "token_type_emb": _np(
            state["embeddings.token_type_embeddings.weight"])[0],
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": dense(f"{p}.attention.self.query"),
            "key": dense(f"{p}.attention.self.key"),
            "value": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "ffn_in": dense(f"{p}.intermediate.dense"),
            "ffn_out": dense(f"{p}.output.dense"),
            "ffn_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# Text encoder front-ends
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


class HashTokenizer:
    """Deterministic whitespace/punct tokenizer hashing words into a vocab.

    Stand-in for the RoBERTa BPE tokenizer in weight-free environments; ids
    are stable across processes (sha1-based, not Python ``hash``).
    """

    def __init__(self, vocab_size: int = 50265, pad_token_id: int = 1,
                 bos_token_id: int = 0, eos_token_id: int = 2):
        self.vocab_size = vocab_size
        self.pad_token_id = pad_token_id
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "big")
        # avoid the special ids 0..3
        return 4 + h % (self.vocab_size - 4)

    def __call__(self, texts: list[str], max_len: Optional[int] = None):
        seqs = []
        for text in texts:
            words = _WORD_RE.findall(text.lower())
            ids = [self.bos_token_id] + [self._word_id(w) for w in words] + [
                self.eos_token_id]
            seqs.append(ids)
        longest = max(len(s) for s in seqs)
        if max_len is not None:
            longest = min(longest, max_len)
        input_ids = np.full((len(seqs), longest), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), longest), np.int32)
        for i, s in enumerate(seqs):
            s = s[:longest]
            input_ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return input_ids, mask


class TextEncoder:
    """Frozen text encoder facade: texts -> (lang_tokens, lang_mask, pos_tokens).

    ``lang_tokens`` is the last hidden state (b, w, d); ``pos_tokens`` is the
    mean-pooled sentence embedding (b, 1, d) used as the alignment-loss
    positive (train.py:90).
    """

    def __init__(self, cfg: RobertaConfig, params: dict,
                 tokenizer=None, max_len: int = 96):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer or HashTokenizer(cfg.vocab_size,
                                                    cfg.pad_token_id)
        self.max_len = max_len
        self.model = RobertaEncoder(cfg)
        self._forward = jax.jit(
            lambda p, ids, m: self.model.apply({"params": p}, ids, m))

    @classmethod
    def from_hf_torch(cls, state_dict, cfg: Optional[RobertaConfig] = None,
                      tokenizer=None) -> "TextEncoder":
        cfg = cfg or RobertaConfig.large()
        params = hf_roberta_state_dict_to_params(state_dict, cfg)
        return cls(cfg, params, tokenizer)

    @classmethod
    def random_init(cls, cfg: Optional[RobertaConfig] = None,
                    seed: int = 0) -> "TextEncoder":
        cfg = cfg or RobertaConfig.tiny()
        model = RobertaEncoder(cfg)
        ids = jnp.zeros((1, 4), jnp.int32)
        mask = jnp.ones((1, 4), jnp.int32)
        variables = model.init(jax.random.PRNGKey(seed), ids, mask)
        return cls(cfg, variables["params"])

    def encode_batch(self, texts: list[str]):
        input_ids, mask = self.tokenizer(texts, max_len=self.max_len)
        hidden = self._forward(self.params, jnp.asarray(input_ids),
                               jnp.asarray(mask))
        pooled = mean_pool(hidden, jnp.asarray(mask))[:, None, :]
        return hidden, jnp.asarray(mask, bool), pooled


class HashTextEncoder:
    """Weight-free deterministic text embedder with the TextEncoder API.

    Embeds each token id via a fixed Gaussian table so tests and benches get
    stable, text-dependent embeddings without any checkpoint.
    """

    def __init__(self, hidden_size: int = 1024, vocab_size: int = 4096,
                 seed: int = 0, max_len: int = 96):
        self.hidden_size = hidden_size
        self.tokenizer = HashTokenizer(vocab_size)
        self.max_len = max_len
        key = jax.random.PRNGKey(seed)
        self.table = jax.random.normal(key, (vocab_size, hidden_size),
                                       jnp.float32)

    def encode_batch(self, texts: list[str]):
        input_ids, mask = self.tokenizer(texts, max_len=self.max_len)
        hidden = self.table[jnp.asarray(input_ids) % self.table.shape[0]]
        hidden = hidden * jnp.asarray(mask, jnp.float32)[..., None]
        pooled = mean_pool(hidden, jnp.asarray(mask))[:, None, :]
        return hidden, jnp.asarray(mask, bool), pooled


class CachingTextEncoder:
    """Per-expression memoizing wrapper for a frozen text encoder.

    The reference re-runs RoBERTa on every batch every epoch
    (train.py:80-91) even though the encoder is frozen. Here each UNIQUE
    expression is encoded once and its rows stay resident on device; a
    steady-state batch costs zero encoder FLOPs and zero host<->device
    bytes regardless of batch composition (a batch-tuple-keyed cache would
    miss on every reshuffled epoch). Rows are padded to the encoder's
    ``max_len`` so any mix of cached rows stacks into one static shape —
    the mask-aware model ignores the padded words (parity-tested).

    ``encode_rows`` returns per-sample device-row tuples for in-program
    stacking by the train/eval steps (the same pattern as the object-token
    device cache); ``encode_batch`` keeps the stacked-array API.
    """

    def __init__(self, inner, max_entries: int = 100_000):
        self.inner = inner
        self.max_entries = max_entries
        self.max_len = int(getattr(inner, "max_len", 96))
        self._rows: dict = {}       # text -> (hidden, mask, pooled) rows
        self._cache = self._rows    # back-compat alias

    def _pad_rows(self, hidden, mask, pooled):
        import jax.numpy as jnp
        w = hidden.shape[1]
        if w > self.max_len:  # encoder without a max_len cap: keep rows
            hidden = hidden[:, :self.max_len]  # one static width anyway
            mask = mask[:, :self.max_len]
            w = self.max_len
        if w < self.max_len:
            hidden = jnp.pad(hidden, ((0, 0), (0, self.max_len - w),
                                      (0, 0)))
            mask = jnp.pad(jnp.asarray(mask, bool),
                           ((0, 0), (0, self.max_len - w)))
        return hidden, jnp.asarray(mask, bool), pooled

    def encode_rows(self, texts: list[str]):
        """(hidden_rows, mask_rows, pos_rows) — tuples of per-sample DEVICE
        arrays of static shapes ((max_len, d), (max_len,), (1, d))."""
        unseen = [t for t in dict.fromkeys(texts) if t not in self._rows]
        if unseen:
            hidden, mask, pooled = self._pad_rows(
                *self.inner.encode_batch(unseen))
            for i, t in enumerate(unseen):
                if len(self._rows) < self.max_entries:
                    self._rows[t] = (hidden[i], mask[i], pooled[i])
        rows = [self._rows.get(t) for t in texts]
        if any(r is None for r in rows):  # over-capacity: encode directly
            hidden, mask, pooled = self._pad_rows(
                *self.inner.encode_batch(texts))
            return (tuple(hidden[i] for i in range(len(texts))),
                    tuple(mask[i] for i in range(len(texts))),
                    tuple(pooled[i] for i in range(len(texts))))
        return (tuple(r[0] for r in rows), tuple(r[1] for r in rows),
                tuple(r[2] for r in rows))

    def encode_batch(self, texts: list[str]):
        import jax.numpy as jnp
        hidden, mask, pooled = self.encode_rows(texts)
        return (jnp.stack(hidden), jnp.stack(mask), jnp.stack(pooled))


def build_text_encoder(model_configs: dict) -> "TextEncoder | HashTextEncoder":
    """Build the configured text encoder.

    Honors ``roberta_version`` (configs/mevis/default.yaml:13) when the HF
    checkpoint + tokenizer are available locally; otherwise falls back to the
    deterministic hash encoder so air-gapped runs still work end-to-end.

    ``text_encoder: roberta_random`` forces the REAL 24-layer Flax RoBERTa
    (random init, hash tokenizer): the full text-encode compute runs
    in-loop even with no checkpoint on disk — the e2e configuration the
    quality pipeline uses to exercise full-size text encode
    (train.py:31-32,80-91 keeps RoBERTa in the loop at every step).
    """
    version = model_configs.get("roberta_version",
                                "sentence-transformers/all-roberta-large-v1")
    lang_dim = model_configs.get("lang_token_dim", 1024)
    if model_configs.get("text_encoder") == "roberta_random":
        return TextEncoder.random_init(RobertaConfig.large())
    try:
        import os

        # hard-offline: without these, transformers probes the hub with
        # minutes of retries in air-gapped environments even when
        # local_files_only is set (PEFT adapter_config HEAD requests)
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        import torch  # noqa: F401
        from transformers import AutoModel, AutoTokenizer
        hf_model = AutoModel.from_pretrained(version, local_files_only=True)
        hf_tok = AutoTokenizer.from_pretrained(version, local_files_only=True)

        def tokenize(texts, max_len=None):
            out = hf_tok(texts, padding="longest", truncation=max_len is not None,
                         max_length=max_len, return_tensors="np")
            return (out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32))

        hf_cfg = hf_model.config
        cfg = RobertaConfig(
            vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            pad_token_id=hf_cfg.pad_token_id)
        return TextEncoder.from_hf_torch(hf_model.state_dict(), cfg,
                                         tokenizer=tokenize)
    except Exception:
        return HashTextEncoder(hidden_size=lang_dim)
