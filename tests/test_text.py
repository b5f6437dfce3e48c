"""Text encoder tests: Flax RoBERTa parity vs HF torch RobertaModel (random
tiny config — no downloads), mean pooling, hash-encoder determinism."""

import numpy as np
import pytest

import jax.numpy as jnp

from sola_tpu.models import text as T

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = T.RobertaConfig.tiny()
    hf_cfg = transformers.RobertaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        pad_token_id=cfg.pad_token_id, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps)
    torch.manual_seed(0)
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    params = T.hf_roberta_state_dict_to_params(hf.state_dict(), cfg)
    return cfg, hf, params


def test_roberta_parity(tiny_pair, rng):
    cfg, hf, params = tiny_pair
    b, l = 2, 11
    ids = rng.integers(4, cfg.vocab_size, (b, l)).astype(np.int64)
    mask = np.ones((b, l), np.int64)
    mask[0, 7:] = 0
    ids[0, 7:] = cfg.pad_token_id
    with torch.no_grad():
        ref = hf(input_ids=torch.as_tensor(ids),
                 attention_mask=torch.as_tensor(mask)).last_hidden_state.numpy()
    model = T.RobertaEncoder(cfg)
    ours = model.apply({"params": params}, jnp.asarray(ids.astype(np.int32)),
                       jnp.asarray(mask.astype(np.int32)))
    # padded positions differ (HF computes them; we don't mask them out) —
    # compare valid positions only
    np.testing.assert_allclose(np.asarray(ours)[1], ref[1], atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours)[0, :7], ref[0, :7], atol=2e-4)


def test_mean_pool_matches_reference_semantics(rng):
    hidden = rng.standard_normal((2, 5, 8), dtype=np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)
    pooled = np.asarray(T.mean_pool(jnp.asarray(hidden), jnp.asarray(mask)))
    expect0 = hidden[0, :3].mean(axis=0)
    expect1 = hidden[1].mean(axis=0)
    np.testing.assert_allclose(pooled[0], expect0, rtol=1e-5)
    np.testing.assert_allclose(pooled[1], expect1, rtol=1e-5)


def test_hash_tokenizer_deterministic():
    tok = T.HashTokenizer()
    ids1, m1 = tok(["the cat jumping off the chair", "a dog"])
    ids2, m2 = tok(["the cat jumping off the chair", "a dog"])
    assert np.array_equal(ids1, ids2)
    assert np.array_equal(m1, m2)
    assert ids1.shape[0] == 2
    # same word -> same id
    assert ids1[0][1] == ids1[0][5]  # "the" ... "the"


def test_hash_text_encoder_api():
    enc = T.HashTextEncoder(hidden_size=32, vocab_size=128)
    hidden, mask, pooled = enc.encode_batch(["the red car", "a person"])
    assert hidden.shape[0] == 2 and hidden.shape[2] == 32
    assert pooled.shape == (2, 1, 32)
    assert bool(mask[0, 0])
    hidden2, _, _ = enc.encode_batch(["the red car", "a person"])
    np.testing.assert_array_equal(np.asarray(hidden), np.asarray(hidden2))


def test_random_init_text_encoder():
    enc = T.TextEncoder.random_init()
    hidden, mask, pooled = enc.encode_batch(["hello world"])
    assert hidden.shape[0] == 1
    assert pooled.shape[1] == 1
    assert np.isfinite(np.asarray(hidden)).all()


def test_caching_text_encoder():
    from sola_tpu.models.text import CachingTextEncoder
    calls = []

    class Counting:
        def __init__(self):
            self.inner = T.HashTextEncoder(hidden_size=16, vocab_size=64)

        def encode_batch(self, texts):
            calls.append(tuple(texts))
            return self.inner.encode_batch(texts)

    enc = CachingTextEncoder(Counting())
    a1 = enc.encode_batch(["the cat", "a dog"])
    a2 = enc.encode_batch(["the cat", "a dog"])  # hit
    enc.encode_batch(["other"])
    assert len(calls) == 2
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(a1[2]), np.asarray(a2[2]))


def test_build_text_encoder_roberta_random_knob():
    """``model.text_encoder: roberta_random`` must yield the REAL Flax
    RoBERTa stack (not the hash stand-in) with the full-size large config,
    so e2e runs exercise full-size text encode without a checkpoint."""
    enc = T.build_text_encoder({"lang_token_dim": 1024,
                                "text_encoder": "roberta_random"})
    assert isinstance(enc, T.TextEncoder)
    assert enc.cfg.num_layers == 24 and enc.cfg.hidden_size == 1024
