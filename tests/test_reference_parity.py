"""End-to-end numeric parity against the ACTUAL reference code.

Every other parity test in this repo validates against oracles written for
the tests (tests/torch_oracle.py & co). These tests instead run the
reference implementation itself — /root/reference/module/module.py,
tools/loss.py, dataloader.py, evaluator.py — on shared weights and shared
on-disk artifacts, and diff:

  * score_map / score_tokens of the full-size model (fp32, atol 1e-4),
    on exact shapes AND ragged-vs-padded inputs,
  * the converter naming via ``load_state_dict(strict=True)``,
  * the alignment loss,
  * the reference dataloader's per-sample tensors vs ours,
  * selection decisions, confusion counts, derived metrics, and the
    per-expression J/F/JF entries of the eval JSON artifacts.

Reference match: module/module.py:130-162, tools/loss.py:4-58,
dataloader.py:87-200, evaluator.py:54-247.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from sola_tpu.data import synthetic                       # noqa: E402
from sola_tpu.models.convert import params_to_torch_state_dict  # noqa: E402
from sola_tpu.models.selection import (SelectionConfig,   # noqa: E402
                                       SelectionModel)
from sola_tpu.models.text import HashTextEncoder          # noqa: E402
from tests import reference_oracle                        # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_oracle.reference_available(),
    reason="/root/reference not present")

# the reference's shipped full-size configuration (configs/mevis/default.yaml)
FULL_CFG = {
    "object_token_dim": 256,
    "lang_token_dim": 1024,
    "n_layers": 2,
    "max_temporal_length": 100,
    "n_negative": 32,
    "dropout_p": 0.2,
    "norm_type": "group",
    "n_groups": 8,
    "n_groups_module": 8,
}


@pytest.fixture(scope="module")
def full_model_pair():
    """(jax variables, reference torch model) sharing one set of random
    full-size weights, linked through the exporter."""
    cfg = SelectionConfig.from_dict(FULL_CFG)
    model = SelectionModel(cfg)
    import jax
    variables = model.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, 2, 8, cfg.object_token_dim), jnp.float32),
        jnp.zeros((1, 3, cfg.lang_token_dim), jnp.float32))
    state_dict = params_to_torch_state_dict(
        {"params": variables["params"], "buffers": variables["buffers"]},
        n_layers=cfg.n_layers)
    # strict=True: every reference param/buffer name must be produced, with
    # the right shape — the converter surface is verified by torch itself
    ref_model = reference_oracle.build_reference_model(FULL_CFG, state_dict)
    return cfg, model, variables, ref_model


def test_forward_parity_full_size(full_model_pair, rng):
    cfg, model, variables, ref_model = full_model_pair
    b, n, t, w = 1, 6, 37, 9  # odd t exercises the stride-2 conv chain
    obj = rng.standard_normal((b, n, t, cfg.object_token_dim),
                              dtype=np.float32)
    lang = rng.standard_normal((b, w, cfg.lang_token_dim), dtype=np.float32)
    with torch.no_grad():
        ref_map, ref_tokens = ref_model(torch.as_tensor(obj),
                                        torch.as_tensor(lang))
    out_map, out_tokens = model.apply(variables, jnp.asarray(obj),
                                      jnp.asarray(lang))
    np.testing.assert_allclose(np.asarray(out_map), ref_map.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_tokens), ref_tokens.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_forward_parity_ragged_vs_padded(full_model_pair, rng):
    """The padded static-shape program must reproduce the reference run on
    the real ragged inputs (the production batching contract)."""
    cfg, model, variables, ref_model = full_model_pair
    n, t, w = 5, 29, 7
    obj = rng.standard_normal((1, n, t, cfg.object_token_dim),
                              dtype=np.float32)
    lang = rng.standard_normal((1, w, cfg.lang_token_dim), dtype=np.float32)
    with torch.no_grad():
        ref_map, _ = ref_model(torch.as_tensor(obj), torch.as_tensor(lang))

    obj_pad = rng.standard_normal(
        (1, n + 3, t + 19, cfg.object_token_dim), dtype=np.float32) * 5
    obj_pad[:, :n, :t] = obj
    lang_pad = rng.standard_normal(
        (1, w + 6, cfg.lang_token_dim), dtype=np.float32) * 5
    lang_pad[:, :w] = lang
    track_mask = np.zeros((1, n + 3), bool)
    track_mask[:, :n] = True
    lang_mask = np.zeros((1, w + 6), bool)
    lang_mask[:, :w] = True
    out_map, _ = model.apply(
        variables, jnp.asarray(obj_pad), jnp.asarray(lang_pad),
        track_mask=jnp.asarray(track_mask),
        frame_lengths=jnp.array([t]), lang_mask=jnp.asarray(lang_mask))
    np.testing.assert_allclose(np.asarray(out_map)[:, :n],
                               ref_map.numpy(), atol=1e-4, rtol=1e-4)


def test_alignment_loss_parity(rng):
    """Our alignment loss vs the reference AlignmentLoss class itself."""
    from sola_tpu.train.loss import alignment_loss

    ref = reference_oracle.load_reference()
    b, n, m, d = 2, 6, 8, 32
    toks = rng.standard_normal((b, n, d), dtype=np.float32)
    labels = (rng.random((b, n)) > 0.5).astype(np.float32)
    pos = rng.standard_normal((b, 1, d), dtype=np.float32)
    neg = rng.standard_normal((b, m, d), dtype=np.float32)
    loss_fn = ref["loss"].AlignmentLoss(positive_weight=1.5,
                                        temperature=0.07)
    with torch.no_grad():
        expected = loss_fn(
            object_tokens=torch.as_tensor(toks),
            labels=torch.as_tensor(labels),
            pos_tokens=torch.as_tensor(pos),
            neg_tokens=torch.as_tensor(neg)).item()
    got = float(alignment_loss(
        jnp.asarray(toks), jnp.asarray(labels), jnp.asarray(pos),
        jnp.asarray(neg), temperature=0.07, positive_weight=1.5))
    assert abs(got - expected) < 1e-5


@pytest.fixture(scope="module")
def eval_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("refparity")
    ds = synthetic.generate(str(root), n_videos=2, n_frames=24, n_objects=2,
                            n_distractors=3, seed=11)
    configs = {
        "exp_name": "refparity",
        "model": dict(FULL_CFG),
        "train": {
            "n_epochs": 1,
            "pred_threshold": 0.5,
            "temperature": 0.07,
            "alignment_weight": 0.3,
            "lr": 5e-6,
            "lr_factor": 0.5,
            "lr_patience": 5,
            "grad_clip_norm": 1.0,
            "positive_metric": "iou",
            "positive_threshold": 0.7,
            "positive_weight": 1.5,
        },
        "dataset": ds["configs"],
        "eval": {"pred_threshold": 0.5},
        "results": {
            "output_dir": str(root / "TRAIN"),
            "eval_output_dir": str(root / "EVAL"),
            "test_output_dir": str(root / "INFER"),
        },
    }
    text_encoder = HashTextEncoder(hidden_size=FULL_CFG["lang_token_dim"],
                                   vocab_size=512, seed=3)
    return {"configs": configs, "text": text_encoder, "root": root}


def test_dataloader_parity(eval_workspace):
    """Reference AlignDataset vs our dataset on the same artifacts: same
    samples, same token tensors, same labels, same ids in the same order."""
    from sola_tpu.data.dataset import get_loader_dict

    ref = reference_oracle.load_reference()
    cfgs = eval_workspace["configs"]["dataset"]
    ds_cfg = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in cfgs.items()}
    ds_cfg["num_workers"] = 0
    ref_loader = ref["dataloader"].get_loader_dict(
        ds_cfg, only_eval=True)["valid"]
    our_loader = get_loader_dict(cfgs, only_eval=True)["valid"]

    ref_batches = {(b["video_id"][0], b["expression_id"][0]): b
                   for b in ref_loader}
    count = 0
    for raw in our_loader:
        for i, video_id in enumerate(raw["video_id"]):
            key = (video_id, raw["expression_id"][i])
            rb = ref_batches[key]
            n = int(raw["n_tracks"][i])
            t = int(raw["frame_lengths"][i])
            assert n == rb["object_tokens"].shape[1]
            assert t == rb["object_tokens"].shape[2]
            np.testing.assert_allclose(
                np.asarray(raw["object_tokens"])[i, :n, :t],
                rb["object_tokens"][0].numpy(), atol=1e-6, err_msg=str(key))
            for metric in ("iou", "recall", "precision"):
                np.testing.assert_allclose(
                    np.asarray(raw["labels"][metric])[i, :n],
                    rb["labels"][metric][0].numpy(), atol=1e-7)
            assert list(raw["sam2_anno_id"][i]) == list(
                rb["sam2_anno_id"][0])
            assert list(raw["prompt_type"][i]) == list(rb["prompt_type"][0])
            assert raw["expression"][i] == rb["expression"][0]
            assert list(raw["anno_ids"][i]) == list(rb["anno_ids"][0])
            count += 1
    assert count == len(ref_batches) == 4  # 2 videos x 2 expressions


def test_evaluator_parity(eval_workspace):
    """Both evaluators, same weights, same artifacts, same text encoder:
    identical selection decisions, confusion counts, derived metrics, and
    J&F JSON numbers (reference masklet merging + J/F code as oracle)."""
    import json

    import jax

    from sola_tpu.eval.evaluator import Evaluator

    configs = eval_workspace["configs"]
    text = eval_workspace["text"]
    cfg = SelectionConfig.from_dict(configs["model"])
    model = SelectionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(42),
        jnp.zeros((1, 2, 8, cfg.object_token_dim), jnp.float32),
        jnp.zeros((1, 3, cfg.lang_token_dim), jnp.float32))
    state_dict = params_to_torch_state_dict(
        {"params": variables["params"], "buffers": variables["buffers"]},
        n_layers=cfg.n_layers)

    eval_dir = str(eval_workspace["root"] / "EVAL" / "ours")
    ours = Evaluator(variables["params"], variables["buffers"], configs,
                     eval_weight_epoch=1, text_encoder=text,
                     eval_output_dir=eval_dir)
    our_metrics = ours.evaluate()

    ref_metrics, ref_JF, ref_pred = reference_oracle.run_reference_eval(
        configs, state_dict, text)

    # selection decisions + scores per (video, expression)
    for video_id, exprs in ref_pred.items():
        for expression_id, info in exprs.items():
            mine = ours.pred_dict[video_id][expression_id]
            np.testing.assert_array_equal(
                mine["pred"], info["pred"],
                err_msg=f"decisions diverge at {video_id}/{expression_id}")
            np.testing.assert_allclose(
                mine["pred_score"], info["pred_score"], atol=1e-4,
                err_msg=f"scores diverge at {video_id}/{expression_id}")

    # confusion counts exact; derived metrics to float tolerance
    for k in ("tp", "fp", "tn", "fn"):
        assert our_metrics[k] == ref_metrics[k], k
    for k in ("accuracy", "precision", "recall", "f1"):
        assert abs(our_metrics[k] - ref_metrics[k]) < 1e-9, k
    # alignment loss shares the definition; BCE intentionally diverges
    # (reference evals BCE over sigmoided scores, DIVERGENCES.md #1)
    assert abs(our_metrics["alignment_loss"]
               - ref_metrics["alignment_loss"]) < 1e-4

    # J&F: per-expression entries and means from the committed JSON artifact
    jf_path = os.path.join(
        eval_dir, f"{configs['dataset']['valid']['data_type']}"
        f"_JF_metrics_1epoch.json")
    our_JF = json.load(open(jf_path))
    assert set(our_JF) == set(ref_JF)
    for video_id in ref_JF:
        assert set(our_JF[video_id]) == set(ref_JF[video_id])
        for expression_id, entry in ref_JF[video_id].items():
            mine = our_JF[video_id][expression_id]
            assert mine["expression"] == entry["expression"]
            for k in ("J", "F", "JF"):
                assert abs(mine[k] - entry[k]) < 1e-6, (
                    f"{k} diverges at {video_id}/{expression_id}: "
                    f"{mine[k]} vs {entry[k]}")
    for k in ("mean_J", "mean_F", "mean_JF"):
        assert abs(our_metrics[k] - ref_metrics[k]) < 1e-6, k


# config fuzz: the default-config parity above pins ONE point in config
# space; these sweep the config surface the reference derives shapes from
# (conv chain dims, PE width, head split, group counts, negative-token
# count) so a misreading that happens to cancel at the shipped values
# cannot hide. Dims are small to keep CPU runtime low; constraints are the
# reference's own: lang_token_dim % 8 == 0 (fixed num_heads=8),
# lang_token_dim % n_groups{,_module} == 0, (2*object_token_dim) % n_groups
# == 0, lang even (sin/cos PE halves).
FUZZ_CFGS = [
    # (cfg overrides, b, n, t, w)
    (dict(object_token_dim=32, lang_token_dim=64, n_layers=1,
          max_temporal_length=50, n_negative=4, n_groups=4,
          n_groups_module=8), 1, 3, 17, 5),
    (dict(object_token_dim=48, lang_token_dim=96, n_layers=3,
          max_temporal_length=77, n_negative=16, n_groups=8,
          n_groups_module=4), 1, 7, 41, 11),
    (dict(object_token_dim=64, lang_token_dim=128, n_layers=2,
          max_temporal_length=100, n_negative=1, n_groups=2,
          n_groups_module=16), 2, 4, 8, 3),
    (dict(object_token_dim=16, lang_token_dim=32, n_layers=2,
          max_temporal_length=13, n_negative=32, n_groups=1,
          n_groups_module=1), 1, 1, 1, 1),  # degenerate single everything
]


@pytest.mark.parametrize("overrides,b,n,t,w",
                         FUZZ_CFGS,
                         ids=[f"fuzz{i}" for i in range(len(FUZZ_CFGS))])
def test_forward_parity_config_fuzz(overrides, b, n, t, w, rng):
    import jax

    cfg_dict = dict(FULL_CFG)
    cfg_dict.update(overrides)
    cfg = SelectionConfig.from_dict(cfg_dict)
    model = SelectionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(11),
        jnp.zeros((1, 2, 8, cfg.object_token_dim), jnp.float32),
        jnp.zeros((1, 3, cfg.lang_token_dim), jnp.float32))
    state_dict = params_to_torch_state_dict(
        {"params": variables["params"], "buffers": variables["buffers"]},
        n_layers=cfg.n_layers)
    ref_model = reference_oracle.build_reference_model(cfg_dict, state_dict)

    obj = rng.standard_normal((b, n, t, cfg.object_token_dim),
                              dtype=np.float32)
    lang = rng.standard_normal((b, w, cfg.lang_token_dim), dtype=np.float32)
    with torch.no_grad():
        ref_map, ref_tokens = ref_model(torch.as_tensor(obj),
                                        torch.as_tensor(lang))
    out_map, out_tokens = model.apply(variables, jnp.asarray(obj),
                                      jnp.asarray(lang))
    np.testing.assert_allclose(np.asarray(out_map), ref_map.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_tokens), ref_tokens.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_gradient_parity_vs_reference():
    """Full training-step GRADIENT parity against the reference's own
    backward: d(total loss)/d(param) for every parameter, through the
    name/layout mapping of the exporter. Exercises the WS-conv, GroupNorm,
    and attention backwards plus the loss's argmax hard-negative masking
    (train.py:98-125, tools/loss.py:14-58). Dropout off on both sides
    (gradient parity is only defined deterministically)."""
    import jax

    from sola_tpu.train import loss as loss_lib

    cfg_dict = dict(FULL_CFG)
    cfg_dict.update(object_token_dim=32, lang_token_dim=64, n_layers=2,
                    n_negative=8, n_groups=4, n_groups_module=8,
                    dropout_p=0.0)
    cfg = SelectionConfig.from_dict(cfg_dict)
    model = SelectionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(21),
        jnp.zeros((1, 2, 8, cfg.object_token_dim), jnp.float32),
        jnp.zeros((1, 3, cfg.lang_token_dim), jnp.float32))
    state_dict = params_to_torch_state_dict(
        {"params": variables["params"], "buffers": variables["buffers"]},
        n_layers=cfg.n_layers)
    ref_model = reference_oracle.build_reference_model(cfg_dict, state_dict)
    # eval(): the reference attention hardcodes train-only SDPA dropout 0.1
    # (tools/attention.py:71) independent of configs' dropout_p — eval mode
    # is the deterministic path; torch still builds the graph and backprops
    ref_model.eval()

    rng = np.random.default_rng(99)
    b, n, t, w = 1, 5, 23, 6
    obj = rng.standard_normal((b, n, t, cfg.object_token_dim),
                              dtype=np.float32)
    lang = rng.standard_normal((b, w, cfg.lang_token_dim), dtype=np.float32)
    pos = rng.standard_normal((b, 1, cfg.lang_token_dim), dtype=np.float32)
    labels = np.array([[1.0, 0.0, 1.0, 0.0, 0.0]], np.float32)
    positive_weight, temperature, alignment_weight = 1.5, 0.07, 0.3

    # ---- reference backward (train.py:96-117) ----
    ref = reference_oracle.load_reference()
    align_fn = ref["loss"].AlignmentLoss(positive_weight=positive_weight,
                                         temperature=temperature)
    obj_t = torch.as_tensor(obj)
    lang_t = torch.as_tensor(lang)
    labels_t = torch.as_tensor(labels)
    score_logits_t, score_tokens_t = ref_model(obj_t, lang_t)
    weight = torch.ones_like(labels_t)
    weight[labels_t > 0] = positive_weight
    bce_t = torch.nn.functional.binary_cross_entropy_with_logits(
        input=score_logits_t, target=labels_t, weight=weight)
    neg_t = ref_model.negative_token.weight.clone().unsqueeze(0)
    align_t = align_fn(object_tokens=score_tokens_t, labels=labels_t,
                       pos_tokens=torch.as_tensor(pos), neg_tokens=neg_t)
    total_t = bce_t + alignment_weight * align_t
    total_t.backward()
    ref_grads = {name: p.grad.detach().numpy()
                 for name, p in ref_model.named_parameters()
                 if p.grad is not None}

    # ---- our backward (train/loop.py loss_fn) ----
    def loss_fn(params):
        score_logits, score_tokens = model.apply(
            {"params": params, "buffers": variables["buffers"]},
            jnp.asarray(obj), jnp.asarray(lang), deterministic=True)
        neg = jnp.broadcast_to(params["negative_token"][None],
                               (b,) + params["negative_token"].shape)
        loss, _ = loss_lib.total_loss(
            score_logits, score_tokens, jnp.asarray(labels),
            jnp.asarray(pos), neg, temperature=temperature,
            positive_weight=positive_weight,
            alignment_weight=alignment_weight)
        return loss

    our_loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(our_loss), float(total_t.detach()),
                               atol=1e-5, rtol=1e-5)

    # grads transform exactly like params under the exporter's pure
    # rename/transpose mapping; buffers carry no grads (skip them)
    grad_sd = params_to_torch_state_dict(
        {"params": grads, "buffers": variables["buffers"]},
        n_layers=cfg.n_layers)
    compared = 0
    for name, ref_g in ref_grads.items():
        ours = np.asarray(grad_sd[name])
        np.testing.assert_allclose(
            ours, ref_g, atol=2e-5, rtol=1e-3,
            err_msg=f"gradient diverges at {name}")
        compared += 1
    assert compared == len(ref_grads) and compared >= 20


def test_reference_evaluator_class_end_to_end(eval_workspace, tmp_path):
    """The reference's OWN Evaluator class (evaluator.py:54-247) runs
    verbatim — its roberta replaced by a hash-backed stand-in emitting
    exactly our HashTextEncoder's embeddings — and its dumped
    {metrics,JF_metrics} JSONs are diffed against our evaluator's. Unlike
    test_evaluator_parity (whose reference side is a transcribed loop in
    reference_oracle.py), here the loop, pooling, thresholding, masklet
    merging, J/F, and JSON dumps are all the reference's own code."""
    import json

    import jax

    from sola_tpu.eval.evaluator import Evaluator as OurEvaluator

    configs = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in eval_workspace["configs"].items()}
    text = eval_workspace["text"]
    cfg = SelectionConfig.from_dict(configs["model"])
    model = SelectionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(17),
        jnp.zeros((1, 2, 8, cfg.object_token_dim), jnp.float32),
        jnp.zeros((1, 3, cfg.lang_token_dim), jnp.float32))
    state_dict = params_to_torch_state_dict(
        {"params": variables["params"], "buffers": variables["buffers"]},
        n_layers=cfg.n_layers)

    our_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    our_dir.mkdir()
    ref_dir.mkdir()

    ours = OurEvaluator(variables["params"], variables["buffers"], configs,
                        eval_weight_epoch=3, text_encoder=text,
                        eval_output_dir=str(our_dir))
    ours.evaluate()

    ref = reference_oracle.load_reference()
    ref_model = reference_oracle.build_reference_model(configs["model"],
                                                       state_dict)
    ds_cfg = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in configs["dataset"].items()}
    ds_cfg["num_workers"] = 0
    ref_configs = dict(configs)
    ref_configs["model"] = dict(
        configs["model"],
        roberta_version="sentence-transformers/all-roberta-large-v1")
    ref_configs["dataset"] = ds_cfg
    ref_configs["results"] = dict(configs["results"],
                                  eval_output_dir=str(ref_dir))
    restore = reference_oracle.install_fake_roberta(text)
    try:
        import torch as _torch
        evaluator = ref["evaluator"].Evaluator(
            model=ref_model, configs=ref_configs, eval_weight_epoch=3,
            device=_torch.device("cpu"))
        evaluator.evaluate()
    finally:
        restore()

    data_type = configs["dataset"]["valid"]["data_type"]
    with open(our_dir / f"{data_type}_JF_metrics_3epoch.json") as f:
        our_JF = json.load(f)
    with open(ref_dir / f"{data_type}_JF_metrics_3epoch.json") as f:
        ref_JF = json.load(f)
    assert set(our_JF) == set(ref_JF) and ref_JF
    for video_id in ref_JF:
        assert set(our_JF[video_id]) == set(ref_JF[video_id])
        for expression_id, entry in ref_JF[video_id].items():
            mine = our_JF[video_id][expression_id]
            assert mine["expression"] == entry["expression"]
            for k in ("J", "F", "JF"):
                assert abs(mine[k] - entry[k]) < 1e-6, (
                    video_id, expression_id, k, mine[k], entry[k])

    with open(our_dir / f"{data_type}_metrics_3epoch.json") as f:
        our_metrics = json.load(f)
    with open(ref_dir / f"{data_type}_metrics_3epoch.json") as f:
        ref_metrics = json.load(f)
    for k in ("tp", "fp", "tn", "fn"):
        assert our_metrics[k] == ref_metrics[k], k
    for k in ("accuracy", "precision", "recall", "f1",
              "mean_J", "mean_F", "mean_JF"):
        assert abs(our_metrics[k] - ref_metrics[k]) < 1e-5, (
            k, our_metrics[k], ref_metrics[k])
    # fp32 accumulation over the full alignment matrix: relative tolerance
    assert abs(our_metrics["alignment_loss"]
               - ref_metrics["alignment_loss"]) < 1e-4 * max(
                   1.0, abs(ref_metrics["alignment_loss"]))
