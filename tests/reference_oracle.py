"""Bridge to the ACTUAL reference implementation at /root/reference.

Unlike tests/torch_oracle.py (a spec re-derivation), this imports and runs
the reference's own torch code — module/module.py, tools/loss.py,
dataloader.py, evaluator.py — as the parity oracle, closing the
"same-author oracle" gap: an implementation and an oracle written by the
same hand can share a misreading; the reference itself cannot.

Environment shims (documented, minimal):
  * pycocotools is absent in this image; ``dataloader.py`` imports
    ``pycocotools.mask`` only for RLE decode. We back that import with
    sola_tpu.core.rle, which is golden-vector tested against the published
    COCO RLE format — both sides of the parity diff then share the decoder,
    so mask bits are identical by construction and every downstream number
    (merging, J&F) is a true comparison of the two pipelines.
  * The reference Evaluator constructor downloads RoBERTa
    (evaluator.py:30-33) — impossible with zero egress — so
    ``run_reference_eval`` replicates its loop (evaluator.py:54-247)
    verbatim with the language tensors produced by the SAME text encoder
    the JAX side uses, and calls the reference's own ``compute_J`` /
    ``compute_F`` / dataset masklet accessors for everything mask-related.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, "module"))


_loaded: dict = {}


def load_reference():
    """Import the reference packages (module/, tools/, dataloader,
    evaluator) with the pycocotools shim installed. Cached."""
    if _loaded:
        return _loaded
    if "pycocotools" not in sys.modules:
        from sola_tpu.core import rle as _rle

        def _decode(r):
            return _rle.decode(r)

        def _encode(arr):
            return _rle.encode(np.asarray(arr))

        mask_mod = types.ModuleType("pycocotools.mask")
        mask_mod.decode = _decode
        mask_mod.encode = _encode
        mask_mod.area = _rle.area
        pkg = types.ModuleType("pycocotools")
        pkg.mask = mask_mod
        sys.modules["pycocotools"] = pkg
        sys.modules["pycocotools.mask"] = mask_mod
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import module.module as ref_module          # noqa: E402
    import tools.loss as ref_loss               # noqa: E402
    import dataloader as ref_dataloader         # noqa: E402
    import evaluator as ref_evaluator           # noqa: E402
    _loaded.update(module=ref_module, loss=ref_loss,
                   dataloader=ref_dataloader, evaluator=ref_evaluator)
    return _loaded


def build_reference_model(model_cfg: dict, state_dict: dict):
    """Instantiate the reference LanguageAlignedTrackSelectionModule and load
    a state_dict exported from the JAX params (strict=True: any naming or
    shape drift in the converter fails loudly)."""
    import torch

    ref = load_reference()
    model = ref["module"].LanguageAlignedTrackSelectionModule(model_cfg)
    tensors = {k: torch.as_tensor(np.asarray(v)) for k, v in
               state_dict.items()}
    model.load_state_dict(tensors, strict=True)
    model.eval()
    return model


def run_reference_eval(configs: dict, state_dict: dict, text_encoder):
    """The reference evaluation loop (evaluator.py:54-225) run with the
    reference's own model / dataset / J&F code on this machine.

    Returns (metrics, JF_dict, pred_dict) with the reference's dict schema.
    The roberta block (evaluator.py:84-97) is replaced by ``text_encoder``
    outputs trimmed to valid words — the same embeddings the JAX evaluator
    consumes, so any output difference is implementation, not input.
    """
    import torch

    ref = load_reference()
    model_cfg = dict(configs["model"])
    model = build_reference_model(model_cfg, state_dict)

    ds_cfg = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in configs["dataset"].items()}
    ds_cfg["num_workers"] = 0  # in-process workers: deterministic + no fork
    loader_dict = ref["dataloader"].get_loader_dict(ds_cfg, only_eval=True)

    train_cfg = configs["train"]
    alignment_loss_fn = ref["loss"].AlignmentLoss(
        positive_weight=train_cfg["positive_weight"],
        temperature=train_cfg["temperature"])
    pred_threshold = configs["eval"]["pred_threshold"]

    metrics = {
        "total_loss": [], "bce_loss": [], "alignment_loss": [],
        "tp": 0, "fp": 0, "tn": 0, "fn": 0,
        "tp_score": [], "fp_score": [], "tn_score": [], "fn_score": [],
    }
    pred_dict: dict = {}
    with torch.no_grad():
        for batch in loader_dict["valid"]:
            object_tokens = batch["object_tokens"]
            labels = (batch["labels"][train_cfg["positive_metric"]]
                      > train_cfg["positive_threshold"]).float()

            # evaluator.py:84-97 with the shared encoder instead of roberta
            hidden, mask, pooled = text_encoder.encode_batch(
                batch["expression"])
            n_words = int(np.asarray(mask)[0].sum())
            lang_tokens = torch.as_tensor(
                np.asarray(hidden[:, :n_words], np.float32))
            pos_tokens = torch.as_tensor(np.asarray(pooled, np.float32))
            neg_tokens = model.negative_token.weight.clone().unsqueeze(
                0).repeat(lang_tokens.shape[0], 1, 1)

            pred_score, score_tokens = model(object_tokens, lang_tokens)
            pred_score = torch.sigmoid(pred_score)
            pred = (pred_score > pred_threshold).float()

            weight = torch.ones_like(labels)
            weight[labels == 1] = train_cfg["positive_weight"]
            bce_loss = torch.nn.functional.binary_cross_entropy_with_logits(
                input=pred_score, target=labels, weight=weight)
            alignment_loss = alignment_loss_fn(
                object_tokens=score_tokens, labels=labels,
                pos_tokens=pos_tokens, neg_tokens=neg_tokens)
            loss = bce_loss + alignment_loss * train_cfg["alignment_weight"]

            metrics["total_loss"].append(loss.item())
            metrics["bce_loss"].append(bce_loss.item())
            metrics["alignment_loss"].append(alignment_loss.item())
            metrics["tp"] += torch.sum((pred == 1) & (labels == 1)).item()
            metrics["fp"] += torch.sum((pred == 1) & (labels == 0)).item()
            metrics["fn"] += torch.sum((pred == 0) & (labels == 1)).item()
            metrics["tn"] += torch.sum((pred == 0) & (labels == 0)).item()
            for key, p, l in (("tp_score", 1, 1), ("fp_score", 1, 0),
                              ("tn_score", 0, 0), ("fn_score", 0, 1)):
                metrics[key] += pred_score[
                    (pred == p) & (labels == l)].cpu().numpy().tolist()

            video_id = batch["video_id"][0]
            expression_id = batch["expression_id"][0]
            pred_dict.setdefault(video_id, {})[expression_id] = {
                "expression": batch["expression"][0],
                "anno_ids": batch["anno_ids"][0],
                "pred": pred.cpu().numpy()[0],
                "pred_score": pred_score.cpu().numpy()[0],
                "root_type": batch["root_type"][0],
                "prompt_type": batch["prompt_type"][0],
                "sam2_anno_id": batch["sam2_anno_id"][0],
            }

    metrics["total_loss"] = float(np.mean(metrics["total_loss"]))
    metrics["bce_loss"] = float(np.mean(metrics["bce_loss"]))
    metrics["alignment_loss"] = float(np.mean(metrics["alignment_loss"]))
    denom = (metrics["tp"] + metrics["tn"] + metrics["fp"] + metrics["fn"])
    metrics["accuracy"] = (metrics["tp"] + metrics["tn"]) / denom
    metrics["precision"] = metrics["tp"] / (
        metrics["tp"] + metrics["fp"] + 1e-6)
    metrics["recall"] = metrics["tp"] / (
        metrics["tp"] + metrics["fn"] + 1e-6)
    metrics["f1"] = 2 * metrics["precision"] * metrics["recall"] / (
        metrics["precision"] + metrics["recall"] + 1e-6)

    # compute_JF_metrics (evaluator.py:174-225) with the reference's own
    # dataset masklet accessors and J/F functions
    RefEvaluator = ref["evaluator"].Evaluator
    dataset = loader_dict["valid"].dataset
    JF_dict: dict = {}
    Js, Fs, JFs = [], [], []
    for video_id in pred_dict:
        JF_dict[video_id] = {}
        dataset.set_video(video_id)
        for expression_id, pred_info in pred_dict[video_id].items():
            gt_masklet = dataset.get_gt_masklet(video_id, expression_id)
            pred_masklet = dataset.get_sam2_masklet(
                video_id=video_id, expression_id=expression_id,
                preds=pred_info["pred"], root_types=pred_info["root_type"],
                prompt_types=pred_info["prompt_type"],
                sam2_anno_ids=pred_info["sam2_anno_id"])
            if pred_masklet is None:
                J = F = JF = 0.0
            else:
                gt_t = torch.from_numpy(np.asarray(gt_masklet)).float()
                pr_t = torch.from_numpy(np.asarray(pred_masklet)).float()
                J = float(RefEvaluator.compute_J(None, pr_t, gt_t))
                F = float(RefEvaluator.compute_F(None, pr_t, gt_t))
                JF = (J + F) / 2
            JF_dict[video_id][expression_id] = {
                "expression": pred_info["expression"],
                "J": J, "F": F, "JF": JF,
            }
            Js.append(J)
            Fs.append(F)
            JFs.append(JF)
    metrics["mean_J"] = float(np.mean(Js))
    metrics["mean_F"] = float(np.mean(Fs))
    metrics["mean_JF"] = float(np.mean(JFs))
    return metrics, JF_dict, pred_dict


def install_fake_roberta(text_encoder):
    """Patch the reference evaluator module's AutoTokenizer/AutoModel with
    a hash-backed stand-in producing EXACTLY the embeddings
    ``text_encoder`` (HashTextEncoder) produces — so the reference's OWN
    ``Evaluator.evaluate()`` (evaluator.py:54-247) can run verbatim in a
    zero-egress environment against our evaluator on shared inputs.
    Returns a handle that restores the original attributes."""
    import torch

    ref = load_reference()

    class _Out:
        def __init__(self, hidden):
            self.last_hidden_state = hidden

        def __getitem__(self, i):  # mean_pooling uses model_output[0]
            if i != 0:
                raise IndexError(i)
            return self.last_hidden_state

    class _Batch(dict):
        def to(self, device):
            return self

    class _Tok:
        @classmethod
        def from_pretrained(cls, name):
            return cls()

        def __call__(self, texts, padding=True, return_tensors="pt"):
            ids, mask = text_encoder.tokenizer(
                texts, max_len=text_encoder.max_len)
            ids = np.asarray(ids)
            mask = np.asarray(mask)
            # padding="longest": trim to the batch's longest valid prefix
            n = max(int(mask.sum(axis=1).max()), 1)
            return _Batch(
                input_ids=torch.as_tensor(ids[:, :n]),
                attention_mask=torch.as_tensor(
                    mask[:, :n].astype(np.int64)))

    class _Model:
        @classmethod
        def from_pretrained(cls, name):
            return cls()

        def eval(self):
            return self

        def to(self, device):
            return self

        def __call__(self, input_ids=None, attention_mask=None, **kw):
            table = np.asarray(text_encoder.table)
            ids = input_ids.cpu().numpy()
            hidden = table[ids % table.shape[0]]
            hidden = hidden * attention_mask.cpu().numpy()[..., None]
            return _Out(torch.as_tensor(hidden.astype(np.float32)))

    saved = (ref["evaluator"].AutoTokenizer, ref["evaluator"].AutoModel)
    ref["evaluator"].AutoTokenizer = _Tok
    ref["evaluator"].AutoModel = _Model

    def restore():
        ref["evaluator"].AutoTokenizer, ref["evaluator"].AutoModel = saved

    return restore
