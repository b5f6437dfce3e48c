"""Root-cause the quality run's late-epoch J&F collapse (round-3 VERDICT #3).

The 15-epoch quality run peaks at J&F 0.539 (epoch 8) and falls to ~0.13 by
epoch 15 while accuracy RISES and loss FALLS — the signature of threshold
under-selection: the evaluator selects tracks with sigmoid(score) >
pred_threshold (evaluator.py:102), and an empty selection scores J&F 0
(the reference has no fallback, evaluator.py:141-147 emit empty preds).

This script settles whether that is OUR recipe drifting or the recipe
itself, by training BOTH frameworks on the same corpus:

  1. ours — the production CLI, eval at several epochs with the score
     distributions the evaluator already collects (tp/fp/tn/fn_score,
     evaluator.py:130-133 semantics);
  2. the reference's own train.py (torch, its own init) — its per-epoch
     ``VALID EPOCH n | TP .. FP ..`` log lines show selection volume
     directly: TP+FP -> 0 is the same collapse.

Evidence lands in artifacts/quality_run/collapse_diagnosis.json plus a
markdown note. Expected outcome (and what the committed artifact shows):
the reference reproduces the under-selection on this corpus — with the
hash text encoder the held-out language signal is weak, so BCE pushes
uncertain scores toward the negative base rate and ever fewer tracks
cross 0.5 as the loss keeps improving; peak-epoch checkpoint selection,
not the final epoch, is the operative recipe on corpora like this.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/diagnose_quality_collapse.py [--n_videos 48]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import textwrap
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from quality_run import build_corpus, write_yaml  # noqa: E402


def run_ours(work: str, yaml_path: str, epochs: list[int]) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    t0 = time.time()
    subprocess.run([sys.executable, "-m", "sola_tpu.cli.train",
                    "--config", yaml_path], env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    print(f"[ours] trained in {time.time() - t0:.0f}s", flush=True)
    out = {}
    for ep in epochs:
        subprocess.run([sys.executable, "-m", "sola_tpu.cli.eval",
                        "--config", yaml_path,
                        "--eval_weight_epoch", str(ep)], env=env,
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.STDOUT)
        mdir = os.path.join(work, "EVAL", "quality_run", "mevis",
                            "pred_threshold_05", f"epoch_{ep}")
        with open(os.path.join(mdir,
                               f"valid_u_metrics_{ep}epoch.json")) as f:
            m = json.load(f)
        with open(os.path.join(mdir,
                               f"valid_u_JF_metrics_{ep}epoch.json")) as f:
            jf = json.load(f)
        vals = [e["JF"] for v in jf.values() for e in v.values()]
        out[ep] = {
            "selected": m["tp"] + m["fp"], "positives": m["tp"] + m["fn"],
            "tp": m["tp"], "fp": m["fp"], "fn": m["fn"], "tn": m["tn"],
            "f1": m["f1"],
            "tp_score": m["tp_score"], "fn_score": m["fn_score"],
            "tn_score": m["tn_score"], "fp_score": m["fp_score"],
            "mean_JF": sum(vals) / max(len(vals), 1),
            "zero_JF_frac": sum(v == 0.0 for v in vals) / max(len(vals), 1),
        }
        print(f"[ours] epoch {ep}: selected {out[ep]['selected']} of "
              f"{out[ep]['positives']} positives, JF {out[ep]['mean_JF']:.3f}",
              flush=True)
    return out


def run_reference(work: str, lang_dim: int, timeout: int = 7200,
                  n_epochs: int = 15) -> list:
    """The reference's train.py on the same corpus (its own torch init,
    stochastic recipe as shipped); returns per-epoch VALID confusion rows.

    Both trainers append the same log.txt in the same workspace (ours ran
    first), so only the LAST ``n_epochs`` rows belong to the reference."""
    driver = os.path.join(work, "_driver_ref_quality.py")
    with open(driver, "w") as f:
        f.write(textwrap.dedent(f"""\
            import builtins
            import sys, types
            import numpy as np
            sys.path.insert(0, {REPO!r})
            from sola_tpu.core import rle as _rle
            from sola_tpu.models.text import HashTextEncoder

            mask_mod = types.ModuleType("pycocotools.mask")

            def _encode(arr):
                e = _rle.encode(np.asarray(arr))
                return {{"size": e["size"], "counts": e["counts"].encode()}}

            mask_mod.encode = _encode
            mask_mod.decode = _rle.decode
            mask_mod.area = _rle.area
            pkg = types.ModuleType("pycocotools")
            pkg.mask = mask_mod
            sys.modules["pycocotools"] = pkg
            sys.modules["pycocotools.mask"] = mask_mod
            builtins.batch_size = 1  # train.py:92 references an undefined name

            import torch
            enc = HashTextEncoder(hidden_size={lang_dim})

            class _Out:
                def __init__(self, hidden):
                    self.last_hidden_state = hidden

                def __getitem__(self, i):
                    if i != 0:
                        raise IndexError(i)
                    return self.last_hidden_state

            class _Batch(dict):
                def to(self, device):
                    return self

            class AutoTokenizer:
                @classmethod
                def from_pretrained(cls, name, **kw):
                    return cls()

                def __call__(self, texts, padding=True,
                             return_tensors="pt", **kw):
                    ids, mask = enc.tokenizer(texts, max_len=enc.max_len)
                    ids = np.asarray(ids)
                    mask = np.asarray(mask)
                    n = max(int(mask.sum(axis=1).max()), 1)
                    return _Batch(
                        input_ids=torch.as_tensor(ids[:, :n]),
                        attention_mask=torch.as_tensor(
                            mask[:, :n].astype(np.int64)))

                batch_encode_plus = __call__

            class AutoModel:
                @classmethod
                def from_pretrained(cls, name, **kw):
                    return cls()

                def eval(self):
                    return self

                def to(self, device):
                    return self

                def __call__(self, input_ids=None, attention_mask=None,
                             **kw):
                    table = np.asarray(enc.table)
                    ids = input_ids.cpu().numpy()
                    hidden = table[ids % table.shape[0]]
                    hidden = hidden * attention_mask.cpu().numpy()[..., None]
                    return _Out(torch.as_tensor(
                        hidden.astype(np.float32)))

            tf = types.ModuleType("transformers")
            tf.AutoTokenizer = AutoTokenizer
            tf.AutoModel = AutoModel
            sys.modules["transformers"] = tf

            sys.path.insert(0, "/root/reference")
            sys.argv = ["train.py", "--config", "quality_run"]
            import runpy
            runpy.run_path("/root/reference/train.py", run_name="__main__")
            """))
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    t0 = time.time()
    proc = subprocess.run([sys.executable, driver], cwd=work,
                          capture_output=True, text=True, env=env,
                          timeout=timeout)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    print(f"[ref] trained in {time.time() - t0:.0f}s", flush=True)
    return _parse_valid_counts(work)[-n_epochs:]


def _parse_valid_counts(work: str) -> list:
    rows = []
    log = os.path.join(work, "TRAIN", "quality_run", "mevis", "log.txt")
    with open(log) as f:
        for line in f:
            m = re.match(r"VALID EPOCH (\d+) \| TP: (\d+) \| FP: (\d+) \| "
                         r"FN: (\d+) \| TN: (\d+)", line)
            if m:
                e, tp, fp, fn, tn = map(int, m.groups())
                rows.append({"epoch": e, "tp": tp, "fp": fp, "fn": fn,
                             "tn": tn, "selected": tp + fp,
                             "positives": tp + fn})
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_videos", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--eval_epochs", default="1,8,15")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "quality_run"))
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="collapse_diag_")
    ds = build_corpus(work, args.n_videos)
    yaml_path = os.path.join(work, "quality_run.yaml")
    # roberta_version: required by the reference's train.py:31 (our side
    # ignores it without local HF weights and uses the hash stand-in —
    # the same embeddings the driver's transformers stub feeds the ref)
    write_yaml(yaml_path, ds, work, args.epochs, model_overrides={
        "roberta_version": "sentence-transformers/all-roberta-large-v1"})
    # the reference entry script resolves configs/<name>.yaml from its cwd
    os.makedirs(os.path.join(work, "configs"), exist_ok=True)
    with open(yaml_path) as f:
        cfg = yaml.safe_load(f)
    with open(os.path.join(work, "configs", "quality_run.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    eval_epochs = [int(x) for x in args.eval_epochs.split(",")]
    ours = run_ours(work, yaml_path, eval_epochs)
    # our train loop already appended its own per-epoch VALID counts to
    # the shared-format log.txt — capture them before the reference
    # appends its rows to the same file
    ours_rows = _parse_valid_counts(work)[-args.epochs:]
    ref_rows = run_reference(work, cfg["model"]["lang_token_dim"],
                             n_epochs=args.epochs)

    diag = {
        "corpus": {"n_videos": args.n_videos, "epochs": args.epochs},
        "ours": {str(k): v for k, v in ours.items()},
        "ours_valid_counts_by_epoch": ours_rows,
        "reference_valid_counts_by_epoch": ref_rows,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "collapse_diagnosis.json"), "w") as f:
        json.dump(diag, f, indent=2)
    print(json.dumps({"ref_selected_by_epoch":
                      [r["selected"] for r in ref_rows],
                      "ours_selected":
                      {k: v["selected"] for k, v in ours.items()}},
                     indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
