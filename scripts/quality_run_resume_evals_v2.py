"""Cache-aware variant of quality_run_resume_evals.py.

Identical artifact output, but BOTH phases reuse any metrics JSON already
on disk (v1 only cached the per-epoch phase, so its sweep re-ran the
threshold-0.5 evals it had just computed — ~10 TPU-minutes each through
the relay). Used to finish the round-5 flagship run after the v1 driver
was superseded mid-sweep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/quality_run_resume_evals_v2.py --work /tmp/quality_run_k27jaip0 \
  --epochs 15 --out artifacts/quality_run_r5 \
  --threshold_sweep 0.2,0.3,0.4,0.5
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = ("mean_J", "mean_F", "mean_JF", "accuracy", "f1", "total_loss")
SWEEP_KEYS = ("mean_J", "mean_F", "mean_JF", "f1", "precision", "recall")


def thr_tag(threshold: float) -> str:
    # config.eval_output_dir: pred_threshold_{str(t).replace('.', '')}
    return str(threshold).replace(".", "")


def cached_path(work: str, epoch: int, threshold: float) -> str:
    return os.path.join(work, "EVAL", "quality_run", "mevis",
                        f"pred_threshold_{thr_tag(threshold)}",
                        f"epoch_{epoch}",
                        f"valid_u_metrics_{epoch}epoch.json")


def run_eval(yaml_path: str, epoch: int, env: dict, work: str,
             threshold: float = 0.5) -> dict:
    done = cached_path(work, epoch, threshold)
    if os.path.exists(done):
        return json.load(open(done))
    cmd = [sys.executable, "-m", "sola_tpu.cli.eval", "--config", yaml_path,
           "--eval_weight_epoch", str(epoch),
           "--eval_pred_threshold", str(threshold)]
    rc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert rc.returncode == 0, \
        f"eval epoch {epoch} thr {threshold}: {rc.stdout[-2000:]}" \
        f"\nSTDERR: {rc.stderr[-1000:]}"
    return json.load(open(done))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "quality_run_r5"))
    ap.add_argument("--threshold_sweep", default="0.2,0.3,0.4,0.5")
    ap.add_argument("--n_videos", type=int, default=120)
    args = ap.parse_args()

    work = args.work
    yaml_path = os.path.join(work, "quality_run.yaml")
    train_dir = os.path.join(work, "TRAIN", "quality_run", "mevis")
    eval_root = os.path.join(work, "EVAL", "quality_run", "mevis",
                             "pred_threshold_05")
    assert os.path.isdir(os.path.join(train_dir, f"epoch_{args.epochs}")), \
        f"missing final checkpoint under {train_dir}"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    jf_by_epoch = {}
    for epoch in range(1, args.epochs + 1):
        cached = os.path.exists(cached_path(work, epoch, 0.5))
        m = run_eval(yaml_path, epoch, env, work)
        print(f"[eval] epoch {epoch}{' (cached)' if cached else ''}: "
              f"JF={m['mean_JF']:.4f}", flush=True)
        jf_by_epoch[epoch] = {k: m[k] for k in KEYS}

    sweep = {}
    thresholds = [float(t) for t in args.threshold_sweep.split(",") if t]
    top = sorted(jf_by_epoch, key=lambda e: -jf_by_epoch[e]["mean_JF"])
    for epoch in sorted(top[:3]):
        for thr in thresholds:
            cached = os.path.exists(cached_path(work, epoch, thr))
            m = run_eval(yaml_path, epoch, env, work, threshold=thr)
            sweep[f"epoch{epoch}_thr{thr}"] = {k: m[k] for k in SWEEP_KEYS}
            print(f"[sweep] epoch {epoch} thr {thr}"
                  f"{' (cached)' if cached else ''}: JF={m['mean_JF']:.4f} "
                  f"f1={m['f1']:.4f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    shutil.copy(os.path.join(train_dir, "log.txt"),
                os.path.join(args.out, "log.txt"))
    for epoch in jf_by_epoch:
        src_dir = os.path.join(eval_root, f"epoch_{epoch}")
        for name in os.listdir(src_dir):
            shutil.copy(os.path.join(src_dir, name),
                        os.path.join(args.out, name))
    n_pairs = args.n_videos * 2
    summary = {
        "corpus": {"n_videos": args.n_videos, "expressions_per_video": 2,
                   "n_train_pairs": n_pairs, "n_frames": 32,
                   "tracks_per_video": 6},
        "epochs": args.epochs,
        "killed_after_epoch": 6,
        "resume": "SIGKILL mid-run; resumed via --resume; the EVAL phase "
                  "was additionally interrupted by a session loss and "
                  "resumed by this script (checkpoints are durable)",
        "jf_by_epoch": jf_by_epoch,
        "backend": os.environ.get("JAX_PLATFORMS", "axon-tpu (default)"),
        "text_encoder": "roberta_random (REAL 24-layer Flax RoBERTa, "
                        "random init — zero-egress env)",
    }
    if sweep:
        summary["threshold_sweep"] = sweep
        peak_key = max(sweep, key=lambda k: sweep[k]["mean_JF"])
        summary["peak"] = {"config": peak_key, **sweep[peak_key]}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    peak_fixed = max(jf_by_epoch.values(), key=lambda m: m["mean_JF"])
    print(f"QUALITY RUN EVALS OK: peak fixed-threshold J&F "
          f"{peak_fixed['mean_JF']:.4f}; artifacts in {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
