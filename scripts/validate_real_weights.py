"""Real-checkpoint readiness: one command to validate pretrained weights.

This environment has zero egress, so the real checkpoints the reference
uses (track_generation/generate_tokens_grid.py:28-29 `sam2_hiera_large.pt`,
prompt_generator.py:43-57 `groundingdino_swint_ogc.pth`, the
`sentence-transformers/all-roberta-large-v1` RoBERTa) cannot be fetched
here. All converters are oracle-parity-tested against `transformers`
implementations at shared random weights; THIS script is the first action
the moment real weights become available:

    python scripts/validate_real_weights.py \
        --sam2_ckpt  /path/sam2_hiera_large.pt \
        --gdino_ckpt /path/groundingdino_swint_ogc.pth \
        --roberta    /path/roberta_dir_or_hf_name \
        [--record]   # write golden outputs on the first trusted run
        [--image path.jpg]  # optional real image for the spot checks

Per checkpoint it (1) loads + converts, (2) asserts conversion coverage
(SAM2 100% of params, GDINO >= 0.99, RoBERTa exact key match), (3) runs a
deterministic forward spot-check (finite outputs, sane ranges: mask areas,
box coords inside the canvas, IoU scores in [0,1]), and (4) if
``scripts/golden_real_weights.json`` exists, compares output digests
against it; ``--record`` (re)writes that file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS even under this sandbox's sitecustomize, which sets
# the platform via jax.config (config beats env): JAX_PLATFORMS=cpu runs
# the machinery check on CPU instead of minutes of relay TPU compiles
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_real_weights.json")


def _flat_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out |= _flat_paths(v, p)
        else:
            out.add(p)
    return out


def _test_image(h=480, w=854):
    """Deterministic synthetic frame: gradient background + two bright
    rectangles (segmentable objects at known locations)."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 / w), (yy * 255 / h),
                    ((xx + yy) * 255 / (h + w))], axis=-1)
    img[80:220, 100:300] = (250, 60, 60)
    img[250:420, 500:760] = (60, 60, 250)
    return img.astype(np.uint8)


def _digest(arr, k=16):
    """Small stable fingerprint of an array for golden comparison."""
    a = np.asarray(arr, np.float64).reshape(-1)
    take = a[:: max(1, len(a) // k)][:k]
    return {
        "shape": list(np.asarray(arr).shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "samples": [float(x) for x in take],
    }


def _check_digest(name, got, want, tol):
    assert got["shape"] == want["shape"], (
        f"{name}: shape {got['shape']} != golden {want['shape']}")
    for field in ("mean", "std"):
        assert abs(got[field] - want[field]) <= tol * (
            1 + abs(want[field])), (
            f"{name}.{field}: {got[field]} vs golden {want[field]}")
    for i, (g, w) in enumerate(zip(got["samples"], want["samples"])):
        assert abs(g - w) <= tol * (1 + abs(w)), (
            f"{name}.samples[{i}]: {g} vs golden {w}")


def validate_sam2(ckpt_path: str, image: np.ndarray) -> dict:
    from sola_tpu.trackgen.sam2 import convert as sam2_convert
    from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor

    print(f"[sam2] loading {ckpt_path}")
    state = sam2_convert.load_checkpoint_state(ckpt_path)
    stem = os.path.basename(ckpt_path)
    size = next((s for s in ("tiny", "small", "base_plus", "large")
                 if s in stem), "large")
    cfg = sam2_convert.sam2_config_for(size)
    converted = sam2_convert.torch_sam2_to_params(state, cfg)
    model, template = sam2_convert._init_variables(cfg)
    for coll in template:
        t = _flat_paths(template[coll])
        c = _flat_paths(converted.get(coll, {}))
        missing = sorted(t - c)
        assert not missing, (
            f"[sam2] {coll}: {len(missing)} params NOT converted "
            f"(would silently keep random init): {missing[:8]}")
    print(f"[sam2] conversion coverage: 100% "
          f"({len(_flat_paths(template.get('params', {})))} param leaves)")

    variables = sam2_convert._merge_with_template(template, converted)
    predictor = SAM2ImagePredictor(model, variables)
    predictor.set_image(image)
    box = np.asarray([100, 80, 300, 220], np.float32)  # red rectangle
    masks, ious, _ = predictor.predict(box=box)
    mask = masks[0, 0]
    area = int(mask.sum())
    assert np.all(np.isfinite(ious)), "[sam2] non-finite IoU scores"
    assert 0.0 <= float(ious.max()) <= 1.0, f"[sam2] iou {ious}"
    assert area > 0, "[sam2] empty mask for an obvious box prompt"
    h, w = image.shape[:2]
    if area > 0.5 * h * w:  # quality heuristic: real weights should crop
        print(f"[sam2] WARNING: mask covers {area}/{h * w} px — expected "
              "for random weights, suspicious for real ones")
    ys, xs = np.nonzero(mask)
    print(f"[sam2] box prompt -> mask area {area}, bbox "
          f"({xs.min()},{ys.min()},{xs.max()},{ys.max()}), "
          f"iou {float(ious[0, 0]):.3f}")
    return {"mask_area": area, "iou": _digest(ious),
            "mask_bbox": [int(xs.min()), int(ys.min()),
                          int(xs.max()), int(ys.max())]}


def validate_gdino(ckpt_path: str, image: np.ndarray) -> dict:
    from sola_tpu.trackgen.gdino.convert import build_gdino_from_checkpoint
    from sola_tpu.trackgen.gdino.model import GroundingModel

    print(f"[gdino] loading {ckpt_path}")
    model, variables, report = build_gdino_from_checkpoint(ckpt_path)
    print(f"[gdino] conversion coverage: {report['coverage']:.4f} "
          f"(assert >= 0.99 passed); missing={report['missing'][:4]}")
    tokenizer = None
    try:  # the real BERT tokenizer when cached locally; hash fallback else
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained("bert-base-uncased",
                                                  local_files_only=True)
        print("[gdino] using local bert-base-uncased tokenizer")
    except Exception:
        print("[gdino] WARNING: no local BERT tokenizer — hash tokenizer "
              "in use; phrase extraction will be meaningless")
    gm = GroundingModel(model, variables, tokenizer=tokenizer)
    preds = gm.get_boxes(image, "a red rectangle.", box_threshold=0.2,
                         text_threshold=0.25)
    h, w = image.shape[:2]
    boxes = np.stack([p["bbox"] for p in preds]) if preds else \
        np.zeros((0, 4), np.float32)
    assert np.all(np.isfinite(boxes)), "[gdino] non-finite boxes"
    if len(boxes):
        assert boxes[:, 0].min() >= -w and boxes[:, 2].max() <= 2 * w, (
            f"[gdino] boxes far outside canvas: {boxes[:2]}")
    print(f"[gdino] {len(boxes)} boxes above threshold; "
          f"top: {boxes[0].tolist() if len(boxes) else None}")
    return {"n_boxes": int(len(boxes)),
            "boxes": _digest(boxes) if len(boxes) else {"shape": [0, 4]}}


def validate_roberta(version_or_dir: str) -> dict:
    from sola_tpu.models.text import TextEncoder, build_text_encoder

    print(f"[roberta] loading {version_or_dir}")
    enc = build_text_encoder({"roberta_version": version_or_dir})
    if not isinstance(enc, TextEncoder):
        raise FileNotFoundError(
            f"{version_or_dir} not available locally (hash fallback built)")
    hidden, mask, pooled = enc.encode_batch(
        ["a red rectangle on the left side",
         "the blue box moving right"])
    assert np.all(np.isfinite(np.asarray(hidden))), "[roberta] non-finite"
    n_words = int(np.asarray(mask)[0].sum())
    assert n_words >= 5, f"[roberta] suspicious tokenization: {n_words}"
    print(f"[roberta] hidden {np.asarray(hidden).shape}, "
          f"pooled norm {float(np.linalg.norm(np.asarray(pooled)[0])):.3f}")
    return {"hidden": _digest(hidden), "pooled": _digest(pooled)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sam2_ckpt", default="checkpoints/sam2_hiera_large.pt")
    ap.add_argument("--gdino_ckpt",
                    default="checkpoints/groundingdino_swint_ogc.pth")
    ap.add_argument("--roberta",
                    default="sentence-transformers/all-roberta-large-v1")
    ap.add_argument("--image", default=None,
                    help="optional real image for the spot checks")
    ap.add_argument("--record", action="store_true",
                    help="write golden_real_weights.json from this run")
    ap.add_argument("--tol", type=float, default=5e-3)
    args = ap.parse_args()

    if args.image:
        from PIL import Image
        image = np.asarray(Image.open(args.image).convert("RGB"))
    else:
        image = _test_image()

    results: dict = {}
    ran = []
    if os.path.exists(args.sam2_ckpt):
        results["sam2"] = validate_sam2(args.sam2_ckpt, image)
        ran.append("sam2")
    else:
        print(f"[sam2] SKIP: {args.sam2_ckpt} not found")
    if os.path.exists(args.gdino_ckpt):
        results["gdino"] = validate_gdino(args.gdino_ckpt, image)
        ran.append("gdino")
    else:
        print(f"[gdino] SKIP: {args.gdino_ckpt} not found")
    try:
        results["roberta"] = validate_roberta(args.roberta)
        ran.append("roberta")
    except Exception as e:  # local_files_only miss, not an error here
        print(f"[roberta] SKIP: {e}")

    if not ran:
        print("NO CHECKPOINTS FOUND — nothing validated")
        return 1

    if args.record:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(results, f, indent=2)
        print(f"recorded goldens for {ran} -> {GOLDEN_PATH}")
    elif os.path.exists(GOLDEN_PATH):
        golden = json.load(open(GOLDEN_PATH))
        for name in ran:
            if name not in golden:
                continue
            for key, want in golden[name].items():
                got = results[name][key]
                if isinstance(want, dict) and "shape" in want:
                    _check_digest(f"{name}.{key}", got, want, args.tol)
                else:
                    assert got == want, f"{name}.{key}: {got} vs {want}"
        print("golden comparison OK")
    print(f"REAL-WEIGHT VALIDATION OK: {ran}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
