"""Deterministic fake AMG shared by the reference-script parity test.

``fake_mask_infos(frame)`` derives a mask set purely from frame pixels, so
the reference's ``generate_prompts_grid.py`` (driven through a fake ``sam2``
package) and our ``prompts_grid`` CLI consume IDENTICAL proposals — any
artifact difference is then an orchestration divergence (part suppression,
binning, sorting, JSON schema), not a model difference.

The mask set per frame: one mask per color channel that clears a 127
threshold, plus that mask's left half as a "part" (partness 1.0 against its
parent -> must be suppressed when the parent survives). Channels absent
from the frame produce no masks; an all-black frame produces an empty list
(exercises the reference's ``continue``).
"""

from __future__ import annotations

import numpy as np


def fake_mask_infos(frame) -> list[dict]:
    frame = np.asarray(frame)
    h, w = frame.shape[:2]
    infos = []
    for idx in range(3):
        m = frame[..., idx] > 127
        a = int(m.sum())
        if a == 0:
            continue
        infos.append({"segmentation": m, "area": a,
                      "stability_score": 0.9 + 0.01 * idx})
        part = m.copy()
        part[:, w // 2:] = False
        pa = int(part.sum())
        if 0 < pa < a:
            infos.append({"segmentation": part, "area": pa,
                          "stability_score": 0.85 + 0.01 * idx})
    return infos


class FakeAMG:
    """Adapter with the .generate protocol our prompts_grid CLI consumes."""

    def generate(self, frame):
        return fake_mask_infos(frame)


def fake_grounded_preds(frame, texts) -> dict:
    """Deterministic GDINO+SAM2 prompt fake shared by the
    generate_prompts_gdino.py parity test: expression index i sees color
    channel i%3 of the frame as its mask (possibly EMPTY — pins the
    reference's absent-GT-frame iou=0.0 convention against empty preds),
    plus a bottom-half part when non-degenerate."""
    frame = np.asarray(frame)
    h, w = frame.shape[:2]
    out = {}
    for idx, text in enumerate(texts):
        m = frame[..., idx % 3] > 127
        a = int(m.sum())
        preds = [{
            "sam2_mask": m,
            "mask_score": 0.5 + 0.1 * idx + 0.001 * (a % 7),
            "stability_score": 0.8 + 0.02 * idx,
            "bbox": np.asarray([1.0 + idx, 2.0, 5.0 + idx, 6.0],
                               np.float32),
            "phrase": f"obj {idx}",
            "token_score": [0.3 + 0.1 * idx, 0.2],
        }]
        part = m.copy()
        part[: h // 2] = False
        pa = int(part.sum())
        if 0 < pa < a:
            preds.append({
                "sam2_mask": part,
                "mask_score": 0.4 + 0.1 * idx,
                "stability_score": 0.7 + 0.02 * idx,
                "bbox": np.asarray([2.0, 3.0 + idx, 6.0, 7.0],
                                   np.float32),
                "phrase": f"part {idx}",
                "token_score": [0.25],
            })
        out[str(idx)] = {"tokenized": None, "expression": text,
                         "preds": preds}
    return out


class FakePromptGenerator:
    """Adapter with the PromptGenerator surface our prompts_gdino CLI
    consumes (.generate_prompts + .grounding/.sam2 attrs for the pipeline
    capability check)."""

    grounding = object()
    sam2 = object()

    def generate_prompts(self, image, raw_texts):
        return fake_grounded_preds(image, raw_texts)
