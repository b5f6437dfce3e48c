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
