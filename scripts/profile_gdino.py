"""Locate the GDINO per-image cost: backbone vs enhancer vs decoder.

The reference runs the whole GroundingDINO forward per (frame, expression)
(prompt_generator.py:132-140); our measured s/image is the prompt-stage
bound. This times the FULL jitted forward at production canvas size for
layer-count ablations (enc_layers/dec_layers zeroed) with random weights —
program timing only depends on shapes — and differences the results:

    backbone+proj = t(enc=0, dec=0)
    enhancer      = t(enc=6, dec=0) - t(enc=0, dec=0)
    decoder       = t(enc=6, dec=6) - t(enc=6, dec=0)

Run on the TPU: ``python scripts/profile_gdino.py [--bf16]``.
Prints one JSON line.
"""

import dataclasses
import json
import sys
import time

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()


def time_forward(cfg, compute_dtype, img, text, repeats=3):
    from sola_tpu.trackgen.gdino.model import GroundingDINO, GroundingModel

    import jax
    model = GroundingDINO(cfg)
    s = cfg.size_target
    import jax.numpy as jnp
    canvas = jnp.zeros((1, s, s, 3), jnp.float32)
    pmask = jnp.ones((1, s, s), bool)
    ids = jnp.zeros((1, 8), jnp.int32)
    tmask = jnp.ones((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), canvas, pmask, ids, tmask)
    gm = GroundingModel(model, variables, compute_dtype=compute_dtype)
    gm.get_boxes(img, text)  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        gm.get_boxes(img, text)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from sola_tpu.trackgen.gdino.model import GDINOConfig

    import jax.numpy as jnp
    compute_dtype = jnp.bfloat16 if "--bf16" in sys.argv else None

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
    text = "a red object in the scene."

    base = GDINOConfig()
    out = {"mode": "bf16" if compute_dtype is not None else "fp32"}
    t00 = time_forward(dataclasses.replace(base, enc_layers=0, dec_layers=0),
                       compute_dtype, img, text)
    t60 = time_forward(dataclasses.replace(base, dec_layers=0),
                       compute_dtype, img, text)
    t66 = time_forward(base, compute_dtype, img, text)
    out["backbone_s"] = round(t00, 3)
    out["enhancer_s"] = round(t60 - t00, 3)
    out["decoder_s"] = round(t66 - t60, 3)
    out["total_s"] = round(t66, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
