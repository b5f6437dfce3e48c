"""Full-size GroundingDINO compile + forward smoke on the real chip.

STATUS round-2 gap: "full-size GDINO compile through the remote relay not
yet exercised". Builds the default (SwinT, 6+6 layer, 900-query) config at
the upstream 800/1333 canvas, runs get_boxes twice (compile + steady state)
and prints one JSON line with timings. Random weights — this validates the
compile path and measures per-image latency, not box quality (weight-level
fidelity is covered by tests/test_gdino_hf_parity.py).
"""

import json
import time

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()


def main() -> None:
    import jax.numpy as jnp

    from sola_tpu.trackgen.gdino.model import GroundingModel, build_gdino

    t0 = time.perf_counter()
    model, variables = build_gdino(None)
    t_build = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
    text = "a red car driving down the street."
    out = {"gdino_build_s": round(t_build, 2),
           "canvas": "800x1333-class (aspect preserving)"}

    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        gm = GroundingModel(model, variables, compute_dtype=dtype)
        t0 = time.perf_counter()
        gm.get_boxes(image, text)
        out[f"gdino_{name}_first_call_s"] = round(
            time.perf_counter() - t0, 2)  # includes jit compile
        t0 = time.perf_counter()
        n_steady = 3
        for _ in range(n_steady):
            gm.get_boxes(image, text)
        t = (time.perf_counter() - t0) / n_steady
        out[f"gdino_{name}_steady_s_per_image"] = round(t, 4)
        out[f"gdino_{name}_steady_fps"] = round(1.0 / t, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
