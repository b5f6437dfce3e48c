"""Track-generation throughput benchmark (informational; bench.py is the
driver-facing single-line benchmark).

Measures the SAM2-in-JAX video pipeline on the local TPU at production size
(hiera-L, 1024px, 4-object batch): frame-encode throughput and scan-based
propagation throughput in frames/sec — the quantities behind the
reference's ``runtime_info`` fps (generate_tokens_gdino.py:329).
Random weights (no checkpoint needed); compute is identical to a real run.
"""

import json
import time

import numpy as np

from sola_tpu.utils import compcache
compcache.enable()


def main(n_frames: int = 32, obj_batch: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from sola_tpu.trackgen.sam2.convert import build_sam2
    from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor

    model, variables = build_sam2(None)
    pred = SAM2VideoPredictor(model, variables, obj_batch=obj_batch)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (480, 854, 3), dtype=np.uint8)
              for _ in range(n_frames)]

    # frame encoding: first video includes compile; second is steady state
    t0 = time.perf_counter()
    state = pred.init_state(frames)
    float(state.features["pix"].astype("float32").sum())
    t_encode_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = pred.init_state(frames)
    # value fetch: block_until_ready can ack before execution completes
    float(state.features["pix"].astype("float32").sum())
    t_encode = time.perf_counter() - t0

    mask = np.zeros((480, 854), np.float32)
    mask[100:220, 200:400] = 1.0

    def run_pass():
        pred.reset_state(state)
        pred.add_new_mask(state, 0, 0, mask)
        n = 0
        for _ in pred.propagate_in_video(state):
            n += 1
        for _ in pred.propagate_in_video(state, reverse=True):
            n += 1
        return n

    run_pass()  # warmup/compile
    t0 = time.perf_counter()
    n = run_pass()
    t_prop = time.perf_counter() - t0

    print(json.dumps({
        "encode_fps": round(n_frames / t_encode, 2),
        "encode_cold_s": round(t_encode_cold, 1),
        "propagate_fps": round(n / t_prop, 2),
        "object_frames_per_s": round(n * obj_batch / t_prop, 2),
        "frames": n_frames,
        "obj_batch": obj_batch,
    }))


if __name__ == "__main__":
    main()
