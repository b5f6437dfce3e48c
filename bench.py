"""Benchmark: track-selection throughput on TPU vs the torch reference design.

Measures end-to-end selection-forward throughput in (video, expression)
pairs/sec at the reference's flagship shape (64 tracks x 64 frames x 256-d
tokens, 1024-d model; configs/mevis/default.yaml:3-13) on the local TPU
chip, with the TPU-native batched/padded execution (8 pairs per jit step).

``vs_baseline`` compares against the reference's execution model measured in
this same environment: the identical math in PyTorch at batch_size=1 (the
reference is pinned to bs=1 by ragged shapes, dataloader.py:38-46) on the
available torch device (CPU here; the A100 target of BASELINE.md is tracked
separately by the driver).

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def tpu_throughput(n_pairs: int = 512, batch: int = 8, n_tracks: int = 64,
                   n_frames: int = 64, n_words: int = 16,
                   iters: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from sola_tpu.models.selection import SelectionConfig, SelectionModel

    cfg = SelectionConfig()
    model = SelectionModel(cfg)
    key = jax.random.PRNGKey(0)
    obj = jax.random.normal(key, (batch, n_tracks, n_frames,
                                  cfg.object_token_dim), jnp.bfloat16)
    obj = obj.astype(jnp.float32)
    lang = jax.random.normal(key, (batch, n_words, cfg.lang_token_dim),
                             jnp.float32)
    variables = model.init(key, obj, lang)
    track_mask = jnp.ones((batch, n_tracks), bool)
    frame_lengths = jnp.full((batch,), n_frames, jnp.int32)
    lang_mask = jnp.ones((batch, n_words), bool)

    @jax.jit
    def step(v, o, l):
        score_map, score_tokens = model.apply(
            v, o, l, track_mask=track_mask, frame_lengths=frame_lengths,
            lang_mask=lang_mask)
        return jax.nn.sigmoid(score_map)

    # warmup/compile
    step(variables, obj, lang).block_until_ready()
    n_steps = max(1, n_pairs // batch)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = step(variables, obj, lang)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return (n_steps * batch) / best


def torch_baseline_throughput(n_tracks: int = 64, n_frames: int = 64,
                              n_words: int = 16, iters: int = 3) -> float:
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "torch_oracle",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests",
                     "torch_oracle.py"))
    oracle = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oracle)

    state = oracle.make_state_dict(seed=0, d_obj=256, d_lang=1024,
                                   n_layers=2, n_negative=32, n_groups=8)
    rng = np.random.default_rng(0)
    obj = rng.standard_normal((1, n_tracks, n_frames, 256),
                              dtype=np.float32)
    lang = rng.standard_normal((1, n_words, 1024), dtype=np.float32)
    # warmup
    oracle.forward(state, obj, lang, n_layers=2, n_groups=8,
                   n_groups_module=8, heads=8)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        oracle.forward(state, obj, lang, n_layers=2, n_groups=8,
                       n_groups_module=8, heads=8)
        best = min(best, time.perf_counter() - t0)
    return 1.0 / best


def main() -> None:
    tpu = tpu_throughput()
    try:
        ref = torch_baseline_throughput()
    except Exception:
        ref = float("nan")
    vs = tpu / ref if ref == ref and ref > 0 else float("nan")
    print(json.dumps({
        "metric": "selection_forward_throughput_64trk_64frm",
        "value": round(tpu, 2),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
