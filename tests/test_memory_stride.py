"""Memory temporal stride: the ring keeps every r-th frame and the
protocol still covers all frames in both directions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sola_tpu.trackgen.sam2.model import SAM2Config, SAM2Model
from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor


def test_stride_predictor_runs():
    import dataclasses
    cfg = dataclasses.replace(SAM2Config.tiny_test(image_size=64),
                              memory_stride=2)
    model = SAM2Model(cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    pred = SAM2VideoPredictor(model, variables, obj_batch=1)

    frames = [np.full((64, 64, 3), 30 * i, np.uint8) for i in range(9)]
    state = pred.init_state(frames)
    mask = np.zeros((64, 64), np.float32)
    mask[10:30, 10:30] = 1
    pred.add_new_mask(state, 0, 0, mask)
    seen = set()
    for fi, _, logits in pred.propagate_in_video(state):
        seen.add(fi)
        assert np.isfinite(np.asarray(logits)).all()
    for fi, _, logits in pred.propagate_in_video(state, reverse=True):
        seen.add(fi)
    assert seen == set(range(9))
    toks = pred.get_output_tokens(state)
    assert sorted(toks) == list(range(9))
