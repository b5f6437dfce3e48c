"""Utility-layer tests: distributed sharding, profiling timer, viz, WSDense."""

import numpy as np

import jax
import jax.numpy as jnp


def test_shard_for_host_disjoint_union():
    from sola_tpu.parallel.distributed import (shard_for_host,
                                               verify_disjoint_coverage)
    items = list(range(23))
    shards = [shard_for_host(items, process_id=p, process_count=4)
              for p in range(4)]
    merged = sorted(x for s in shards for x in s)
    assert merged == items
    assert verify_disjoint_coverage(23, 4)
    assert shard_for_host(items, process_id=0, process_count=1) == items


def test_stage_timer():
    from sola_tpu.utils.profiling import StageTimer
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_device_trace_noop():
    from sola_tpu.utils.profiling import annotate, device_trace
    with device_trace(None):
        with annotate("region"):
            _ = jnp.ones(4).sum()


def test_viz_helpers():
    from sola_tpu.utils.viz import draw_box, overlay_mask, put_text_box
    img = np.zeros((40, 60, 3), np.uint8)
    mask = np.zeros((40, 60), np.uint8)
    mask[10:20, 10:20] = 1
    out = overlay_mask(img, mask)
    assert out[15, 15].sum() > 0
    out = draw_box(out, [5, 5, 30, 30])
    out = put_text_box(out, "track 3", (5, 5), (30, 30), (255, 255, 0))
    assert out.shape == img.shape
    out = put_text_box(out, "", (5, 35), (30, 39), (0, 255, 255))
    assert out.dtype == np.uint8


def test_ws_dense_matches_torch_semantics(rng):
    import pytest
    torch = pytest.importorskip("torch")
    from sola_tpu.models.attention import WSDense
    x = rng.standard_normal((3, 8), dtype=np.float32)
    model = WSDense(5)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"]).T  # torch (out, in)
    b = np.asarray(variables["params"]["bias"])
    wt = torch.as_tensor(w)
    mu = wt.mean(dim=1, keepdim=True)
    wc = wt - mu
    std = wc.view(wc.size(0), -1).std(dim=1).view(-1, 1) + 1e-5
    ref = torch.nn.functional.linear(torch.as_tensor(x), wc / std,
                                     torch.as_tensor(b)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
