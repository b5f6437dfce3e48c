"""Data-layer tests over the synthetic MeViS-layout fixture."""

import numpy as np
import pytest

from sola_tpu.data import synthetic
from sola_tpu.data.dataset import AlignDataset, Loader, pad_and_collate
from sola_tpu.data.meta import build_samples, load_meta


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return synthetic.generate(str(root), n_videos=2, n_frames=24,
                              n_objects=2, n_distractors=2)


def _valid_configs(tiny_dataset):
    c = dict(tiny_dataset["configs"]["valid"])
    c["data_root"] = tiny_dataset["data_root"]
    c["track_root"] = tiny_dataset["track_root"]
    return c


def test_meta_parsing(tiny_dataset):
    meta = load_meta(tiny_dataset["data_root"], "mevis", "valid_u")
    samples = build_samples(meta, "mevis")
    assert len(samples) == 4  # 2 videos x 2 expressions
    assert all(s.has_gt for s in samples)
    assert samples[0].n_frames == 24


def test_dataset_sample_loading(tiny_dataset):
    ds = AlignDataset(_valid_configs(tiny_dataset))
    assert len(ds) == 4
    s = ds.get_sample(0)
    assert s["object_tokens"].shape == (4, 24, 256)  # 2 GT-matching + 2 distractors
    assert s["labels"] is not None
    # exactly one track has IoU 1.0 against this expression's GT object
    ious = s["labels"]["iou"]
    assert (ious > 0.99).sum() == 1
    assert len(s["sam2_anno_id"]) == 4
    assert s["prompt_type"][0] == "SAM2 AMG MASK"


def test_label_index_caching(tiny_dataset):
    ds = AlignDataset(_valid_configs(tiny_dataset))
    s1 = ds.get_sample(1)
    # second dataset instance should read through labels_index.json
    ds2 = AlignDataset(_valid_configs(tiny_dataset))
    s2 = ds2.get_sample(1)
    np.testing.assert_array_equal(s1["labels"]["iou"], s2["labels"]["iou"])
    np.testing.assert_array_equal(s1["object_tokens"], s2["object_tokens"])


def test_pad_and_collate(tiny_dataset):
    ds = AlignDataset(_valid_configs(tiny_dataset))
    batch = pad_and_collate([ds.get_sample(0), ds.get_sample(1)],
                            track_buckets=(8,), frame_buckets=(32,))
    assert batch["object_tokens"].shape == (2, 8, 32, 256)
    assert batch["track_mask"].shape == (2, 8)
    assert batch["track_mask"][0].sum() == 4
    assert batch["frame_lengths"][0] == 24
    assert batch["labels"]["iou"].shape == (2, 8)
    # padded label slots are zero
    assert batch["labels"]["iou"][0, 4:].sum() == 0


def test_loader_batches_and_coverage(tiny_dataset):
    ds = AlignDataset(_valid_configs(tiny_dataset))
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2)
    seen = []
    for batch in loader:
        seen.extend(zip(batch["video_id"], batch["expression_id"]))
        assert batch["object_tokens"].ndim == 4
    assert len(seen) == 4
    assert len(set(seen)) == 4


def test_loader_shuffle_deterministic(tiny_dataset):
    ds = AlignDataset(_valid_configs(tiny_dataset))
    l1 = Loader(ds, batch_size=1, shuffle=True, seed=7)
    l2 = Loader(ds, batch_size=1, shuffle=True, seed=7)
    order1 = [b["expression_id"][0] + b["video_id"][0] for b in l1]
    order2 = [b["expression_id"][0] + b["video_id"][0] for b in l2]
    assert order1 == order2


def test_masklet_services_oracle_jf(tiny_dataset):
    """Oracle selection (pick the IoU-1.0 track) must give J&F == 1.0."""
    from sola_tpu.core import mask_ops
    ds = AlignDataset(_valid_configs(tiny_dataset))
    for idx in range(len(ds)):
        s = ds.get_sample(idx)
        preds = (s["labels"]["iou"] > 0.99).astype(np.float32)
        ds.set_video(s["video_id"])
        gt = ds.get_gt_masklet(s["video_id"], s["expression_id"])
        pred = ds.get_sam2_masklet(
            s["video_id"], s["expression_id"], preds, s["root_type"],
            s["prompt_type"], s["sam2_anno_id"])
        j, f = mask_ops.compute_JF(pred.astype(np.float32),
                                   gt.astype(np.float32))
        assert float(j) == 1.0
        assert float(f) == 1.0


def test_masklet_services_empty_selection(tiny_dataset):
    """No selected tracks -> all-zero masklet fallback (dataloader.py:345-349)."""
    ds = AlignDataset(_valid_configs(tiny_dataset))
    s = ds.get_sample(0)
    preds = np.zeros(len(s["sam2_anno_id"]), np.float32)
    pred = ds.get_sam2_masklet(
        s["video_id"], s["expression_id"], preds, s["root_type"],
        s["prompt_type"], s["sam2_anno_id"])
    assert pred is not None
    assert pred.sum() == 0
    assert pred.shape[0] == 24


def test_device_token_cache_matches_direct_transfer(tiny_dataset):
    """Cached (device-stacked) batch tokens must equal the direct-transfer
    path, and repeat passes must hit instead of re-uploading."""
    import jax.numpy as jnp

    from sola_tpu.data.device_cache import DeviceTokenCache
    from sola_tpu.models.text import HashTextEncoder
    from sola_tpu.train.loop import prepare_batch

    c = dict(tiny_dataset["configs"]["train"])
    c["data_root"] = tiny_dataset["data_root"]
    c["track_root"] = tiny_dataset["track_root"]
    loader = Loader(AlignDataset(c), batch_size=2, shuffle=False)
    text = HashTextEncoder(hidden_size=64, vocab_size=256)
    cache = DeviceTokenCache(per_expression=False, dtype=jnp.float32)

    for raw in loader:
        direct = prepare_batch(raw, text)
        cached = prepare_batch(raw, text, token_cache=cache)
        np.testing.assert_array_equal(np.asarray(cached["object_tokens"]),
                                      np.asarray(direct["object_tokens"]))
    misses_after_pass1 = cache.misses
    assert misses_after_pass1 > 0
    for raw in loader:
        prepare_batch(raw, text, token_cache=cache)
    assert cache.misses == misses_after_pass1, "pass 2 must be all hits"
    assert cache.hits > 0


def test_device_token_cache_eviction_keeps_batch_rows(tiny_dataset):
    """With a max_bytes of ~one row, every batch still assembles correctly
    (live references protect in-batch rows from eviction)."""
    import jax.numpy as jnp

    from sola_tpu.data.device_cache import DeviceTokenCache
    from sola_tpu.models.text import HashTextEncoder
    from sola_tpu.train.loop import prepare_batch

    c = dict(tiny_dataset["configs"]["train"])
    c["data_root"] = tiny_dataset["data_root"]
    c["track_root"] = tiny_dataset["track_root"]
    loader = Loader(AlignDataset(c), batch_size=2, shuffle=False)
    text = HashTextEncoder(hidden_size=64, vocab_size=256)
    cache = DeviceTokenCache(per_expression=False, dtype=jnp.float32,
                             max_bytes=1)
    for raw in loader:
        direct = prepare_batch(raw, text)
        cached = prepare_batch(raw, text, token_cache=cache)
        np.testing.assert_array_equal(np.asarray(cached["object_tokens"]),
                                      np.asarray(direct["object_tokens"]))
    assert len(cache._store) <= 1  # everything but the newest evicted
