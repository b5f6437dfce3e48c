"""Connected-components postprocessor: native C++ vs NumPy fallback vs
hand-built cases (upstream remove_small_regions semantics)."""

import numpy as np
import pytest

from sola_tpu.core import ccl


def test_label_basic():
    mask = np.zeros((6, 8), np.uint8)
    mask[0:2, 0:2] = 1          # component A
    mask[4:6, 5:8] = 1          # component B
    mask[0, 7] = 1              # component C (isolated pixel)
    labels, n = ccl.label(mask)
    assert n == 3
    assert labels[0, 0] == labels[1, 1] != 0
    assert labels[5, 6] == labels[4, 5] != 0
    assert len({labels[0, 0], labels[5, 6], labels[0, 7]}) == 3
    assert (labels[mask == 0] == 0).all()


def test_label_eight_connectivity():
    # diagonal touch joins components under 8-connectivity
    mask = np.zeros((4, 4), np.uint8)
    mask[0, 0] = mask[1, 1] = mask[2, 2] = 1
    labels, n = ccl.label(mask)
    assert n == 1
    assert labels[0, 0] == labels[1, 1] == labels[2, 2]


def test_native_matches_fallback(rng):
    for _ in range(5):
        mask = (rng.random((37, 53)) > 0.6).astype(np.uint8)
        ln, nn = ccl.label(mask)
        lf, nf = ccl._label_numpy(mask)
        assert nn == nf
        # labels may be permuted; compare component partitions
        for comp in range(1, nn + 1):
            sel = ln == comp
            ids = np.unique(lf[sel])
            assert len(ids) == 1 and ids[0] != 0
        if ccl._get_lib() is None:
            pytest.skip("native ccl unavailable")


def test_remove_small_holes():
    mask = np.ones((10, 10), bool)
    mask[4:6, 4:6] = False      # 4-pixel hole
    out, changed = ccl.remove_small_regions(mask, 5, "holes")
    assert changed and out.all()
    out2, changed2 = ccl.remove_small_regions(mask, 3, "holes")
    assert not changed2 and (out2 == mask).all()


def test_remove_small_islands_keeps_largest():
    mask = np.zeros((10, 10), bool)
    mask[0:2, 0:2] = True       # area 4
    mask[6:9, 6:9] = True       # area 9
    out, changed = ccl.remove_small_regions(mask, 5, "islands")
    assert changed
    assert not out[0:2, 0:2].any() and out[6:9, 6:9].all()
    # all components below threshold -> the largest survives (upstream rule)
    out2, changed2 = ccl.remove_small_regions(mask, 100, "islands")
    assert changed2
    assert out2.sum() == 9 and out2[6:9, 6:9].all()


def test_fallback_matches_native_remove(rng):
    if ccl._get_lib() is None:
        pytest.skip("native ccl unavailable")
    lib = ccl._lib
    try:
        for mode in ("holes", "islands"):
            for _ in range(3):
                mask = rng.random((25, 31)) > 0.55
                native, _ = ccl.remove_small_regions(mask, 6, mode)
                ccl._lib = None
                ccl._build_failed = True
                fallback, _ = ccl.remove_small_regions(mask, 6, mode)
                ccl._lib = lib
                ccl._build_failed = False
                np.testing.assert_array_equal(native, fallback)
    finally:
        ccl._lib = lib
        ccl._build_failed = False


def test_amg_postprocess_integration(rng):
    """SAM2AutomaticMaskGenerator._postprocess_small_regions fills holes and
    drops islands, preferring unchanged masks through NMS."""
    from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator

    amg = SAM2AutomaticMaskGenerator.__new__(SAM2AutomaticMaskGenerator)
    amg.min_mask_region_area = 5
    amg.box_nms_thresh = 0.7

    clean = np.zeros((20, 20), bool)
    clean[5:15, 5:15] = True
    noisy = clean.copy()
    noisy[8, 8] = False          # small hole
    noisy[0, 19] = True          # small island
    masks = np.stack([clean, noisy])
    out, ious, stabs, pts = amg._postprocess_small_regions(
        masks, [0.9, 0.8], [0.95, 0.85], [np.zeros(2), np.zeros(2)])
    # the cleaned noisy mask equals clean -> NMS keeps one (the unchanged)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], clean)
    assert ious == [0.9]
