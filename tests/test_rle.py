"""COCO RLE codec tests: golden vectors, round trips, native/python parity.

pycocotools is not in this environment; correctness is anchored by
hand-derived golden vectors from the COCO compressed-RLE spec plus
cross-checks between the native C++ codec and the pure-NumPy fallback.
"""

import numpy as np
import pytest

from sola_tpu.core import rle


def test_native_builds():
    assert rle.native_available(), "native RLE codec failed to build"


def test_golden_small():
    # mask [[1,0],[0,0]] -> column-major [1,0,0,0] -> counts [0,1,3]
    # encode: 0 -> '0' (chr 48), 1 -> '1', 3 -> '3'
    mask = np.array([[1, 0], [0, 0]], dtype=np.uint8)
    out = rle.encode(mask)
    assert out["size"] == [2, 2]
    assert out["counts"] == "013"
    assert np.array_equal(rle.decode(out), mask)


def test_golden_all_zero_and_all_one():
    z = np.zeros((3, 4), dtype=np.uint8)
    enc = rle.encode(z)
    # counts = [12]: 12 = 0b01100 -> single group c=12 -> chr(60) = '<'
    assert enc["counts"] == "<"
    assert np.array_equal(rle.decode(enc), z)

    o = np.ones((3, 4), dtype=np.uint8)
    enc = rle.encode(o)
    # counts = [0, 12] -> '0' then '<'
    assert enc["counts"] == "0<"
    assert np.array_equal(rle.decode(enc), o)


def test_golden_delta_encoding():
    # mask columns: c0=[0,0], c1=[1,1], c2=[0,0], c3=[1,1]
    # -> flat [0,0,1,1,0,0,1,1] -> counts [2,2,2,2].
    # Delta encoding kicks in from the 4th count (i > 2): 2 - cnts[1] = 0.
    mask = np.array([[0, 1, 0, 1], [0, 1, 0, 1]], dtype=np.uint8)
    enc = rle.encode(mask)
    assert enc["counts"] == "2220"
    assert np.array_equal(rle.decode(enc), mask)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (64, 64), (540, 960)])
def test_roundtrip_random(rng, shape):
    mask = (rng.random(shape) > 0.5).astype(np.uint8)
    enc = rle.encode(mask)
    dec = rle.decode(enc)
    assert np.array_equal(dec, mask)
    assert rle.area(enc) == int(mask.sum())


def test_roundtrip_structured(rng):
    # blocky masks exercise long runs and the delta encoding path
    mask = np.zeros((128, 96), dtype=np.uint8)
    mask[10:90, 20:60] = 1
    mask[100:120, 5:90] = 1
    enc = rle.encode(mask)
    assert np.array_equal(rle.decode(enc), mask)


def test_native_matches_python_fallback(rng):
    for _ in range(5):
        mask = (rng.random((33, 47)) > 0.7).astype(np.uint8)
        native = rle.encode(mask)
        py = rle._np_counts_to_string(rle._np_counts_from_mask(mask))
        assert native["counts"] == py
        assert np.array_equal(rle._np_decode(py, 33, 47), mask)


def test_bytes_counts_accepted(rng):
    mask = (rng.random((16, 16)) > 0.5).astype(np.uint8)
    enc = rle.encode(mask)
    enc_bytes = {"size": enc["size"], "counts": enc["counts"].encode("ascii")}
    assert np.array_equal(rle.decode(enc_bytes), mask)


def test_masklet_roundtrip(rng):
    masklet = (rng.random((12, 40, 30)) > 0.6).astype(np.uint8)
    encs = rle.encode_masklet(masklet)
    assert len(encs) == 12
    dec = rle.decode_masklet(encs)
    assert np.array_equal(dec, masklet)
    # per-frame encode must match the batched encode
    for i in range(12):
        assert encs[i]["counts"] == rle.encode(masklet[i])["counts"]


def test_masklet_none_frames_become_zeros(rng):
    """Non-dict entries fill with zeros (dataloader.py:363-367)."""
    masklet = (rng.random((4, 10, 8)) > 0.5).astype(np.uint8)
    encs = rle.encode_masklet(masklet)
    encs[1] = None
    encs[3] = 0
    dec = rle.decode_masklet(encs)
    assert np.array_equal(dec[0], masklet[0])
    assert dec[1].sum() == 0
    assert np.array_equal(dec[2], masklet[2])
    assert dec[3].sum() == 0
