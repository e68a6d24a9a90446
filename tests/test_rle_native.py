"""Native C++ RLE codec vs the numpy reference implementation."""

import numpy as np
import pytest

from mxdetection_tpu.eval import rle as pyrle
from mxdetection_tpu.eval import rle_native as crle

pytestmark = pytest.mark.skipif(not crle.available(), reason="no C++ toolchain")


def test_native_encode_matches_python():
    rng = np.random.RandomState(0)
    for shape in [(17, 23), (64, 64), (5, 200)]:
        mask = rng.rand(*shape) > 0.6
        a = pyrle.encode_rle(mask)
        b = crle.encode(mask)
        assert a == b


def test_native_decode_roundtrip():
    rng = np.random.RandomState(1)
    mask = rng.rand(48, 31) > 0.5
    enc = crle.encode(mask)
    np.testing.assert_array_equal(crle.decode(enc), mask.astype(np.uint8))
    assert crle.area(enc) == int(mask.sum())


def test_native_iou_matches_python():
    rng = np.random.RandomState(2)
    for _ in range(5):
        a = rng.rand(40, 40) > 0.5
        b = rng.rand(40, 40) > 0.5
        ea, eb = crle.encode(a), crle.encode(b)
        assert abs(crle.iou(ea, eb) - pyrle.rle_iou(ea, eb)) < 1e-12
        assert abs(crle.iou(ea, eb, True) - pyrle.rle_iou(ea, eb, True)) < 1e-12


def test_native_iou_matrix():
    rng = np.random.RandomState(3)
    dts = [crle.encode(rng.rand(30, 30) > 0.5) for _ in range(4)]
    gts = [crle.encode(rng.rand(30, 30) > 0.5) for _ in range(3)]
    crowd = np.asarray([False, True, False])
    got = crle.iou_matrix(dts, gts, crowd)
    for i in range(4):
        for j in range(3):
            assert abs(got[i, j] - crle.iou(dts[i], gts[j], crowd[j])) < 1e-12
