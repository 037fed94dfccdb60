"""Native C++ mask codec vs. pure-numpy oracle (and COCO format semantics)."""
import numpy as np
import pytest

from scene_generation_tpu.data import rle


def _compress(counts):
    """Encode counts to the compressed string (pycocotools rleToString)."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_native_lib_compiles():
    assert rle.native_available(), "g++ build of librle.so failed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_uncompressed(seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(5, 40), rng.randint(5, 40)
    mask = (rng.rand(h, w) > 0.5).astype(np.uint8)
    counts = rle.encode_counts_py(mask)
    seg = {"counts": counts, "size": (h, w)}
    got_native = rle.seg_to_mask(seg, w, h, use_native=True)
    got_py = rle.seg_to_mask(seg, w, h, use_native=False)
    np.testing.assert_array_equal(got_native, mask)
    np.testing.assert_array_equal(got_py, mask)


@pytest.mark.parametrize("seed", [3, 4])
def test_roundtrip_compressed_string(seed):
    rng = np.random.RandomState(seed)
    h, w = 33, 27
    mask = (rng.rand(h, w) > 0.7).astype(np.uint8)
    counts = rle.encode_counts_py(mask)
    s = _compress(counts)
    # String decoder path (delta + varint), native and python.
    assert rle.rle_counts_from_string(s) == counts
    seg = {"counts": s, "size": (h, w)}
    np.testing.assert_array_equal(rle.seg_to_mask(seg, w, h, True), mask)
    np.testing.assert_array_equal(rle.seg_to_mask(seg, w, h, False), mask)


def test_polygon_rectangle():
    # Axis-aligned rectangle [2, 3] x [10, 8] -> exact pixel fill.
    poly = [2.0, 3.0, 10.0, 3.0, 10.0, 8.0, 2.0, 8.0]
    want = np.zeros((12, 14), np.uint8)
    want[3:8, 2:10] = 1
    got_n = rle.seg_to_mask([poly], 14, 12, use_native=True)
    got_p = rle.seg_to_mask([poly], 14, 12, use_native=False)
    np.testing.assert_array_equal(got_n, want)
    np.testing.assert_array_equal(got_p, want)


def test_polygon_union_and_native_matches_py():
    rng = np.random.RandomState(7)
    polys = []
    for _ in range(3):
        cx, cy = rng.uniform(5, 25, 2)
        r = rng.uniform(2, 6)
        ang = np.linspace(0, 2 * np.pi, 9)[:-1]
        pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
        polys.append(pts.reshape(-1).tolist())
    got_n = rle.seg_to_mask(polys, 30, 30, use_native=True)
    got_p = rle.seg_to_mask(polys, 30, 30, use_native=False)
    np.testing.assert_array_equal(got_n, got_p)
    assert got_n.sum() > 0
