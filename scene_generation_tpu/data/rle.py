"""COCO mask codec wrapper: C++ fast path + pure-numpy fallback/oracle.

Replaces ``pycocotools.mask`` in the data pipeline (reference ``seg_to_mask``,
coco.py:475-486). The C++ library (native/rle.cpp) is compiled on first use
with g++; the numpy implementation has identical semantics and doubles as the
test oracle.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Union

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "rle.cpp")
_SO = os.path.join(_NATIVE_DIR, "librle.so")
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p]
        lib.rle_decode_counts.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int,
                                          ctypes.c_void_p]
        lib.polygons_to_mask.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_void_p]
        lib.rle_encode_counts.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_void_p,
                                          ctypes.c_int]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


# --- pure numpy reference implementations -------------------------------

def rle_counts_from_string(s: Union[str, bytes]) -> List[int]:
    """Decode the compressed counts string (pycocotools rleFrString)."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def decode_counts_py(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in counts:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val = 1 - val
    return flat.reshape(w, h).T  # column-major


def polygons_to_mask_py(polys: Sequence[Sequence[float]], h: int,
                        w: int) -> np.ndarray:
    """Even-odd scanline fill at pixel centers; union over polygons."""
    out = np.zeros((h, w), np.uint8)
    for poly in polys:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        n = len(pts)
        for row in range(h):
            y = row + 0.5
            xs = []
            for i in range(n):
                x0, y0 = pts[i]
                x1, y1 = pts[(i + 1) % n]
                if (y0 <= y < y1) or (y1 <= y < y0):
                    t = (y - y0) / (y1 - y0)
                    xs.append(x0 + t * (x1 - x0))
            xs.sort()
            for i in range(0, len(xs) - 1, 2):
                c0 = max(int(np.ceil(xs[i] - 0.5)), 0)
                c1 = min(int(np.floor(xs[i + 1] - 0.5)), w - 1)
                if c1 >= c0:
                    out[row, c0:c1 + 1] = 1
    return out


def encode_counts_py(mask: np.ndarray) -> List[int]:
    flat = mask.T.reshape(-1).astype(np.uint8)
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return runs


# --- public API ----------------------------------------------------------

def seg_to_mask(seg, width: int, height: int,
                use_native: bool = True) -> np.ndarray:
    """Decode any COCO segmentation format to an (H, W) uint8 mask.

    Mirrors reference ``seg_to_mask`` (coco.py:475-486): polygon lists are
    unioned; dicts hold either uncompressed (list) or compressed (str/bytes)
    counts.
    """
    lib = _load_lib() if use_native else None
    h, w = int(height), int(width)
    if isinstance(seg, list):
        polys = [p for p in seg if len(p) >= 6]
        if not polys:
            return np.zeros((h, w), np.uint8)
        if lib is not None:
            xy = np.concatenate([np.asarray(p, np.float64) for p in polys])
            sizes = np.asarray([len(p) // 2 for p in polys], np.int32)
            out = np.zeros((h, w), np.uint8)
            lib.polygons_to_mask(
                xy.ctypes.data, sizes.ctypes.data, len(polys), h, w,
                out.ctypes.data)
            return out
        return polygons_to_mask_py(polys, h, w)

    counts = seg["counts"]
    sh, sw = seg.get("size", (h, w))
    sh, sw = int(sh), int(sw)
    if isinstance(counts, list):
        arr = np.asarray(counts, np.uint32)
        if lib is not None:
            out = np.zeros((sh, sw), np.uint8)
            if lib.rle_decode_counts(arr.ctypes.data, len(arr), sh, sw,
                                     out.ctypes.data) == 0:
                return out
        return decode_counts_py(arr.tolist(), sh, sw)

    if isinstance(counts, str):
        counts = counts.encode("ascii")
    if lib is not None:
        out = np.zeros((sh, sw), np.uint8)
        if lib.rle_decode(counts, sh, sw, out.ctypes.data) == 0:
            return out
    return decode_counts_py(rle_counts_from_string(counts), sh, sw)


def native_available() -> bool:
    return _load_lib() is not None
