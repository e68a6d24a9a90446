"""ctypes binding for the native C++ RLE codec (native/rle.cpp).

Auto-builds the shared library on first use if a toolchain is present
(mirrors how the reference built its Cython/CUDA ops at setup time);
falls back to the numpy implementation in ``rle.py`` when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    ip = ctypes.POINTER(ctypes.c_int)
    up = ctypes.POINTER(ctypes.c_uint8)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [up, ctypes.c_int, ctypes.c_int, ip, ctypes.c_int]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [ip, ctypes.c_int, ctypes.c_int, ctypes.c_int, up]
    lib.rle_area.restype = ctypes.c_long
    lib.rle_area.argtypes = [ip, ctypes.c_int]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [ip, ctypes.c_int, ip, ctypes.c_int, ctypes.c_int]
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [ip, ip, ctypes.c_int, ip, ip, ctypes.c_int, up, dp]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_int_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def encode(mask: np.ndarray) -> dict:
    lib = _load()
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    flat = np.ascontiguousarray(flat)
    buf = np.zeros(h * w + 2, np.int32)
    n = lib.rle_encode(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       h, w, _as_int_ptr(buf), len(buf))
    assert n > 0
    return {"size": [int(h), int(w)], "counts": buf[:n].tolist()}


def decode(rle: dict) -> np.ndarray:
    lib = _load()
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int32)
    out = np.zeros(h * w, np.uint8)
    lib.rle_decode(_as_int_ptr(counts), len(counts), h, w,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.reshape((h, w), order="F")


def area(rle: dict) -> int:
    lib = _load()
    counts = np.asarray(rle["counts"], np.int32)
    return int(lib.rle_area(_as_int_ptr(counts), len(counts)))


def iou(dt: dict, gt: dict, iscrowd: bool = False) -> float:
    lib = _load()
    d = np.asarray(dt["counts"], np.int32)
    g = np.asarray(gt["counts"], np.int32)
    return float(lib.rle_iou(_as_int_ptr(d), len(d), _as_int_ptr(g), len(g),
                             int(iscrowd)))


def iou_matrix(dts: list[dict], gts: list[dict], iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) IoU matrix via one native call."""
    lib = _load()
    if not dts or not gts:
        return np.zeros((len(dts), len(gts)))

    def pack(rles):
        runs = np.concatenate([np.asarray(r["counts"], np.int32) for r in rles])
        off = np.zeros(len(rles) + 1, np.int32)
        np.cumsum([len(r["counts"]) for r in rles], out=off[1:])
        return np.ascontiguousarray(runs), off

    druns, doff = pack(dts)
    gruns, goff = pack(gts)
    crowd = np.ascontiguousarray(np.asarray(iscrowd, np.uint8))
    out = np.zeros((len(dts), len(gts)), np.float64)
    lib.rle_iou_matrix(
        _as_int_ptr(druns), _as_int_ptr(doff), len(dts),
        _as_int_ptr(gruns), _as_int_ptr(goff), len(gts),
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
