"""Native host runtime: C++ ops behind ctypes, numpy fallbacks.

Compiled on first use with g++ -O3 (cached next to the source; no
pybind11 in the image — plain C ABI + ctypes). Every op has a pure
numpy/python fallback so the framework works even without a compiler.

Ops: greedy NMS, bilinear resize, RGBA compositing, u8->f32 batch
normalization, IoU-targeted crop search (the synthetic compositor's
rejection-sampling inner loop, ``paste_and_crop_sheep.py:45-81``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loans_host.cpp")
_LIB_PATH = os.path.join(_HERE, "_loans_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if (
            os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= src_mtime
        ):
            return _LIB_PATH
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", _LIB_PATH + ".tmp", _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            c_f32p = ctypes.POINTER(ctypes.c_float)
            c_i32p = ctypes.POINTER(ctypes.c_int)
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.loans_nms.restype = ctypes.c_int
            lib.loans_nms.argtypes = [
                c_f32p, c_i32p, ctypes.c_int, ctypes.c_float, c_i32p,
            ]
            lib.loans_resize_bilinear_u8.argtypes = [
                c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                c_u8p, ctypes.c_int, ctypes.c_int,
            ]
            lib.loans_composite_rgba.argtypes = [
                c_u8p, ctypes.c_int, ctypes.c_int,
                c_u8p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.loans_u8_to_f32.argtypes = [
                c_u8p, c_f32p, ctypes.c_int64,
            ]
            lib.loans_iou_crop_search.restype = ctypes.c_int
            lib.loans_iou_crop_search.argtypes = [
                c_f32p, ctypes.c_float, ctypes.c_float,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_uint64, c_i32p,
            ]
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def nms(boxes: np.ndarray, thresh: float, score=None) -> np.ndarray:
    """Greedy NMS; identical contract to
    ``evaluation.metrics.non_maximum_suppression``."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float32).reshape(-1, 4)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int64)
    order = (
        np.asarray(score).reshape(-1).argsort()[::-1].astype(np.int32)
        if score is not None
        else np.arange(n, dtype=np.int32)
    )
    lib = get_lib()
    if lib is None:
        from loans_tpu.evaluation.metrics import non_maximum_suppression

        return non_maximum_suppression(boxes, thresh, score)
    order = np.ascontiguousarray(order)
    keep = np.empty(n, dtype=np.int32)
    n_keep = lib.loans_nms(
        _ptr(boxes, ctypes.c_float),
        _ptr(order, ctypes.c_int),
        n,
        float(thresh),
        _ptr(keep, ctypes.c_int),
    )
    return keep[:n_keep].astype(np.int64)


def resize_bilinear(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """uint8 HWC bilinear resize (cv2.INTER_LINEAR convention)."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8 or img.ndim != 3:
        raise ValueError("expects uint8 HWC")
    dh, dw = out_hw
    lib = get_lib()
    if lib is None:
        import cv2

        return cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
    dst = np.empty((dh, dw, img.shape[2]), dtype=np.uint8)
    lib.loans_resize_bilinear_u8(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
        img.shape[2], _ptr(dst, ctypes.c_uint8), dh, dw,
    )
    return dst


def composite_rgba(
    canvas: np.ndarray, stamp: np.ndarray, top: int, left: int
) -> np.ndarray:
    """In-place alpha blend of an RGBA stamp onto an RGB uint8 canvas."""
    canvas = np.ascontiguousarray(canvas)
    stamp = np.ascontiguousarray(stamp)
    lib = get_lib()
    if lib is None:
        h, w = stamp.shape[:2]
        y0, x0 = max(top, 0), max(left, 0)
        y1 = min(top + h, canvas.shape[0])
        x1 = min(left + w, canvas.shape[1])
        if y1 <= y0 or x1 <= x0:
            return canvas
        s = stamp[y0 - top : y1 - top, x0 - left : x1 - left]
        a = s[..., 3:4].astype(np.float32) / 255.0
        region = canvas[y0:y1, x0:x1].astype(np.float32)
        canvas[y0:y1, x0:x1] = (
            s[..., :3] * a + region * (1 - a) + 0.5
        ).astype(np.uint8)
        return canvas
    lib.loans_composite_rgba(
        _ptr(canvas, ctypes.c_uint8), canvas.shape[0], canvas.shape[1],
        _ptr(stamp, ctypes.c_uint8), stamp.shape[0], stamp.shape[1],
        int(top), int(left),
    )
    return canvas


def u8_to_f32(src: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """uint8 -> float32 / 255 (batch packing hot path)."""
    src = np.ascontiguousarray(src)
    lib = get_lib()
    if lib is None:
        return src.astype(np.float32) / 255.0
    if out is None:
        out = np.empty(src.shape, dtype=np.float32)
    lib.loans_u8_to_f32(
        _ptr(src, ctypes.c_uint8), _ptr(out, ctypes.c_float), src.size
    )
    return out


def iou_crop_search(
    paste_box,
    target: float,
    tol: float,
    img_hw: tuple[int, int],
    crop_hw: tuple[int, int],
    max_trials: int = 40000,
    seed: int = 0,
):
    """Find (y, x) of a crop whose IoU with paste_box is ~target.

    Returns None when no crop within tolerance is found.
    """
    paste = np.ascontiguousarray(paste_box, dtype=np.float32).reshape(4)
    lib = get_lib()
    if lib is None:
        rng = np.random.default_rng(seed)
        ch, cw = crop_hw
        for _ in range(max_trials):
            y = int(rng.integers(0, max(img_hw[0] - ch, 0) + 1))
            x = int(rng.integers(0, max(img_hw[1] - cw, 0) + 1))
            crop = np.array([y, x, y + ch, x + cw], dtype=np.float32)
            yy1, xx1 = max(crop[0], paste[0]), max(crop[1], paste[1])
            yy2, xx2 = min(crop[2], paste[2]), min(crop[3], paste[3])
            inter = max(yy2 - yy1, 0) * max(xx2 - xx1, 0)
            area_c = ch * cw
            area_p = (paste[2] - paste[0]) * (paste[3] - paste[1])
            uni = area_c + area_p - inter
            v = inter / uni if uni > 0 else 0.0
            if abs(v - target) <= tol:
                return y, x
        return None
    out = np.empty(2, dtype=np.int32)
    ok = lib.loans_iou_crop_search(
        _ptr(paste, ctypes.c_float), float(target), float(tol),
        int(img_hw[0]), int(img_hw[1]), int(crop_hw[0]), int(crop_hw[1]),
        int(max_trials), int(seed) & 0xFFFFFFFFFFFFFFFF, _ptr(out, ctypes.c_int),
    )
    return (int(out[0]), int(out[1])) if ok else None
