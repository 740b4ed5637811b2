"""ctypes binding for the native libav video decoder (video_decode.cpp).

The native path keeps sampled frames in the codec's own yuv420p from
decode through the scale to detector-input size (see the .cpp header
comment); the cv2 path it replaces pays two extra full-resolution
colorspace conversions per sampled frame. Falls back cleanly when the
system lacks libav dev libraries: ``open_video`` returns None and
callers keep using cv2 (video/processor.py).
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent
_LIB_PATH = _SRC_DIR / "libvtdvideo.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_AV_LIBS = ["-lavformat", "-lavcodec", "-lavutil", "-lswscale"]


def build(force: bool = False) -> Optional[Path]:
    """Compile libvtdvideo.so. Returns the path or None (no toolchain /
    no libav dev files)."""
    global _build_failed
    src = _SRC_DIR / "video_decode.cpp"
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(_LIB_PATH), *_AV_LIBS,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        logger.info("built %s", _LIB_PATH)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as e:
        _build_failed = True
        err = getattr(e, "stderr", b"") or b""
        logger.warning(
            "native video decoder build failed (%s %s); using cv2 decode",
            e, err.decode(errors="replace")[-500:],
        )
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError as e:
            logger.warning("native video decoder load failed: %s", e)
            _build_failed = True
            return None
        lib.vtd_vd_open.restype = ctypes.c_void_p
        lib.vtd_vd_open.argtypes = [ctypes.c_char_p]
        lib.vtd_vd_info.restype = ctypes.c_int
        lib.vtd_vd_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vtd_vd_seek.restype = ctypes.c_int
        lib.vtd_vd_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.vtd_vd_read_batch.restype = ctypes.c_int
        lib.vtd_vd_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vtd_vd_read_batch_kf.restype = ctypes.c_int
        lib.vtd_vd_read_batch_kf.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.vtd_vd_close.restype = None
        lib.vtd_vd_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


class NativeVideoReader:
    """Streaming decoder over one video file.

    ``read_batch(stride, max_frames)`` returns (frames, src_indices):
    frames is uint8 [n, out_h*3/2, out_w] (I420) or [n, out_h, out_w, 3]
    (BGR), n <= max_frames, n == 0 at EOF. Sampling matches the
    reference's stride contract (every ``stride``-th source frame,
    reference app/ml/utils/preprocessing.py:43-72).
    """

    def __init__(self, path: str, out_size: Tuple[int, int],
                 pixel_format: str = "yuv420"):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native video decoder unavailable")
        self._lib = lib
        self._h = lib.vtd_vd_open(str(path).encode())
        if not self._h:
            raise ValueError(f"cannot open video: {path}")
        self.out_w, self.out_h = out_size
        self.fmt = 1 if pixel_format == "bgr" else 0
        self.pixel_format = pixel_format
        if self.fmt == 0:
            # I420 plane math (chroma stride w/2, V offset w*h*5/4, buffer
            # h*3/2 rows) requires even dims; an odd source dimension
            # passed straight through (host_downscale unset) would make
            # sws_scale write past the numpy buffer. Losing <=1 px of
            # border is harmless; callers must read back out_w/out_h.
            self.out_w &= ~1
            self.out_h &= ~1
        self._hot = 0
        self._kf_reset = 0
        fps = ctypes.c_double()
        nframes = ctypes.c_int64()
        w = ctypes.c_int()
        hh = ctypes.c_int()
        lib.vtd_vd_info(self._h, ctypes.byref(fps), ctypes.byref(nframes),
                        ctypes.byref(w), ctypes.byref(hh))
        self.fps = fps.value
        self.frame_count = int(nframes.value)
        self.src_w, self.src_h = int(w.value), int(hh.value)

    def seek(self, src_index: int) -> None:
        """Position so the next emitted frame is ``src_index`` (exact)."""
        ret = self._lib.vtd_vd_seek(self._h, int(src_index))
        if ret < 0:
            raise ValueError(f"seek to frame {src_index} failed ({ret})")
        self._hot = 1  # seek leaves the target frame decoded + pending
        self._kf_reset = 1  # new segment: scene-change state restarts

    def read_batch(self, stride: int, max_frames: int,
                   src_end: int = -1) -> Tuple[np.ndarray, np.ndarray]:
        if self.fmt == 1:
            out = np.empty((max_frames, self.out_h, self.out_w, 3), np.uint8)
        else:
            out = np.empty(
                (max_frames, self.out_h * 3 // 2, self.out_w), np.uint8
            )
        idx = np.empty(max_frames, np.int64)
        n = self._lib.vtd_vd_read_batch(
            self._h, int(stride), int(max_frames), int(src_end), self._hot,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.out_w, self.out_h, self.fmt,
        )
        self._hot = 0
        if n < 0:
            raise RuntimeError(f"native decode error ({n})")
        return out[:n], idx[:n]

    def read_batch_kf(
        self, stride: int, max_frames: int, src_end: int = -1,
        kf_diff: float = 4.0, kf_max_gap: int = 20, max_dups: int = 4096,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Keyframe-gated read: returns (frames, src_indices, dup_indices,
        dup_refs). Near-duplicate candidates (64x36 luma mean-abs-diff
        below ``kf_diff`` vs the last kept frame, forced keyframe every
        ``kf_max_gap`` candidates) never cross the ctypes boundary as
        pixels — only their (source index, covering keyframe index)
        pair does. EOF when all four arrays are empty."""
        if self.fmt == 1:
            out = np.empty((max_frames, self.out_h, self.out_w, 3), np.uint8)
        else:
            out = np.empty(
                (max_frames, self.out_h * 3 // 2, self.out_w), np.uint8
            )
        idx = np.empty(max_frames, np.int64)
        dup_idx = np.empty(max_dups, np.int64)
        dup_ref = np.empty(max_dups, np.int64)
        n_dups = ctypes.c_int(0)
        n = self._lib.vtd_vd_read_batch_kf(
            self._h, int(stride), int(max_frames), int(src_end), self._hot,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.out_w, self.out_h, self.fmt,
            float(kf_diff), int(kf_max_gap), self._kf_reset,
            dup_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dup_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            int(max_dups), ctypes.byref(n_dups),
        )
        self._hot = 0
        self._kf_reset = 0
        if n < 0:
            raise RuntimeError(f"native decode error ({n})")
        k = int(n_dups.value)
        return out[:n], idx[:n], dup_idx[:k], dup_ref[:k]

    def close(self) -> None:
        if self._h:
            self._lib.vtd_vd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_video(path: str, out_size: Tuple[int, int],
               pixel_format: str = "yuv420") -> Optional[NativeVideoReader]:
    """NativeVideoReader or None when the native tier is unavailable or
    the container defeats it (callers fall back to cv2)."""
    if not available():
        return None
    try:
        return NativeVideoReader(path, out_size, pixel_format)
    except (ValueError, RuntimeError) as e:
        logger.info("native decode unavailable for %s: %s", path, e)
        return None
