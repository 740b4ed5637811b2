"""Native (C++) runtime tier, bound via ctypes.

Components:
  * ``ctc_beam_decode``: CTC prefix beam search over recognizer
    log-probs (ctc_beam.cpp). Branch-heavy sequential host work that the
    TPU can't express and Python can't do at pipeline rates.

The shared library builds on first use (``g++ -O3 -shared``) and is
cached next to the sources; ``build()`` can be called explicitly (e.g.
in a Docker build). Pure-Python fallbacks keep the framework functional
without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import math
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent
_LIB_PATH = _SRC_DIR / "libvtdnative.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(force: bool = False) -> Optional[Path]:
    """Compile the native library. Returns the .so path or None."""
    global _build_failed
    src = _SRC_DIR / "ctc_beam.cpp"
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(src), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        logger.info("built %s", _LIB_PATH)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as e:
        _build_failed = True
        logger.warning("native build failed (%s); using Python fallback", e)
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.ctc_beam_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # log_probs
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B, T, V
            ctypes.c_int, ctypes.c_int,  # beam_width, blank
            ctypes.POINTER(ctypes.c_int32),  # out_ids
            ctypes.POINTER(ctypes.c_int32),  # out_lens
            ctypes.POINTER(ctypes.c_float),  # out_scores
            ctypes.c_int, ctypes.c_int,  # max_len, n_threads
        ]
        lib.ctc_beam_decode_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def ctc_beam_decode(
    log_probs: np.ndarray,
    beam_width: int = 8,
    blank: int = 0,
    max_len: int = 64,
    n_threads: int = 0,
) -> Tuple[List[List[int]], np.ndarray]:
    """[B, T, V] log-probs -> (list of id sequences, scores [B]).

    Uses the C++ decoder when available, else the Python fallback.
    """
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    b, t, v = lp.shape
    lib = _get_lib()
    if lib is None:
        return _py_beam_batch(lp, beam_width, blank, max_len)

    out_ids = np.zeros((b, max_len), np.int32)
    out_lens = np.zeros((b,), np.int32)
    out_scores = np.zeros((b,), np.float32)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.ctc_beam_decode_batch(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, t, v, beam_width, blank,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, n_threads,
    )
    seqs = [out_ids[i, : out_lens[i]].tolist() for i in range(b)]
    return seqs, out_scores


# ---------------------------------------------------------------------------
# Pure-Python reference (also the correctness oracle in tests)
# ---------------------------------------------------------------------------
def _log_add(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def _py_beam_one(lp: np.ndarray, beam_width: int, blank: int):
    beams = {(): (0.0, -math.inf)}  # prefix -> (p_blank, p_non_blank)
    t_steps, v = lp.shape
    prune = min(v, max(beam_width * 2, 8))
    for t in range(t_steps):
        row = lp[t]
        top = np.argpartition(-row, prune - 1)[:prune]
        next_beams: dict = {}

        def upsert(prefix, add_b, add_nb):
            pb, pnb = next_beams.get(prefix, (-math.inf, -math.inf))
            next_beams[prefix] = (_log_add(pb, add_b), _log_add(pnb, add_nb))

        for prefix, (p_b, p_nb) in beams.items():
            total = _log_add(p_b, p_nb)
            last = prefix[-1] if prefix else -1
            upsert(prefix, total + row[blank], -math.inf)
            for s in top:
                s = int(s)
                if s == blank:
                    continue
                p = float(row[s])
                if s == last:
                    upsert(prefix, -math.inf, p_nb + p)
                    upsert(prefix + (s,), -math.inf, p_b + p)
                else:
                    upsert(prefix + (s,), -math.inf, total + p)
        beams = dict(
            sorted(
                next_beams.items(),
                key=lambda kv: -_log_add(*kv[1]),
            )[:beam_width]
        )
    best, (p_b, p_nb) = max(
        beams.items(), key=lambda kv: _log_add(*kv[1])
    )
    return list(best), _log_add(p_b, p_nb)


def _py_beam_batch(lp, beam_width, blank, max_len):
    seqs, scores = [], []
    for i in range(lp.shape[0]):
        ids, score = _py_beam_one(lp[i], beam_width, blank)
        seqs.append(ids[:max_len])
        scores.append(score)
    return seqs, np.asarray(scores, np.float32)
