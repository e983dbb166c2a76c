"""Native host runtime (C++, ctypes-bound).

Builds runtime/wavio.cpp with g++ on first use (cached as _wavio.so next to
the source). Falls back to None when the toolchain is unavailable — callers
(utils/audio_io.py) then use the scipy path.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_SO = _DIR / "_wavio.so"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


class _WavInfo(ctypes.Structure):
    _fields_ = [("sample_rate", ctypes.c_int32), ("channels", ctypes.c_int32),
                ("bits", ctypes.c_int32), ("is_float", ctypes.c_int32),
                ("n_frames", ctypes.c_int64), ("data_offset", ctypes.c_int64)]


def _build() -> bool:
    src = _DIR / "wavio.cpp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing or build failure
        logger.info(f"native wavio build unavailable ({e}); using scipy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() or _SO.stat().st_mtime < (_DIR / "wavio.cpp").stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_read_mono_f32.argtypes = [ctypes.c_char_p,
                                      np.ctypeslib.ndpointer(np.float32),
                                      ctypes.c_int64]
    lib.wav_read_mono_f32.restype = ctypes.c_int64
    lib.wav_write_f32.argtypes = [ctypes.c_char_p,
                                  np.ctypeslib.ndpointer(np.float32),
                                  ctypes.c_int64, ctypes.c_int32]
    lib.wav_write_f32.restype = ctypes.c_int
    lib.pcm16_from_f32.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                   np.ctypeslib.ndpointer(np.int16),
                                   ctypes.c_int64]
    lib.pcm16_from_f32.restype = None
    _LIB = lib
    return _LIB


def read_wav(path: str):
    """Returns (wav float32 mono, sample_rate) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    info = _WavInfo()
    if lib.wav_info(path.encode(), ctypes.byref(info)) != 0:
        return None
    out = np.empty(info.n_frames, np.float32)
    n = lib.wav_read_mono_f32(path.encode(), out, info.n_frames)
    if n < 0:
        return None
    return out[:n], int(info.sample_rate)


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    wav = np.ascontiguousarray(np.asarray(wav, np.float32).reshape(-1))
    return lib.wav_write_f32(path.encode(), wav, len(wav), sample_rate) == 0


def pcm16(wav: np.ndarray) -> np.ndarray:
    """float32 [-1,1] -> int16 PCM (native when available)."""
    wav = np.ascontiguousarray(np.asarray(wav, np.float32).reshape(-1))
    lib = get_lib()
    if lib is None:
        return (np.clip(wav, -1, 1) * 32767.0).astype(np.int16)
    out = np.empty(len(wav), np.int16)
    lib.pcm16_from_f32(wav, out, len(wav))
    return out
