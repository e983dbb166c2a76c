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


# ---------------------------------------------------------------------------
# threaded prefetching WAV loader (runtime/dataload.cpp)
# ---------------------------------------------------------------------------

_DL_SO = _DIR / "_dataload.so"
_DL_LIB: Optional[ctypes.CDLL] = None
_DL_TRIED = False


def get_dataload_lib() -> Optional[ctypes.CDLL]:
    global _DL_LIB, _DL_TRIED
    if _DL_LIB is not None or _DL_TRIED:
        return _DL_LIB
    _DL_TRIED = True
    srcs = [_DIR / "dataload.cpp", _DIR / "wavio.cpp"]
    newest = max(s.stat().st_mtime for s in srcs)
    if not _DL_SO.exists() or _DL_SO.stat().st_mtime < newest:
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                 "-o", str(_DL_SO)] + [str(s) for s in srcs],
                check=True, capture_output=True, timeout=180)
        except Exception as e:
            logger.info(f"native dataload build unavailable ({e}); "
                        "using python fallback")
            return None
    try:
        lib = ctypes.CDLL(str(_DL_SO))
    except OSError:
        return None
    lib.dl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                              ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
                              ctypes.c_uint64, ctypes.c_int32, ctypes.c_int64]
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            np.ctypeslib.ndpointer(np.float32),
                            ctypes.POINTER(ctypes.c_int64),
                            ctypes.POINTER(ctypes.c_int64),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.dl_next.restype = ctypes.c_int32
    lib.dl_errors.argtypes = [ctypes.c_void_p]
    lib.dl_errors.restype = ctypes.c_int64
    lib.dl_emitted.argtypes = [ctypes.c_void_p]
    lib.dl_emitted.restype = ctypes.c_int64
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    lib.dl_destroy.restype = None
    _DL_LIB = lib
    return _DL_LIB


class WavLoader:
    """Prefetching WAV clip loader over a list of paths.

    Native path: N C++ reader threads decode ahead into a bounded queue
    (runtime/dataload.cpp) — disk IO overlaps the accelerator step. Python
    fallback decodes lazily in-process when the toolchain is unavailable.
    Iterating yields (wav float32 (n,), path_index); order reshuffles every
    epoch from `seed` (reproducible), unreadable files are skipped.
    """

    def __init__(self, paths, *, n_threads: int = 4, max_frames: int,
                 epochs: int = 1, seed: int = 0, shuffle: bool = True,
                 queue_cap: int = 64):
        self.paths = [str(p) for p in paths]
        self.max_frames = int(max_frames)
        self.epochs = int(epochs)
        self.seed = seed
        self.shuffle = shuffle
        self._lib = get_dataload_lib()
        self._h = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._paths_arr = arr          # keep alive
            self._h = self._lib.dl_create(arr, len(self.paths), n_threads,
                                          self.max_frames, self.epochs,
                                          seed, int(shuffle), queue_cap)

    @property
    def native(self) -> bool:
        return self._h is not None

    def __iter__(self):
        if self._h is not None:
            buf = np.empty(self.max_frames, np.float32)
            n = ctypes.c_int64()
            pid = ctypes.c_int64()
            idx = ctypes.c_int64()
            while self._lib.dl_next(self._h, buf, ctypes.byref(n),
                                    ctypes.byref(pid), ctypes.byref(idx)):
                yield buf[: n.value].copy(), int(pid.value)
            return
        # python fallback: same order semantics, lazy single-threaded
        rng = np.random.default_rng(self.seed)
        from scipy.io import wavfile
        for _ in range(max(self.epochs, 1)):
            order = np.arange(len(self.paths))
            if self.shuffle:
                rng.shuffle(order)
            for pid in order:
                try:
                    _, data = wavfile.read(self.paths[pid])
                except Exception:
                    continue
                wav = np.asarray(data, np.float32)
                if data.dtype == np.int16:
                    wav = wav / 32768.0
                elif data.dtype == np.int32:
                    wav = wav / 2147483648.0
                if wav.ndim == 2:
                    wav = wav.mean(axis=1)
                yield wav[: self.max_frames], int(pid)

    def errors(self) -> int:
        return int(self._lib.dl_errors(self._h)) if self._h else 0

    def close(self):
        if self._h is not None:
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def batched_wavs(loader: WavLoader, batch: int):
    """Groups loader clips into right-padded (B, T_max) float32 batches.
    Yields (wavs, lens, path_ids); the final partial batch is included."""
    buf = []
    for wav, pid in loader:
        buf.append((wav, pid))
        if len(buf) == batch:
            yield _pack_batch(buf)
            buf = []
    if buf:
        yield _pack_batch(buf)


def _pack_batch(items):
    T = max(len(w) for w, _ in items)
    out = np.zeros((len(items), T), np.float32)
    lens = np.zeros(len(items), np.int64)
    pids = np.zeros(len(items), np.int64)
    for i, (w, p) in enumerate(items):
        out[i, : len(w)] = w
        lens[i] = len(w)
        pids[i] = p
    return out, lens, pids
