"""ctypes bindings for the C++ batch WAV decoder (csrc/wav_decoder.cc).

Auto-builds the shared library on first use (`make -C csrc`); every call
site falls back to the numpy decoder (data/wav.py) when the native lib
is unavailable, so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from tcresnet_tpu.utils import get_logger

log = get_logger("native")

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "build" / "libtcresnet_host.so"
_lib = None
_lib_checked = False


def _stale() -> bool:
    """True when the .so is missing or older than any C++ source."""
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any(
        src.stat().st_mtime > lib_mtime for src in _CSRC.glob("*.cc")
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if _stale():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # toolchain unavailable -> numpy fallback
            if not _LIB_PATH.exists():
                log.info(f"native decoder unavailable ({e}); using numpy fallback")
                return None
            log.info(f"native decoder rebuild failed ({e}); using existing lib")
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.tcresnet_decode_batch.restype = ctypes.c_int
        lib.tcresnet_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.tcresnet_wav_num_samples.restype = ctypes.c_int
        lib.tcresnet_wav_num_samples.argtypes = [ctypes.c_char_p]
        _lib = lib
        log.info(f"native decoder loaded: {_LIB_PATH}")
    except OSError as e:
        log.info(f"native decoder load failed ({e}); using numpy fallback")
    return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    filenames: Sequence[str],
    desired_samples: int,
    n_threads: int = 0,
    expected_rate: int = 0,
) -> Optional[np.ndarray]:
    """Decode wavs into [N, desired_samples] int16, or None if the native
    lib is unavailable. Raises on undecodable files (matching the numpy
    path's behavior of failing loudly on bad data). expected_rate > 0
    rejects files whose header sample rate differs (status -4)."""
    lib = _load()
    if lib is None:
        return None
    n = len(filenames)
    out = np.zeros((n, desired_samples), np.int16)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[f.encode() for f in filenames])
    failures = lib.tcresnet_decode_batch(
        arr,
        n,
        desired_samples,
        expected_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    if failures:
        bad = [
            f"{filenames[i]} (rc={status[i]})"
            for i in np.nonzero(status)[0][:5]
        ]
        raise ValueError(f"{failures} wav files failed to decode, e.g. {bad}")
    return out


def wav_num_samples(path: str) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    rc = lib.tcresnet_wav_num_samples(str(path).encode())
    return rc if rc >= 0 else None
