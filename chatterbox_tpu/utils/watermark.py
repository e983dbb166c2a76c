"""Perth watermarking shim.

The reference applies resemble-perth's implicit neural watermark to every
output wav (ref: tts.py:126,271; vc.py:29,103; tts_turbo.py:133,319;
mtl_tts.py:175,354). perth is a CPU-side numpy post-process, orthogonal to
the TPU compute path — we use it when installed and fall back to identity
(with a one-time warning) when it isn't.
"""
from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)
_warned = False


class Watermarker:
    def __init__(self):
        self._perth = None
        try:
            import perth  # type: ignore
            self._perth = perth.PerthImplicitWatermarker()
        except ImportError:
            global _warned
            if not _warned:
                logger.warning("resemble-perth not installed — outputs will NOT "
                               "be watermarked")
                _warned = True

    def apply_watermark(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        if self._perth is not None:
            return self._perth.apply_watermark(wav, sample_rate=sample_rate)
        return wav

    def get_watermark(self, wav: np.ndarray, sample_rate: int):
        if self._perth is not None:
            return self._perth.get_watermark(wav, sample_rate=sample_rate)
        raise RuntimeError("resemble-perth not installed")
