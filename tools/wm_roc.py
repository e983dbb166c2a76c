"""Watermark threshold ROC: score distributions over synthetic program
material, to derive DETECT_Z empirically instead of eyeballing a handful of
cases (r3 verdict weak #6).

Clip classes (clean TTS-adjacent and adversarial): white noise, pink noise,
AR(2) speech-like noise, harmonic voiced tones with AM, impulsive
click/burst trains, and silence-with-bursts; durations 2–8 s. Three score
populations:

  * unmarked  — clean clips scored with the service key;
  * wrong-key — clips MARKED with random other keys, scored with ours;
  * embedded  — clips marked with the service key (worst case reported),
                payload round-trip checked on every clip.

Output: quantiles + maxima per population and the suggested threshold
(max false score × 1.15, rounded up). Paste the numbers into
utils/watermark.py's DETECT_Z comment when they move.

Usage: python tools/wm_roc.py [--n 160]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_tpu.utils.watermark import (SpreadSpectrumWatermarker,
                                            PAYLOAD_BITS)

SR = 24000


def make_clip(kind: str, seconds: float, rng) -> np.ndarray:
    n = int(seconds * SR)
    t = np.arange(n) / SR
    if kind == "white":
        x = rng.standard_normal(n)
    elif kind == "pink":
        f = np.fft.rfftfreq(n, 1 / SR)
        spec = (rng.standard_normal(len(f)) + 1j * rng.standard_normal(len(f)))
        spec /= np.maximum(np.sqrt(f), 1.0)
        x = np.fft.irfft(spec, n=n)
    elif kind == "ar":          # AR(2) speech-band-ish noise
        e = rng.standard_normal(n)
        x = np.zeros(n)
        for i in range(2, n):
            x[i] = 1.6 * x[i - 1] - 0.68 * x[i - 2] + e[i]
    elif kind == "voiced":
        f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t + rng.uniform(0, 6))
        x = sum(np.sin(2 * np.pi * k * np.cumsum(f0) / SR) / k
                for k in range(1, 7))
        x *= 0.5 + 0.5 * np.sin(2 * np.pi * 2.3 * t + rng.uniform(0, 6)) ** 2
    elif kind == "bursts":
        x = np.zeros(n)
        for _ in range(int(seconds * 8)):
            i = rng.integers(0, n - 400)
            x[i: i + 400] += rng.standard_normal(400) * np.hanning(400) * 3
    else:                        # silence + sparse bursts
        x = 0.001 * rng.standard_normal(n)
        for _ in range(int(seconds * 2)):
            i = rng.integers(0, n - 2400)
            x[i: i + 2400] += (np.sin(2 * np.pi * 800 * t[:2400])
                               * np.hanning(2400))
    x = x / (np.max(np.abs(x)) + 1e-9) * 0.5
    return x.astype(np.float32)


KINDS = ["white", "pink", "ar", "voiced", "bursts", "quiet"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160,
                    help="clips per population")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    wm = SpreadSpectrumWatermarker()

    pops = {"unmarked": [], "wrong_key": [], "embedded": []}
    payload_errors, payload_errors_3s, n_3s = 0, 0, 0
    worst, worst_4s = (1e9, None), (1e9, None)
    for i in range(args.n):
        kind = KINDS[i % len(KINDS)]
        seconds = float(rng.uniform(2.0, 8.0))
        clip = make_clip(kind, seconds, rng)

        pops["unmarked"].append(wm.detect(clip, SR)[0])

        other = SpreadSpectrumWatermarker(key=f"other-{i}")
        pops["wrong_key"].append(
            wm.detect(other.apply_watermark(clip, sample_rate=SR), SR)[0])

        payload = int(rng.integers(0, 1 << PAYLOAD_BITS))
        z, got = wm.detect(wm.apply_watermark(clip, sample_rate=SR,
                                              payload=payload), SR)
        pops["embedded"].append(z)
        if got != payload:
            payload_errors += 1
            payload_errors_3s += seconds >= 3.0
        n_3s += seconds >= 3.0
        if z < worst[0]:
            worst = (z, f"{kind} {seconds:.1f}s")
        if seconds >= 4.0 and z < worst_4s[0]:
            worst_4s = (z, f"{kind} {seconds:.1f}s")

    for name, zs in pops.items():
        zs = np.asarray(zs)
        print(f"{name:9s}: n={len(zs)} max={zs.max():5.1f} "
              f"p99={np.quantile(zs, 0.99):5.1f} "
              f"p50={np.quantile(zs, 0.5):5.1f} min={zs.min():5.1f}")
    false_max = max(np.max(pops["unmarked"]), np.max(pops["wrong_key"]))
    thresh = float(np.ceil(false_max * 1.15))
    print(f"suggested DETECT_Z = {thresh:.0f}  "
          f"(false-max {false_max:.1f} × 1.15)")
    print(f"embedded worst case: z={worst[0]:.1f} ({worst[1]}) → "
          f"{worst[0] / thresh:.1f}× threshold "
          f"({'OK' if worst[0] >= 2 * thresh else 'BELOW 2×'})")
    print(f"embedded worst case ≥4 s: z={worst_4s[0]:.1f} ({worst_4s[1]}) → "
          f"{worst_4s[0] / thresh:.1f}× threshold")
    print(f"payload round-trip errors: {payload_errors}/{args.n} "
          f"(on ≥3 s clips: {payload_errors_3s}/{n_3s})")


if __name__ == "__main__":
    main()
