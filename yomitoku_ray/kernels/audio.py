"""Pure-stdlib WAV audio decode + feature kernels (wave module + numpy).

Real signal processing with no audio library: PCM decode (8/16/32-bit int,
mono or multi-channel), duration/RMS/zero-crossing-rate, and dominant
frequency via numpy rFFT. Non-WAV payloads raise ``AudioError`` so stage
policies can stub or skip them — mirroring the PNG-real/JPEG-seam split on
the image side.
"""

from __future__ import annotations

import io
import wave

import numpy as np


class AudioError(ValueError):
    pass


_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1, 1], sample_rate)."""
    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            n_channels = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError) as e:
        raise AudioError(f"not a decodable wav: {e}") from e
    if width not in _WIDTH_DTYPE:
        raise AudioError(f"unsupported sample width {width}")
    x = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).astype(np.float64)
    if width == 1:  # 8-bit wav is unsigned
        x = x - 128.0
        x /= 128.0
    else:
        x /= float(1 << (8 * width - 1))
    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float [-1, 1] mono -> 16-bit PCM WAV bytes (for tests/round trips)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(blob: bytes) -> dict:
    """Real per-clip features: duration, RMS, zero-crossing rate, dominant
    frequency (rFFT peak, DC excluded)."""
    x, rate = decode_wav(blob)
    n = len(x)
    if n == 0:
        return {
            "duration_ms": 0,
            "sample_rate": int(rate),
            "rms_milli": 0,
            "zcr_per_sec_milli": 0,
            "dominant_hz": 0,
        }
    rms = float(np.sqrt(np.mean(x * x)))
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    zcr = zc * rate / n
    spec = np.abs(np.fft.rfft(x))
    dominant = 0.0
    if len(spec) > 1:
        k = 1 + int(np.argmax(spec[1:]))  # skip DC
        dominant = k * rate / n
    # int-only outputs (milli-scaled) keep downstream hashing float-free.
    return {
        "duration_ms": int(round(1000 * n / rate)),
        "sample_rate": int(rate),
        "rms_milli": int(round(1000 * rms)),
        "zcr_per_sec_milli": int(round(1000 * zcr)),
        "dominant_hz": int(round(dominant)),
    }
