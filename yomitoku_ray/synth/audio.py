"""Deterministic synthetic audio table (WAV blobs with known spectra).

Each row is a pure function of its index: single sine tones, two-tone
mixes (dominant = the louder), and white noise, at varied sample rates and
durations; ~4% junk rows. Ground-truth dominant frequency and RMS are
analytic, which the tests pin.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..kernels.audio import encode_wav

AUDIO_SCHEMA = pa.schema(
    [
        ("clip_id", pa.int64()),
        ("audio", pa.binary()),
        ("kind", pa.string()),
        ("true_hz", pa.int64()),
    ]
)

_RATES = (8000, 16000, 22050)


def gen_clip(i: int) -> dict:
    rng = np.random.RandomState(0xA0D10 ^ i)
    if i % 25 == 24:
        return {
            "clip_id": i,
            "audio": bytes(rng.randint(0, 256, 128, dtype=np.uint8)),
            "kind": "junk",
            "true_hz": 0,
        }
    rate = _RATES[i % len(_RATES)]
    seconds = 0.25 + 0.25 * (i % 3)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    # pick a frequency on an exact FFT bin so argmax is unambiguous
    k = int(rng.randint(8, n // 4))
    freq = k / seconds
    style = i % 3
    if style == 0:
        x = 0.5 * np.sin(2 * np.pi * freq * t)
        kind = "sine"
    elif style == 1:
        k2 = int(rng.randint(8, n // 4))
        while k2 == k:
            k2 = int(rng.randint(8, n // 4))
        x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(2 * np.pi * (k2 / seconds) * t)
        kind = "twotone"
    else:
        x = 0.3 * rng.randn(n)
        kind = "noise"
        freq = 0  # no meaningful dominant
    return {
        "clip_id": i,
        "audio": encode_wav(np.clip(x, -1, 1), rate),
        "kind": kind,
        "true_hz": int(round(freq)),
    }


def ensure_audio_parquet(sf_dir: str, cache_root: str = "/tmp/yomitoku_ray_audio") -> str:
    import pyarrow.parquet as pq

    from .pages import rows_for_sf_dir

    n = max(200, rows_for_sf_dir(sf_dir) // 20)
    out_dir = os.path.join(cache_root, f"n{n}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    t = pa.Table.from_pylist([gen_clip(i) for i in range(n)], schema=AUDIO_SCHEMA)
    pq.write_table(t, os.path.join(tmp, "part-00000.parquet"))
    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir
