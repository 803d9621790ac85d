"""WAV audio kernels + stage: real decode, real features, error isolation."""

import numpy as np
import pyarrow as pa
import pytest

from yomitoku_ray.kernels.audio import (
    AudioError,
    audio_features,
    decode_wav,
    encode_wav,
)
from yomitoku_ray.stages.multimodal import AudioFeatureStage


def _sine(freq, rate=8000, seconds=1.0, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_round_trip():
    x = _sine(440)
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    assert len(got) == len(x)
    assert np.abs(got - x).max() < 1e-3  # 16-bit quantization error only


def test_features_sine():
    f = audio_features(encode_wav(_sine(440, seconds=0.5), 8000))
    assert f["duration_ms"] == 500
    assert f["sample_rate"] == 8000
    assert f["dominant_hz"] == 440
    # RMS of a 0.5-amp sine = 0.5/sqrt(2) ~ 0.354
    assert abs(f["rms_milli"] - 354) <= 2
    # a 440 Hz sine crosses zero 880 times/sec
    assert abs(f["zcr_per_sec_milli"] - 880_000) <= 2000


def test_rejects_garbage():
    with pytest.raises(AudioError):
        decode_wav(b"definitely not audio")


def test_audio_stage_batch_with_errors():
    good = encode_wav(_sine(1000, rate=16000, seconds=0.25), 16000)
    batch = pa.table({"audio": pa.array([good, b"junk"], pa.binary())})
    out = AudioFeatureStage()(batch).column("audio_features").to_pylist()
    assert out[0]["error"] is None
    assert out[0]["dominant_hz"] == 1000
    assert out[0]["duration_ms"] == 250
    assert out[1]["error"] and out[1]["duration_ms"] == 0


def test_multichannel_and_8bit():
    import io
    import wave

    x = _sine(440, seconds=0.1)
    # stereo 16-bit: identical channels -> mono mean == channel
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    stereo = np.stack([pcm, pcm], axis=1).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(stereo.tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert np.abs(got - x).max() < 1e-3


def test_audio_query_pins_ground_truth(ray_session):
    """The audio_features_summary driver query: real rFFT dominant
    frequencies match the generator's analytic ground truth for every
    decodable sine/twotone clip."""
    import sys

    sys.path.insert(0, "/root/repo")
    import pyarrow.parquet as pq

    from __ray_entry__ import _audio_features_summary
    from yomitoku_ray.synth.audio import ensure_audio_parquet

    df = _audio_features_summary("/root/testdata/sf0.001").set_index("clip_id")
    truth = (
        pq.read_table(ensure_audio_parquet("/root/testdata/sf0.001"))
        .to_pandas()
        .set_index("clip_id")
    )
    assert len(df) >= 200
    assert (df[df["kind"] == "junk"]["ok"] == 0).all()
    tonal = truth[truth["kind"].isin(["sine", "twotone"])]
    got = df.loc[tonal.index]
    assert (got["ok"] == 1).all()
    assert (got["dominant_hz"] == tonal["true_hz"]).all()
