"""Audio tier (task-brief multimodal): from-scratch RIFF/WAVE PCM codec
+ signal-feature kernel + the distributed audio_features operator."""
from __future__ import annotations

import numpy as np
import pytest

from org_dharts_dia_tesseract_spark.codecs_wav import (decode_wav,
                                                       encode_wav,
                                                       wav_features)
from org_dharts_dia_tesseract_spark.datagen import audio_row_for


def _sine(n=800, rate=8000, freq=440.0, amp=0.5):
    t = np.arange(n) / rate
    return np.round(amp * 32767.0 * np.sin(2 * np.pi * freq * t)).astype(
        np.int16)


class TestWavCodec:
    def test_16bit_mono_roundtrip_exact(self):
        pcm = _sine()
        out, rate = decode_wav(encode_wav(pcm, 8000))
        assert rate == 8000
        assert np.array_equal(out[:, 0], pcm)

    def test_16bit_stereo_roundtrip_exact(self):
        pcm = np.stack([_sine(), _sine(freq=880.0)], axis=1)
        out, rate = decode_wav(encode_wav(pcm, 16000))
        assert rate == 16000
        assert np.array_equal(out, pcm)

    def test_8bit_quantizes_to_high_byte(self):
        pcm = _sine()
        out, _ = decode_wav(encode_wav(pcm, 8000, bits=8))
        assert np.array_equal(out[:, 0], (pcm >> 8).astype(np.int16) << 8)

    def test_extra_chunks_tolerated(self):
        import struct
        blob = bytearray(encode_wav(_sine(), 8000))
        # splice a LIST chunk (odd length -> word-alignment pad) between
        # fmt and data
        at = blob.find(b"data")
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        blob[at:at] = extra
        struct.pack_into("<I", blob, 4, len(blob) - 8)
        out, rate = decode_wav(bytes(blob))
        assert rate == 8000 and out.shape[0] == 800

    def test_rejections(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"not audio at all")
        with pytest.raises(ValueError, match="8 or 16"):
            encode_wav(_sine(), 8000, bits=24)
        import struct
        blob = bytearray(encode_wav(_sine(), 8000))
        struct.pack_into("<H", blob, 20, 3)   # IEEE-float format
        with pytest.raises(NotImplementedError, match="PCM"):
            decode_wav(bytes(blob))


class TestWavFeatures:
    def test_pure_sine_features(self):
        pcm = _sine(n=8000, amp=0.5)
        f = wav_features(encode_wav(pcm, 8000))
        assert f["n_samples"] == 8000
        assert f["duration_s"] == 1.0
        assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 0.01
        assert abs(f["peak"] - 0.5) < 0.01
        # 440 Hz sine crosses zero ~880 times/sec
        assert abs(f["zero_crossing_rate"] - 880 / 8000) < 0.01

    def test_silence(self):
        f = wav_features(encode_wav(np.zeros(100, dtype=np.int16), 8000))
        assert f["rms"] == 0.0 and f["peak"] == 0.0
        assert f["zero_crossing_rate"] == 0.0

    def test_datagen_deterministic(self):
        a = audio_row_for("aud-00000003")
        b = audio_row_for("aud-00000003")
        assert a["payload"] == b["payload"]
        assert wav_features(a["payload"]) == wav_features(b["payload"])


class TestAudioOperator:
    def test_distributed_matches_kernel(self, spark):
        from org_dharts_dia_tesseract_spark.operators.multimodal import \
            audio_features
        from org_dharts_dia_tesseract_spark.sources.tables import \
            audio_table
        n = 24
        got = {r["audio_ref"]: r.asDict()
               for r in audio_features(audio_table(spark, n)).collect()}
        assert len(got) == n
        for i in range(n):
            ref = f"aud-{i:08d}"
            want = wav_features(audio_row_for(ref)["payload"])
            row = got[ref]
            for k, v in want.items():
                assert row[k] == v, (ref, k)   # bit-identical doubles

    def test_plan_is_single_narrow_stage(self, spark):
        """No shuffle anywhere: payloads stay in their scan partition."""
        from org_dharts_dia_tesseract_spark.operators.multimodal import \
            audio_features
        from org_dharts_dia_tesseract_spark.sources.tables import \
            audio_table
        df = audio_features(audio_table(spark, 8))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the only exchange is the table builder's deterministic
        # repartition by audio_ref; the feature stage adds none
        assert plan.count("Exchange") <= 1
