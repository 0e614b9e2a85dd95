"""Video tier (task-brief multimodal): from-scratch RIFF/AVI MJPEG
container codec + frame-feature kernel + the distributed
video_frame_features operator and AVI container split."""
from __future__ import annotations

import numpy as np
import pytest

from org_dharts_dia_tesseract_spark.codecs_avi import (avi_frame_features,
                                                       decode_avi_mjpeg,
                                                       encode_avi_mjpeg)
from org_dharts_dia_tesseract_spark.codecs_img import DECODERS, ENCODERS
from org_dharts_dia_tesseract_spark.datagen import video_row_for


def _frames(n=5, w=64, h=48):
    out = []
    for i in range(n):
        img = np.full((h, w), 230, dtype=np.uint8)
        img[10:30, 4 + 8 * i:24 + 8 * i] = 20
        out.append(img)
    return out


class TestAviCodec:
    def test_roundtrip_pixel_exact_vs_jpeg(self):
        """The container adds NO loss: each decoded frame equals the
        direct JPEG decode of the stored frame bytes."""
        imgs = _frames()
        jpegs = [ENCODERS["jpeg"](f) for f in imgs]
        avi = encode_avi_mjpeg(jpegs, 64, 48, fps=12)
        frames, w, h, fps = decode_avi_mjpeg(avi)
        assert (w, h, fps) == (64, 48, 12)
        assert len(frames) == 5
        for fr, j in zip(frames, jpegs):
            assert np.array_equal(fr, DECODERS["jpeg"](j))

    def test_encode_deterministic(self):
        jpegs = [ENCODERS["jpeg"](f) for f in _frames(3)]
        assert (encode_avi_mjpeg(jpegs, 64, 48, 10)
                == encode_avi_mjpeg(jpegs, 64, 48, 10))

    def test_junk_chunks_tolerated(self):
        import struct
        jpegs = [ENCODERS["jpeg"](f) for f in _frames(2)]
        blob = bytearray(encode_avi_mjpeg(jpegs, 64, 48, 10))
        at = blob.find(b"LIST", 12)            # before hdrl
        extra = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
        blob[at:at] = extra
        struct.pack_into("<I", blob, 4, len(blob) - 8)
        frames, w, h, fps = decode_avi_mjpeg(bytes(blob))
        assert len(frames) == 2 and (w, h, fps) == (64, 48, 10)

    def test_rejections(self):
        with pytest.raises(ValueError, match="RIFF/AVI"):
            decode_avi_mjpeg(b"not video")
        with pytest.raises(ValueError, match="at least one frame"):
            encode_avi_mjpeg([], 64, 48, 10)
        with pytest.raises(ValueError, match="fps"):
            encode_avi_mjpeg([b"x"], 64, 48, 0)
        # non-MJPG vids stream must be rejected, not mis-decoded
        jpegs = [ENCODERS["jpeg"](f) for f in _frames(1)]
        blob = bytearray(encode_avi_mjpeg(jpegs, 64, 48, 10))
        at = blob.find(b"vids") + 4
        blob[at:at + 4] = b"H264"
        with pytest.raises(NotImplementedError, match="MJPG"):
            decode_avi_mjpeg(bytes(blob))


class TestFrameFeatures:
    def test_sampling_rule(self):
        jpegs = [ENCODERS["jpeg"](f) for f in _frames(7)]
        avi = encode_avi_mjpeg(jpegs, 64, 48, 10)
        assert [f["frame_idx"] for f in avi_frame_features(avi, 1)] \
            == list(range(7))
        assert [f["frame_idx"] for f in avi_frame_features(avi, 3)] \
            == [0, 3, 6]
        with pytest.raises(ValueError, match="every_k"):
            avi_frame_features(avi, 0)

    def test_features_track_content(self):
        """The sweeping dark block keeps ink_ratio constant-ish and
        mean_luma well below the background; a blank clip has zero
        ink."""
        jpegs = [ENCODERS["jpeg"](f) for f in _frames(4)]
        feats = avi_frame_features(encode_avi_mjpeg(jpegs, 64, 48, 10))
        for f in feats:
            assert 0.1 < f["ink_ratio"] < 0.2
            assert 180 < f["mean_luma"] < 230
        blank = [ENCODERS["jpeg"](np.full((48, 64), 240, np.uint8))]
        bf = avi_frame_features(encode_avi_mjpeg(blank, 64, 48, 10))
        assert bf[0]["ink_ratio"] == 0.0

    def test_datagen_deterministic(self):
        a = video_row_for("vid-00000003")
        b = video_row_for("vid-00000003")
        assert a["payload"] == b["payload"]
        assert (avi_frame_features(a["payload"], 2)
                == avi_frame_features(b["payload"], 2))
        assert 3 <= a["n_frames"] <= 8


class TestVideoOperator:
    def test_distributed_matches_kernel(self, spark):
        from org_dharts_dia_tesseract_spark.operators.multimodal import \
            video_frame_features
        from org_dharts_dia_tesseract_spark.sources.tables import \
            video_table
        n = 16
        got = {}
        rows = video_frame_features(video_table(spark, n),
                                    every_k=2).collect()
        for r in rows:
            got[(r["video_ref"], r["frame_idx"])] = r.asDict()
        want_n = 0
        for i in range(n):
            ref = f"vid-{i:08d}"
            for feats in avi_frame_features(video_row_for(ref)["payload"],
                                            every_k=2):
                want_n += 1
                row = got[(ref, feats["frame_idx"])]
                for k, v in feats.items():
                    assert row[k] == v, (ref, k)   # bit-identical
        assert len(got) == want_n

    def test_plan_is_single_narrow_stage(self, spark):
        """No shuffle anywhere: payloads stay in their scan partition
        (the only exchange is the table builder's repartition)."""
        from org_dharts_dia_tesseract_spark.operators.multimodal import \
            video_frame_features
        from org_dharts_dia_tesseract_spark.sources.tables import \
            video_table
        df = video_frame_features(video_table(spark, 6))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1

    def test_on_error_drop_skips_and_counts(self, spark):
        """A corrupt payload must not kill the job under
        on_error='drop': its rows vanish and the skip is counted in
        the observation; under the default 'fail' it raises."""
        from org_dharts_dia_tesseract_spark.operators import multimodal as M
        from pyspark.sql.utils import PythonException
        v = video_row_for("vid-00000002")
        rows = [("ok", bytearray(v["payload"])),
                ("bad", bytearray(b"RIFF\x08\x00\x00\x00AVI corrupt"))]
        df = spark.createDataFrame(rows, "video_ref string, payload binary")
        got = M.video_frame_features(df, every_k=2,
                                     on_error="drop").collect()
        assert {r["video_ref"] for r in got} == {"ok"}
        assert M.last_decode_error_observation.get["dropped_payloads"] == 1
        with pytest.raises(PythonException):
            M.video_frame_features(df, every_k=2).collect()
        with pytest.raises(ValueError, match="on_error"):
            M.video_frame_features(df, on_error="ignore")

    def test_audio_on_error_drop(self, spark):
        from org_dharts_dia_tesseract_spark.datagen import audio_row_for
        from org_dharts_dia_tesseract_spark.operators import multimodal as M
        a = audio_row_for("aud-00000001")
        rows = [("ok", bytearray(a["payload"])),
                ("bad", bytearray(b"RIFF\x04\x00\x00\x00WAVE"))]
        df = spark.createDataFrame(rows, "audio_ref string, payload binary")
        got = M.audio_features(df, on_error="drop").collect()
        assert {r["audio_ref"] for r in got} == {"ok"}
        assert M.last_decode_error_observation.get["dropped_payloads"] == 1

    def test_split_video_frames(self, spark):
        """AVI rows explode into raw per-frame rows (#f<i>), non-AVI
        rows pass through untouched — the container path of the
        frame-sampling surface."""
        from org_dharts_dia_tesseract_spark.operators.multimodal import \
            split_video_frames
        v = video_row_for("vid-00000001")
        raw = np.full((8, 8), 7, np.uint8)
        rows = [("vid-1", v["width"], v["height"], 1,
                 bytearray(v["payload"])),
                ("raw-1", 8, 8, 1, bytearray(raw.tobytes()))]
        df = spark.createDataFrame(
            rows, "media_ref string, width int, height int, bands int, "
                  "payload binary")
        got = {r["media_ref"]: r for r in
               split_video_frames(df, every_k=2).collect()}
        sampled = [i for i in range(v["n_frames"]) if i % 2 == 0]
        assert set(got) == ({f"vid-1#f{i}" for i in sampled} | {"raw-1"})
        f0 = got["vid-1#f0"]
        assert (f0["width"], f0["height"], f0["bands"]) == (64, 48, 1)
        assert len(bytes(f0["payload"])) == 64 * 48
        assert bytes(got["raw-1"]["payload"]) == raw.tobytes()
