"""ffmpeg frame_decoder integration (llm/ffmpeg.py) — the documented
codec boundary of sample_video_frames / sample_video_keyframes.

The real-codec round trip is skipped when no ffmpeg binary is present
(this container ships none); the hook CONTRACT — loud construction
failure, picklable closure shape, graceful per-blob degradation — is
tested unconditionally.
"""

import pytest

from deequ_spark.llm import ffmpeg_available, make_ffmpeg_frame_decoder


class TestHookContractWithoutFfmpeg:
    def test_construction_fails_loudly_when_absent(self):
        if ffmpeg_available():
            pytest.skip("ffmpeg present; absence contract not testable")
        with pytest.raises(RuntimeError, match="not found on PATH"):
            make_ffmpeg_frame_decoder()

    def test_available_probe_matches_which(self):
        import shutil
        assert ffmpeg_available() == (shutil.which("ffmpeg") is not None)

    def test_decoder_is_picklable_when_present(self):
        if not ffmpeg_available():
            pytest.skip("needs ffmpeg on PATH")
        import pickle
        dec = make_ffmpeg_frame_decoder()
        assert callable(pickle.loads(pickle.dumps(dec)))


@pytest.mark.skipif(not ffmpeg_available(), reason="needs ffmpeg on PATH")
class TestRealCodecRoundTrip:
    """Runs only where ffmpeg exists: synthesize a real encoded video
    with ffmpeg itself, then drive sample_video_frames end-to-end with
    the hook and decode the returned stills with the repo's own BMP
    reader."""

    @pytest.fixture(scope="class")
    def mp4_blob(self, tmp_path_factory):
        import subprocess
        out = tmp_path_factory.mktemp("ff") / "t.mp4"
        subprocess.run(
            ["ffmpeg", "-v", "error", "-f", "lavfi",
             "-i", "testsrc=duration=2:size=64x48:rate=10",
             "-pix_fmt", "yuv420p", "-movflags", "+faststart", str(out)],
            check=True)
        return out.read_bytes()

    def test_frames_decode_through_spark(self, spark, mp4_blob):
        from deequ_spark.llm import sample_video_frames
        from deequ_spark.llm.multimodal import decode_image

        df = spark.createDataFrame(
            [(1, bytearray(mp4_blob)), (2, bytearray(b"not a video"))],
            "media_id long, payload binary")
        dec = make_ffmpeg_frame_decoder()
        rows = sample_video_frames(df, n_frames=3,
                                   frame_decoder=dec).collect()
        vids = [r for r in rows if r["media_id"] == 1]
        assert len(vids) == 3
        assert all(r["decoded"] for r in vids)
        for r in vids:
            img = decode_image(bytes(r["pixels"]))
            assert (img["height"], img["width"]) == (48, 64)
        assert not [r for r in rows if r["media_id"] == 2]

    def test_undecodable_blob_degrades_to_none(self):
        dec = make_ffmpeg_frame_decoder()
        assert dec(b"\x00" * 64, 500.0) is None
        assert dec(b"", 0.0) is None
