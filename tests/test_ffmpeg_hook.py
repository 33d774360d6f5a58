"""ffmpeg frame_decoder integration (llm/ffmpeg.py) — the documented
codec boundary of sample_video_frames / sample_video_keyframes.

The real-codec round trip is skipped when no ffmpeg binary is present
(this container ships none); the hook CONTRACT — loud construction
failure, picklable closure shape, graceful per-blob degradation — is
tested unconditionally, and (r12) the ENTIRE subprocess contract — CLI
argument construction and ordering (-ss before -i = demuxer-level
seek), temp-file handoff, stdout piping, -vf scale arithmetic, nonzero-
exit and timeout degradation, BMP round trip through Spark — runs
in-container against a STUB ffmpeg binary that enforces each invariant
with assertions and answers with real BMP bytes. TestRealCodecRoundTrip
remains the recipe for proving the hook against a real codec stack
wherever ffmpeg exists (it synthesizes its test video with ffmpeg
itself, so it needs no fixtures from here).
"""

import stat
import textwrap

import pytest

from deequ_spark.llm import ffmpeg_available, make_ffmpeg_frame_decoder

STUB_FFMPEG = textwrap.dedent(r'''
    #!/usr/bin/env python3
    """Stub ffmpeg: the exact CLI subset make_ffmpeg_frame_decoder
    invokes, with the hook's contract enforced by assertions. Emits a
    24bpp BMP whose red channel encodes int(seek seconds)."""
    import struct
    import sys

    args = sys.argv[1:]

    def val(flag):
        assert flag in args, f"missing {flag}: {args}"
        return args[args.index(flag) + 1]

    assert args.index("-ss") < args.index("-i"), "-ss must precede -i"
    assert val("-frames:v") == "1"
    assert val("-f") == "image2" and args[-1] == "pipe:1"
    assert val("-v") == "error" and "-nostdin" in args
    ss = float(val("-ss"))
    assert ss >= 0.0
    with open(val("-i"), "rb") as fh:
        payload = fh.read()
    if payload[4:8] != b"ftyp":      # undecodable: nonzero exit
        sys.stderr.write("invalid data\n")
        sys.exit(1)
    assert val("-c:v") == "bmp"
    w, h = 64, 48
    if "-vf" in args:
        vf = val("-vf")
        assert vf.startswith("scale=") and vf.endswith(":-2"), vf
        w = int(vf[len("scale="):-3])
        h = max(2, (48 * w // 64) & ~1)
    v = int(ss) % 256
    row = ((w * 3 + 3) // 4) * 4
    px = bytes([v, v, v]) * w + b"\0" * (row - 3 * w)
    img = px * h
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                       2835, 2835, 0, 0)
    sys.stdout.buffer.write(hdr + info + img)
''').strip()


@pytest.fixture(scope="module")
def stub_ffmpeg(tmp_path_factory):
    p = tmp_path_factory.mktemp("stub") / "ffmpeg"
    p.write_text(STUB_FFMPEG + "\n")
    p.chmod(p.stat().st_mode | stat.S_IEXEC | stat.S_IXGRP | stat.S_IXOTH)
    return str(p)


@pytest.fixture(scope="module")
def mp4_blob():
    from deequ_spark.llm.multimodal import encode_mp4_samples
    return encode_mp4_samples([100] * 20, [100] * 20)  # 2000 ms


class TestHookAgainstStubBinary:
    def test_end_to_end_through_spark(self, spark, stub_ffmpeg, mp4_blob):
        from deequ_spark.llm import sample_video_frames
        from deequ_spark.llm.multimodal import decode_image
        df = spark.createDataFrame(
            [(1, bytearray(mp4_blob)), (2, bytearray(b"not a video"))],
            "media_id long, payload binary")
        dec = make_ffmpeg_frame_decoder(binary=stub_ffmpeg)
        rows = sample_video_frames(df, n_frames=3,
                                   frame_decoder=dec).collect()
        vids = sorted((r for r in rows if r["media_id"] == 1),
                      key=lambda r: r["frame_index"])
        assert len(vids) == 3
        assert all(r["decoded"] for r in vids)
        for r in vids:
            h, w, _c, px = decode_image(bytes(r["pixels"]))
            assert (h, w) == (48, 64)
            # every channel encodes int(seek seconds): the ts the hook
            # passed reached the binary as whole seconds
            assert px[0][0][0] == int(r["ts_ms"] / 1000.0)
        assert not [r for r in rows if r["media_id"] == 2]

    def test_scale_width_reaches_the_binary(self, stub_ffmpeg, mp4_blob):
        from deequ_spark.llm.multimodal import decode_image
        dec = make_ffmpeg_frame_decoder(binary=stub_ffmpeg,
                                        scale_width=32)
        _h, w, _c, px = decode_image(dec(mp4_blob, 1234.0))
        assert w == 32
        assert px[0][0][0] == 1                     # 1.234s -> 1

    def test_undecodable_blob_degrades_to_none(self, stub_ffmpeg):
        dec = make_ffmpeg_frame_decoder(binary=stub_ffmpeg)
        assert dec(b"\x00" * 64, 500.0) is None     # exit 1 -> None
        assert dec(b"", 0.0) is None                # empty short-circuit

    def test_timeout_degrades_to_none(self, tmp_path, mp4_blob):
        slow = tmp_path / "ffmpeg"
        slow.write_text("#!/usr/bin/env python3\n"
                        "import time; time.sleep(5)\n")
        slow.chmod(0o755)
        dec = make_ffmpeg_frame_decoder(binary=str(slow), timeout_s=0.5)
        assert dec(mp4_blob, 0.0) is None

    def test_decoder_with_stub_is_picklable(self, stub_ffmpeg, mp4_blob):
        import pickle
        dec = pickle.loads(pickle.dumps(
            make_ffmpeg_frame_decoder(binary=stub_ffmpeg)))
        assert dec(mp4_blob, 1000.0) is not None


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
