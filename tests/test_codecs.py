"""Real-codec tests (functions/codecs.py): WAV and BMP decode verified
against files produced by the INDEPENDENT stdlib writers (wave module /
struct-packed headers), plus the real nearest-neighbor BMP resize and the
Spark mapInPandas operators over both."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from fictional_guacamole_spark.functions import codecs as C


class TestWavCodec:
    def test_roundtrip_8bit(self):
        samples = bytes(range(256))
        payload = C.encode_wav_pcm8(samples, sample_rate=8000)
        m = C.decode_wav(payload)
        assert m["n_channels"] == 1 and m["sample_width"] == 1
        assert m["sample_rate"] == 8000 and m["n_frames"] == 256
        assert m["duration_ms"] == 32  # 256 frames / 8000 Hz
        x = np.arange(256, dtype=np.int64) - 128
        assert m["sum_sq"] == int((x * x).sum())
        assert m["peak"] == 128

    def test_16bit_stereo_written_by_stdlib(self):
        # independent writer: stdlib wave with 16-bit stereo frames
        t = np.arange(1000)
        left = (1000 * np.sin(t / 10.0)).astype("<i2")
        right = (500 * np.cos(t / 7.0)).astype("<i2")
        frames = np.column_stack([left, right]).tobytes()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(frames)
        m = C.decode_wav(buf.getvalue())
        assert m["n_channels"] == 2 and m["sample_width"] == 2
        assert m["sample_rate"] == 44100 and m["n_frames"] == 1000
        x = np.column_stack([left, right]).astype(np.int64)
        assert m["sum_sq"] == int((x * x).sum())
        assert m["peak"] == int(np.abs(x).max())

    def test_empty_audio(self):
        m = C.decode_wav(C.encode_wav_pcm8(b""))
        assert m["n_frames"] == 0 and m["sum_sq"] == 0 and m["peak"] == 0

    def test_unsupported_width_raises(self):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(3)  # 24-bit: deliberately unsupported
            w.setframerate(8000)
            w.writeframes(b"\x00\x00\x00")
        with pytest.raises(ValueError, match="sample width"):
            C.decode_wav(buf.getvalue())


class TestBmpCodec:
    def _checker(self, w, h):
        """Top-down BGR pixel bytes: (x+y) parity checkerboard of blue
        (255,0,0 BGR) and red (0,0,255 BGR)."""
        px = bytearray()
        for y in range(h):
            for x in range(w):
                px += b"\xff\x00\x00" if (x + y) % 2 == 0 else b"\x00\x00\xff"
        return bytes(px)

    def test_roundtrip_with_row_padding(self):
        # width 3 → row 9 bytes → stride 12: padding path exercised
        pix = self._checker(3, 2)
        payload = C.encode_bmp24(3, 2, pix)
        w, h, arr = C.decode_bmp(payload)
        assert (w, h) == (3, 2)
        assert arr.tobytes() == pix  # decode restores top-down order
        assert tuple(arr[0, 0]) == (255, 0, 0)  # blue in BGR
        assert tuple(arr[0, 1]) == (0, 0, 255)  # red

    def test_top_down_negative_height(self):
        # hand-pack a top-down BMP (negative height, no padding at w=4)
        pix = self._checker(4, 2)
        body = pix  # top-down: rows stored in natural order
        header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 4, -2, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
        w, h, arr = C.decode_bmp(header + info + body)
        assert (w, h) == (4, 2)
        assert arr.tobytes() == pix

    def test_stats_exact_sums(self):
        pix = self._checker(4, 4)
        s = C.bmp_stats(C.encode_bmp24(4, 4, pix))
        # 8 blue pixels (B=255) + 8 red pixels (R=255)
        assert s["sum_b"] == 8 * 255 and s["sum_r"] == 8 * 255
        assert s["sum_g"] == 0

    def test_resize_nearest_downsample(self):
        # 4x4 checkerboard → 2x2 nearest: picks pixels (0,0),(0,2),(2,0),(2,2)
        pix = self._checker(4, 4)
        out = C.resize_bmp_nearest(C.encode_bmp24(4, 4, pix), 2, 2)
        w, h, arr = C.decode_bmp(out)
        assert (w, h) == (2, 2)
        for y in range(2):
            for x in range(2):
                assert tuple(arr[y, x]) == (255, 0, 0)  # all land on blue

    def test_resize_upsample_replicates(self):
        pix = b"\x01\x02\x03" + b"\x04\x05\x06"  # 2x1 image
        out = C.resize_bmp_nearest(C.encode_bmp24(2, 1, pix), 4, 2)
        w, h, arr = C.decode_bmp(out)
        assert (w, h) == (4, 2)
        assert tuple(arr[0, 0]) == tuple(arr[0, 1]) == (1, 2, 3)
        assert tuple(arr[1, 2]) == tuple(arr[1, 3]) == (4, 5, 6)

    def test_reject_non_bmp(self):
        with pytest.raises(ValueError, match="not a BMP"):
            C.decode_bmp(b"PNG!" + b"\x00" * 64)


class TestCodecSparkOps:
    def test_wav_meta_operator(self, spark):
        rows = [(i, C.encode_wav_pcm8(bytes([128 + i] * (10 * (i + 1)))))
                for i in range(4)]
        df = spark.createDataFrame(rows, "asset_id long, payload binary")
        got = {r["asset_id"]: r for r in C.wav_meta(df).collect()}
        for i in range(4):
            assert got[i]["n_frames"] == 10 * (i + 1)
            assert got[i]["sum_sq"] == i * i * 10 * (i + 1)
            assert got[i]["sample_rate"] == C.WAV_SAMPLE_RATE

    def test_bmp_pipeline_decode_resize_decode(self, spark):
        mk = TestBmpCodec()
        rows = [(1, C.encode_bmp24(4, 4, mk._checker(4, 4))),
                (2, C.encode_bmp24(3, 2, mk._checker(3, 2)))]
        df = spark.createDataFrame(rows, "asset_id long, payload binary")
        resized = C.resize_bmp_assets(df, 2, 2)
        meta = {r["asset_id"]: r for r in C.bmp_meta(resized).collect()}
        assert meta[1]["width"] == 2 and meta[1]["height"] == 2
        # asset 1's 2x2 nearest output is all blue (see downsample test)
        assert meta[1]["sum_b"] == 4 * 255 and meta[1]["sum_r"] == 0
        assert meta[2]["width"] == 2 and meta[2]["height"] == 2


class TestAviCodec:
    """Real AVI container round-trip (RIFF + uncompressed DIB frames):
    header probe, seek-and-sample frame extraction, stride padding, and
    the Spark frame-sampling operator."""

    def _frames(self, n, w=5, h=3):
        return [bytes(((f * 7 + i) % 251) for i in range(w * h * 3))
                for f in range(n)]

    def test_probe_reads_headers(self):
        from fictional_guacamole_spark.functions import codecs as C

        avi = C.encode_avi_dib(5, 3, self._frames(4), fps=25)
        m = C.probe_avi(avi)
        assert (m["width"], m["height"], m["n_frames"]) == (5, 3, 4)
        assert m["us_per_frame"] == 1_000_000 // 25

    def test_sampled_frames_roundtrip_exactly(self):
        from fictional_guacamole_spark.functions import codecs as C

        frames = self._frames(5)  # width 5 → row 15 → stride 16: padded
        avi = C.encode_avi_dib(5, 3, frames)
        got = C.extract_avi_frames(avi, every_n=2)
        assert [i for i, _ in got] == [0, 2, 4]
        for idx, arr in got:
            assert arr.tobytes() == frames[idx]  # bit-exact pixel recovery

    def test_every_frame_when_n_is_one(self):
        from fictional_guacamole_spark.functions import codecs as C

        avi = C.encode_avi_dib(4, 2, self._frames(3, 4, 2))
        assert len(C.extract_avi_frames(avi, every_n=1)) == 3

    def test_reject_non_avi(self):
        from fictional_guacamole_spark.functions import codecs as C

        with pytest.raises(ValueError, match="not an AVI"):
            C.probe_avi(b"RIFF\x04\x00\x00\x00WAVE")

    def test_spark_frame_sample_operator(self, spark):
        from fictional_guacamole_spark.functions import codecs as C

        import numpy as np
        rows = []
        for aid, n in ((1, 4), (2, 1)):
            frames = self._frames(n)
            rows.append((aid, C.encode_avi_dib(5, 3, frames)))
        df = spark.createDataFrame(rows, "asset_id long, payload binary")
        got = {(r["asset_id"], r["frame_index"]): r
               for r in C.avi_frame_sample(df, every_n=2).collect()}
        assert set(got) == {(1, 0), (1, 2), (2, 0)}
        f0 = np.frombuffer(self._frames(1)[0], np.uint8).reshape(-1, 3)
        assert got[(1, 0)]["sum_b"] == int(f0[:, 0].sum())
        assert got[(1, 0)]["width"] == 5 and got[(1, 0)]["height"] == 3


class TestCodecRobustness:
    """Hostile-input property tests: arbitrary byte strings must either
    decode or raise a clean error (ValueError / wave.Error / struct.error
    / EOFError) — never hang, never crash the worker, never return
    garbage silently accepted as media."""

    @pytest.mark.parametrize("decoder", ["wav", "bmp", "avi"])
    def test_fuzz_decoders_fail_cleanly(self, decoder):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import struct as _struct

        fns = {"wav": C.decode_wav,
               "bmp": C.decode_bmp,
               "avi": lambda p: C.extract_avi_frames(p, 1)}
        fn = fns[decoder]
        allowed = (ValueError, wave.Error, _struct.error, EOFError,
                   IndexError)

        @settings(max_examples=80, deadline=None)
        @given(st.binary(max_size=200))
        def check(payload):
            try:
                fn(payload)
            except allowed:
                pass  # clean rejection is the contract

        check()

    def test_truncated_real_files_fail_cleanly(self):
        import struct as _struct

        wav = C.encode_wav_pcm8(bytes(100))
        bmp = C.encode_bmp24(4, 4, bytes(48))
        avi = C.encode_avi_dib(4, 2, [bytes(24)])
        allowed = (ValueError, wave.Error, _struct.error, EOFError,
                   IndexError)
        for payload, fn in ((wav, C.decode_wav), (bmp, C.decode_bmp),
                            (avi, lambda p: C.extract_avi_frames(p, 1))):
            for cut in (3, 11, len(payload) // 2):
                try:
                    fn(payload[:cut])
                except allowed:
                    pass


class TestPngCodec:
    """PNG decode verified three ways: roundtrip through the engine's own
    encoder (all color types / sizes / the full filter cycle), against a
    HAND-BUILT PNG whose IDAT is constructed in the test with known filter
    bytes and hand-computed reconstruction (independent of encode_png),
    and hostile-input rejection (CRC, truncation, implausible headers)."""

    def test_roundtrip_all_color_types_and_filters(self):
        import random

        rnd = random.Random(11)
        for ct, ch in [(0, 1), (2, 3), (6, 4)]:
            for w, h in [(1, 1), (3, 7), (8, 8), (16, 5), (5, 16)]:
                px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
                wo, ho, co, arr = C.decode_png(C.encode_png(w, h, px, ct))
                assert (wo, ho, co) == (w, h, ch)
                assert arr.tobytes() == px

    def test_hand_built_png_known_reconstruction(self):
        """A 2x3 greyscale PNG built byte-by-byte IN THE TEST (zlib +
        struct only, no encode_png): rows use filters Sub, Up, Paeth with
        hand-computed filtered bytes, so a decoder that mis-implements
        any of the three reconstructions returns the wrong pixels."""
        import zlib

        # target pixels (greyscale, 2 wide x 3 tall, top-down):
        #   row0: 10 30   row1: 50 40   row2: 60 80
        # filter math (bpp=1):
        #   row0 Sub(1):   10, 30-10=20
        #   row1 Up(2):    50-10=40, 40-30=10
        #   row2 Paeth(4): a=0,b=50,c=0 -> p=50 -> pred=b=50 -> 60-50=10
        #                  a=60,b=40,c=50 -> p=50; pa=10,pb=10,pc=0 -> c=50
        #                  -> 80-50=30
        raw = bytes([1, 10, 20,  2, 40, 10,  4, 10, 30])
        ihdr = struct.pack(">IIBBBBB", 2, 3, 8, 0, 0, 0, 0)

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
        w, h, ch, arr = C.decode_png(payload)
        assert (w, h, ch) == (2, 3, 1)
        assert arr.reshape(3, 2).tolist() == [[10, 30], [50, 40], [60, 80]]

    def test_idat_split_across_chunks(self):
        """The spec allows one zlib stream split over many IDAT chunks."""
        import zlib

        px = bytes(range(36))
        good = C.encode_png(3, 4, px, 2)
        # re-split: parse out the single IDAT, cut its data in two chunks
        pos, parts = 8, []
        while pos + 8 <= len(good):
            (ln,) = struct.unpack_from(">I", good, pos)
            ctype = good[pos + 4:pos + 8]
            data = good[pos + 8:pos + 8 + ln]
            parts.append((ctype, data))
            pos += 12 + ln
        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))
        rebuilt = b"\x89PNG\r\n\x1a\n"
        for ctype, data in parts:
            if ctype == b"IDAT":
                cut = len(data) // 2
                rebuilt += chunk(b"IDAT", data[:cut])
                rebuilt += chunk(b"IDAT", data[cut:])
            else:
                rebuilt += chunk(ctype, data)
        w, h, ch, arr = C.decode_png(rebuilt)
        assert (w, h, ch) == (3, 4, 3) and arr.tobytes() == px

    def test_crc_corruption_rejected(self):
        good = bytearray(C.encode_png(4, 4, bytes(48), 2))
        good[40] ^= 0xFF  # flip a byte inside IHDR/IDAT territory
        with pytest.raises(ValueError):
            C.decode_png(bytes(good))

    def test_interlaced_and_16bit_rejected_loudly(self):
        import zlib

        def build(depth, interlace):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 0, 0, 0, interlace)
            def chunk(ctype, data):
                return (struct.pack(">I", len(data)) + ctype + data
                        + struct.pack(">I", zlib.crc32(ctype + data)))
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(12)))
                    + chunk(b"IEND", b""))

        with pytest.raises(ValueError, match="interlaced"):
            C.decode_png(build(8, 1))
        with pytest.raises(ValueError, match="unsupported"):
            C.decode_png(build(16, 0))

    def test_fuzz_and_truncation_fail_cleanly(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import struct as _struct
        import zlib

        allowed = (ValueError, _struct.error, EOFError, IndexError,
                   zlib.error)

        @settings(max_examples=80, deadline=None)
        @given(st.binary(max_size=200))
        def check(payload):
            try:
                C.decode_png(payload)
            except allowed:
                pass

        check()
        good = C.encode_png(4, 5, bytes(60), 2)
        for cut in (3, 9, 20, len(good) // 2):
            with pytest.raises(allowed):
                C.decode_png(good[:cut])

    def test_png_stats_fixed_schema(self):
        st = C.png_stats(C.encode_png(2, 2, bytes(range(12)), 2))
        assert st == {"width": 2, "height": 2, "n_channels": 3,
                      "sum_r": 0 + 3 + 6 + 9, "sum_g": 1 + 4 + 7 + 10,
                      "sum_b": 2 + 5 + 8 + 11, "sum_a": 0}
        grey = C.png_stats(C.encode_png(2, 1, bytes([7, 9]), 0))
        assert grey["sum_r"] == grey["sum_g"] == grey["sum_b"] == 16
        rgba = C.png_stats(C.encode_png(1, 1, bytes([1, 2, 3, 4]), 6))
        assert rgba["sum_a"] == 4

    def test_spark_png_meta_operator(self, spark):
        import pandas as pd

        rows = [(i, C.encode_png(3, 5, bytes((i + j) % 256
                                             for j in range(45)), 2))
                for i in range(6)]
        assets = spark.createDataFrame(rows, "asset_id long, payload binary")
        got = C.png_meta(assets).orderBy("asset_id").collect()
        assert len(got) == 6
        for i, r in enumerate(got):
            exp = C.png_stats(rows[i][1])
            assert (r.width, r.height, r.n_channels) == (3, 5, 3)
            assert (r.sum_r, r.sum_g, r.sum_b) == (
                exp["sum_r"], exp["sum_g"], exp["sum_b"])


class TestNonAsciiOracleParity:
    """ADVICE r7 regression: the media rows cycle UTF-8 BYTES while their
    oracles index CHARACTERS — both sides now project text to printable
    ASCII first, so a non-ASCII corpus must hash identically (it used to
    silently diverge in cycle length and per-byte values)."""

    def test_png_row_on_non_ascii_corpus(self, spark, tmp_path):
        import duckdb
        import pandas as pd

        from fictional_guacamole_spark.plans.extensions import (
            multimodal_png_decode)
        from fictional_guacamole_spark.plans.registry import REGISTRY

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["héllo wörld — naïve café",      # mixed ASCII/non
                     "日本語のテキストだけ plus ascii",  # mostly non-ASCII
                     "plain ascii text only",          # control
                     "é世界"],            # NO ascii at all ->
                                                       # filtered out
            "lang": ["en"] * 4, "source": ["t"] * 4,
            "n_chars": [10] * 4,
        })
        sf_dir = str(tmp_path)
        docs.to_parquet(f"{sf_dir}/documents.parquet")
        got = sorted(
            tuple(r) for r in multimodal_png_decode(spark, sf_dir).collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        oracle = REGISTRY["multimodal_png_decode"].oracle
        exp = sorted(tuple(r) for r in con.execute(oracle).fetchall())
        assert got == exp
        assert len(got) == 3  # the all-non-ASCII doc is filtered BOTH sides


class TestGifCodec:
    """functions/codecs.py GIF89a + LZW — evidence protocol mirrors the
    Avro codec's: roundtrip through our own encoder, a HAND-BUILT LZW
    stream (codes computed by hand from the GIF89a appendix-F algorithm,
    crossing a code-width boundary and containing the KwKwK case)
    decoded independently of the encoder, spec-level byte assertions,
    and hostile-input rejection."""

    def test_lzw_hand_built_stream_decodes(self):
        # indices [1,1,1,1,1,0] with min_code_size=2 encode per spec as
        # codes [CLEAR=4(3b), 1(3b), 6(3b KwKwK), 6(3b), 0(4b), END=5(4b)]
        # -> LSB-first packed bytes 8C 0D 05 (hand-computed)
        from fictional_guacamole_spark.functions.codecs import _lzw_decode
        assert _lzw_decode(b"\x8C\x0D\x05", 2) == b"\x01\x01\x01\x01\x01\x00"

    def test_lzw_encoder_matches_hand_built_stream(self):
        from fictional_guacamole_spark.functions.codecs import _lzw_encode
        assert _lzw_encode(b"\x01\x01\x01\x01\x01\x00", 2) == b"\x8C\x0D\x05"

    def test_lzw_roundtrip_across_width_boundaries_and_reset(self):
        import random
        from fictional_guacamole_spark.functions.codecs import (
            _lzw_decode, _lzw_encode)
        rng = random.Random(11)
        # random 256-alphabet crosses 9->10->11->12 bits and the 4096
        # dictionary reset at ~the 60k mark; small alphabets are
        # KwKwK-rich and cross widths fast
        for min_size, n in [(8, 1), (8, 300), (8, 70000),
                            (2, 10), (2, 100000), (5, 20000)]:
            data = bytes(rng.randrange(1 << min_size) for _ in range(n))
            assert _lzw_decode(_lzw_encode(data, min_size),
                               min_size) == data
        assert _lzw_decode(_lzw_encode(b"\x01" * 70000, 8),
                           8) == b"\x01" * 70000

    def test_container_roundtrip_and_palette(self):
        import numpy as np
        import random
        from fictional_guacamole_spark.functions.codecs import (
            decode_gif, encode_gif, gif_palette, gif_stats)
        rng = random.Random(3)
        idx = bytes(rng.randrange(256) for _ in range(7 * 5))
        payload = encode_gif(7, 5, idx)
        assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3B"
        w, h, arr = decode_gif(payload)
        pal = np.frombuffer(gif_palette(), np.uint8).reshape(-1, 3)
        assert (w, h) == (7, 5)
        assert (arr == pal[np.frombuffer(idx, np.uint8)]
                .reshape(5, 7, 3)).all()
        st = gif_stats(payload)
        assert st["sum_r"] == sum(idx)
        assert st["sum_g"] == sum((2 * v) % 256 for v in idx)
        assert st["sum_b"] == sum(255 - v for v in idx)

    def test_extension_blocks_are_skipped(self):
        # splice a Graphic Control Extension before the image descriptor
        from fictional_guacamole_spark.functions.codecs import (
            decode_gif, encode_gif)
        payload = encode_gif(3, 2, bytes(range(6)))
        head_end = 13 + 768  # header + LSD + global color table
        gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
        spliced = payload[:head_end] + gce + payload[head_end:]
        w, h, arr = decode_gif(spliced)
        assert (w, h) == (3, 2)

    def test_hostile_inputs_rejected(self):
        import pytest
        from fictional_guacamole_spark.functions.codecs import (
            decode_gif, encode_gif)
        good = encode_gif(3, 2, bytes(6))
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"NOPE" + good[4:])
        with pytest.raises(ValueError, match="truncated|ended|trailer"):
            decode_gif(good[:-10])
        # interlace flag set in the image descriptor
        bad = bytearray(good)
        bad[13 + 768 + 9] |= 0x40
        with pytest.raises(ValueError, match="interlaced"):
            decode_gif(bytes(bad))
        with pytest.raises(ValueError, match="does not match"):
            encode_gif(4, 4, bytes(3))


class TestJpegCodec:
    """Baseline JPEG (T.81): constant-block bit-exactness (the judged-row
    contract), lossy error bounds on general content, restart markers,
    4:4:4 color, a HAND-BUILT bitstream decoded independently of the
    encoder, and loud rejection of the unsupported spec corners."""

    @staticmethod
    def _block_image(vals, bw):
        bh = -(-len(vals) // bw)
        img = np.zeros((bh * 8, bw * 8), np.uint8)
        for i, v in enumerate(vals):
            by, bx = divmod(i, bw)
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
        return img

    def test_constant_blocks_roundtrip_bit_exact(self):
        vals = [0x20, 0x41, 0x7E, 0x30, 0x55, 0x66, 0x25, 0x5A]
        img = self._block_image(vals, 4)
        payload = C.encode_jpeg(32, 16, img.tobytes(), 1)
        w, h, ch, arr = C.decode_jpeg(payload)
        assert (w, h, ch) == (32, 16, 1)
        assert np.array_equal(arr[:, :, 0], img)
        st = C.jpeg_stats(payload)
        assert st["sum_r"] == st["sum_g"] == st["sum_b"] == 64 * sum(vals)

    def test_general_content_lossy_within_quantizer_bound(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (24, 40), np.uint8)
        w, h, ch, arr = C.decode_jpeg(C.encode_jpeg(40, 24, img.tobytes(), 1))
        assert (w, h, ch) == (40, 24, 1)
        err = np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 32  # q_ac=16: error bounded by the quantizer scale

    def test_color_444_roundtrip(self):
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (16, 16, 3), np.uint8)
        w, h, ch, arr = C.decode_jpeg(C.encode_jpeg(16, 16, img.tobytes(), 3))
        assert (w, h, ch) == (16, 16, 3)
        assert np.abs(arr.astype(int) - img.astype(int)).max() <= 64

    def test_restart_markers_reset_dc_prediction(self):
        vals = list(range(0x20, 0x20 + 12))
        img = self._block_image(vals, 4)
        payload = C.encode_jpeg(32, 24, img.tobytes(), 1, restart_interval=2)
        assert b"\xff\xd0" in payload and b"\xff\xdd" in payload
        w, h, ch, arr = C.decode_jpeg(payload)
        assert np.array_equal(arr[:, :, 0], img)

    def test_non_multiple_of_8_dims_crop_back(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (11, 13), np.uint8)
        w, h, ch, arr = C.decode_jpeg(C.encode_jpeg(13, 11, img.tobytes(), 1))
        assert (w, h) == (13, 11) and arr.shape == (11, 13, 1)

    def test_byte_stuffing_survives_roundtrip(self):
        # rich random content reliably produces 0xFF entropy bytes; every
        # one must be stuffed (0xFF00) and the payload must still decode
        stuffed = 0
        for seed in range(8):
            rng = np.random.RandomState(seed)
            img = rng.randint(0, 256, (16, 16), np.uint8)
            payload = C.encode_jpeg(16, 16, img.tobytes(), 1)
            body = payload[payload.index(b"\xff\xda"):-2]
            stuffed += body.count(b"\xff\x00")
            # stuffing invariant: inside the scan every 0xFF is 0xFF00
            idx = body.index(b"\xff\xda") + 14
            for j in range(idx, len(body) - 1):
                if body[j] == 0xFF:
                    assert body[j + 1] == 0x00, seed
            w, h, ch, arr = C.decode_jpeg(payload)
            err = np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max()
            assert err <= 32, seed
        assert stuffed > 0

    def test_hand_built_bitstream_decodes_independently(self):
        """An 8x8 single-block stream assembled BY HAND from the spec:
        DC category 2 value +3 (code 011 + bits 11), AC (run 0, size 1)
        value +1 at zigzag index 1 (code 00 + bit 1), EOB (1010) — packed
        01111001 1010 + 1111 padding = 0x79 0xAF. The decoder must
        reconstruct exactly the dequantized IDCT of that coefficient
        pair, proving it against the spec rather than the encoder."""
        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        zz_quant = bytes([8] + [16] * 63)
        jpg = bytearray(b"\xff\xd8")
        jpg += seg(0xFFDB, b"\x00" + zz_quant)
        jpg += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
        jpg += seg(0xFFC4, bytes([0x00]) + bytes(C._JPEG_DC_BITS)
                   + bytes(C._JPEG_DC_VALS))
        jpg += seg(0xFFC4, bytes([0x10]) + bytes(C._JPEG_AC_BITS)
                   + bytes(C._JPEG_AC_VALS))
        jpg += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        jpg += bytes([0x79, 0xAF])
        jpg += b"\xff\xd9"
        w, h, ch, arr = C.decode_jpeg(bytes(jpg))
        assert (w, h, ch) == (8, 8, 1)
        # independent expectation: own cosine basis, not the codec's
        t = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                       * np.cos((2 * x + 1) * u * np.pi / 16)
                       for x in range(8)] for u in range(8)])
        coef = np.zeros((8, 8))
        coef[0, 0] = 3 * 8       # DC 3, q_dc 8
        coef[0, 1] = 1 * 16      # zigzag index 1 = (0, 1), q_ac 16
        want = np.clip(np.floor(t.T @ coef @ t + 128.0 + 0.5),
                       0, 255).astype(np.uint8)
        assert np.array_equal(arr[:, :, 0], want)

    def test_unsupported_variants_rejected_loudly(self):
        img = self._block_image([65] * 4, 2)
        good = C.encode_jpeg(16, 16, img.tobytes(), 1)
        with pytest.raises(ValueError, match="SOI"):
            C.decode_jpeg(b"\x00" + good)
        # progressive: flip SOF0 -> SOF2
        prog = good.replace(b"\xff\xc0", b"\xff\xc2")
        with pytest.raises(ValueError, match="baseline"):
            C.decode_jpeg(prog)
        # greyscale must stay 1x1 sampled (a single-component "4:2:0"
        # header is nonsense; color 2x2 luma is now SUPPORTED — see
        # TestJpeg420Subsampling)
        sub = good.replace(b"\x01\x11\x00", b"\x01\x22\x00", 1)
        with pytest.raises(ValueError, match="1x1"):
            C.decode_jpeg(sub)
        # sampling factors outside {1,2} rejected loudly
        rgb = np.full((16, 16, 3), 90, np.uint8)
        good3 = C.encode_jpeg(16, 16, rgb.tobytes(), 3)
        bad3 = good3.replace(b"\x01\x11\x00", b"\x01\x31\x00", 1)
        with pytest.raises(ValueError, match="factors"):
            C.decode_jpeg(bad3)
        with pytest.raises(ValueError):
            C.decode_jpeg(good[:len(good) // 2])  # truncated mid-stream

    def test_out_of_sequence_rst_rejected(self):
        img = self._block_image(list(range(0x30, 0x3C)), 4)
        payload = C.encode_jpeg(32, 24, img.tobytes(), 1, restart_interval=2)
        bad = payload.replace(b"\xff\xd0", b"\xff\xd5", 1)
        with pytest.raises(ValueError, match="RST"):
            C.decode_jpeg(bad)

    def test_spark_jpeg_meta_operator(self, spark):
        imgs = [self._block_image([40 + i, 50 + i, 60 + i, 70 + i], 2)
                for i in range(3)]
        rows = [(i, C.encode_jpeg(16, 16, im.tobytes(), 1))
                for i, im in enumerate(imgs)]
        df = spark.createDataFrame(rows, "asset_id long, payload binary")
        got = {r["asset_id"]: r for r in C.jpeg_meta(df).collect()}
        for i, im in enumerate(imgs):
            assert got[i]["width"] == 16 and got[i]["n_channels"] == 1
            assert got[i]["sum_r"] == int(im.sum(dtype=np.int64))


from hypothesis import given, settings
from hypothesis import strategies as st


class TestJpegProperties:
    """Hypothesis property suites for the JPEG codec: constant-block
    bit-exactness over the full byte range, and the lossy error bound on
    arbitrary content at arbitrary (non-multiple-of-8) geometry."""

    @given(vals=st.lists(st.integers(min_value=0, max_value=255),
                         min_size=1, max_size=12),
           bw=st.integers(min_value=1, max_value=4))
    @settings(max_examples=30, deadline=None)
    def test_constant_blocks_always_bit_exact(self, vals, bw):
        img = TestJpegCodec._block_image(vals, bw)
        h, w = img.shape
        got = C.decode_jpeg(C.encode_jpeg(w, h, img.tobytes(), 1))[3]
        assert np.array_equal(got[:, :, 0], img)

    @given(seed=st.integers(min_value=0, max_value=2**31 - 1),
           w=st.integers(min_value=1, max_value=40),
           h=st.integers(min_value=1, max_value=40))
    @settings(max_examples=25, deadline=None)
    def test_arbitrary_content_bounded_error(self, seed, w, h):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w), np.uint8)
        gw, gh, ch, arr = C.decode_jpeg(C.encode_jpeg(w, h, img.tobytes(), 1))
        assert (gw, gh, ch) == (w, h, 1)
        err = np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 40  # q_ac=16 quantizer + edge-padding worst case


class TestJpegHostileInputs:
    """Regression tests for the late-r8 review findings: truncated and
    dimension-hostile payloads must raise ValueError (the codec contract)
    — never IndexError, struct.error, or a multi-GB allocation."""

    def test_truncated_mid_marker_raises_valueerror(self):
        with pytest.raises(ValueError):
            C.decode_jpeg(b"\xff\xd8\xff\xff")

    def test_truncated_segment_length_raises_valueerror(self):
        with pytest.raises(ValueError):
            C.decode_jpeg(b"\xff\xd8\xff\xdb\x00")

    def test_huge_declared_dims_tiny_payload_rejected_cheaply(self):
        """A 65535x65535 SOF0 with a few hundred bytes of 'scan' must be
        rejected by the entropy-floor guard BEFORE any allocation keyed
        on the declared dimensions (was: ~103 GB np.zeros attempt)."""
        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        jpg = bytearray(b"\xff\xd8")
        jpg += seg(0xFFDB, b"\x00" + bytes([8] + [16] * 63))
        jpg += seg(0xFFC0, struct.pack(">BHHB", 8, 65535, 65535, 1)
                   + b"\x01\x11\x00")
        jpg += seg(0xFFC4, bytes([0x00]) + bytes(C._JPEG_DC_BITS)
                   + bytes(C._JPEG_DC_VALS))
        jpg += seg(0xFFC4, bytes([0x10]) + bytes(C._JPEG_AC_BITS)
                   + bytes(C._JPEG_AC_VALS))
        jpg += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        jpg += b"\x00" * 200 + b"\xff\xd9"
        with pytest.raises(ValueError, match="impossibly small"):
            C.decode_jpeg(bytes(jpg))

    @given(st.binary(min_size=2, max_size=120))
    @settings(max_examples=120, deadline=None)
    def test_fuzz_never_crashes_outside_valueerror(self, junk):
        try:
            C.decode_jpeg(b"\xff\xd8" + junk)
        except ValueError:
            pass


class TestJpeg420Subsampling:
    """4:2:0 chroma subsampling (VERDICT r8 task #7): the MCU-interleaved
    layout real-world JPEGs overwhelmingly use. Properties: MCU-aligned
    constant tiles decode IDENTICALLY from the 4:4:4 and 4:2:0 streams
    (box-averaging a constant is the constant, replication restores it);
    the 4:2:0 stream is smaller on color content; odd dimensions, restart
    markers and 4:2:2 all round-trip; the default 4:4:4 bitstream is
    byte-identical to the pre-4:2:0 encoder (pinned digest)."""

    @staticmethod
    def _tile_image(rng, h, w, tile=16):
        img = np.zeros((h, w, 3), np.uint8)
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                img[ty:ty + tile, tx:tx + tile] = rng.randint(0, 256, 3)
        return img

    def test_constant_tiles_decode_identical_across_subsamplings(self):
        rng = np.random.RandomState(11)
        img = self._tile_image(rng, 32, 48)
        p444 = C.encode_jpeg(48, 32, img.tobytes(), 3, subsampling="444")
        p420 = C.encode_jpeg(48, 32, img.tobytes(), 3, subsampling="420")
        got444 = C.decode_jpeg(p444)
        got420 = C.decode_jpeg(p420)
        assert got444[:3] == (48, 32, 3) and got420[:3] == (48, 32, 3)
        assert np.array_equal(got444[3], got420[3])
        # 2x2 luma + downsampled chroma really is on the wire: SOF comp 1
        # carries factors 0x22 and the stream shrinks
        assert b"\x01\x22\x00" in p420 and b"\x01\x11\x00" in p444
        assert len(p420) < len(p444)

    def test_smooth_content_error_bounded_and_odd_dims(self):
        yy, xx = np.mgrid[0:37, 0:53]
        img = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                        ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)
        p = C.encode_jpeg(53, 37, img.tobytes(), 3, subsampling="420")
        w, h, ch, arr = C.decode_jpeg(p)
        assert (w, h, ch) == (53, 37, 3)
        err = np.abs(arr.astype(int) - img.astype(int)).max()
        assert err <= 96  # chroma is 2x2-averaged AND quantized; bounded
        mean_err = np.abs(arr.astype(int) - img.astype(int)).mean()
        assert mean_err <= 12

    def test_restart_markers_in_mcu_units(self):
        rng = np.random.RandomState(3)
        img = self._tile_image(rng, 48, 64)
        p = C.encode_jpeg(64, 48, img.tobytes(), 3, subsampling="420",
                          restart_interval=3)
        assert b"\xff\xdd" in p            # DRI present
        w, h, ch, arr = C.decode_jpeg(p)
        assert np.array_equal(
            arr, C.decode_jpeg(C.encode_jpeg(64, 48, img.tobytes(), 3,
                                             subsampling="420"))[3])
        bad = p.replace(b"\xff\xd0", b"\xff\xd4", 1)
        with pytest.raises(ValueError, match="RST"):
            C.decode_jpeg(bad)

    def test_422_roundtrip(self):
        rng = np.random.RandomState(5)
        img = self._tile_image(rng, 16, 32, tile=16)
        p422 = C.encode_jpeg(32, 16, img.tobytes(), 3, subsampling="422")
        assert b"\x01\x21\x00" in p422     # H=2, V=1 on the wire
        got = C.decode_jpeg(p422)
        want = C.decode_jpeg(
            C.encode_jpeg(32, 16, img.tobytes(), 3, subsampling="444"))
        assert np.array_equal(got[3], want[3])

    def test_default_444_bitstream_unchanged(self):
        """The judged multimodal_jpeg_decode hash rides on the default
        encoder output: pin its digest so a factors refactor can't move
        the 4:4:4 bitstream silently."""
        import hashlib

        yy, xx = np.mgrid[0:24, 0:24]
        img = np.stack([(yy * 5) % 256, (xx * 7) % 256,
                        ((yy ^ xx) * 3) % 256], axis=-1).astype(np.uint8)
        p = C.encode_jpeg(24, 24, img.tobytes(), 3)
        assert C.encode_jpeg(24, 24, img.tobytes(), 3,
                             subsampling="444") == p
        assert hashlib.md5(p).hexdigest() == \
            "341d1c76d3e8778ba20ac26347796d5f"

    def test_unsupported_subsampling_rejected(self):
        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(ValueError, match="subsampling"):
            C.encode_jpeg(8, 8, img.tobytes(), 3, subsampling="411")
        grey = np.zeros((8, 8), np.uint8)
        # greyscale ignores the layout knob: single full-res component
        assert C.encode_jpeg(8, 8, grey.tobytes(), 1, subsampling="420") \
            == C.encode_jpeg(8, 8, grey.tobytes(), 1)


class TestTiff:
    def _buf(self, n=8 * 8 * 3):
        return bytes((i * 7 + 3) % 256 for i in range(n))

    def test_roundtrip_two_strips(self):
        buf = self._buf()
        s = C.tiff_stats(C.encode_tiff_rgb(8, 8, buf, 4))
        assert (s["width"], s["height"], s["n_strips"]) == (8, 8, 2)
        assert s["strip0_sum"] == sum(buf[:96])
        assert s["strip1_sum"] == sum(buf[96:])
        assert s["sum_r"] == sum(buf[0::3])
        assert s["sum_g"] == sum(buf[1::3])
        assert s["sum_b"] == sum(buf[2::3])

    def test_single_strip_inlines_offset(self):
        # n=1: StripOffsets/ByteCounts fit the 4-byte field -> the INLINE
        # branch of the spec's size rule is exercised
        buf = self._buf()
        s = C.tiff_stats(C.encode_tiff_rgb(8, 8, buf, 8))
        assert s["n_strips"] == 1 and s["strip1_sum"] == 0
        assert s["strip0_sum"] == sum(buf)

    def test_hostile_payloads_reject(self):
        import struct
        import pytest
        good = bytearray(C.encode_tiff_rgb(8, 8, self._buf(), 4))
        with pytest.raises(ValueError):
            C.decode_tiff(b"MM\x00\x2a" + bytes(good[4:]))  # big-endian
        evil = bytearray(good)
        # point the first strip offset block's first entry out of bounds
        (ifd_off,) = struct.unpack_from("<I", evil, 4)
        n = struct.unpack_from("<H", evil, ifd_off)[0]
        for i in range(n):
            tag = struct.unpack_from("<H", evil, ifd_off + 2 + 12 * i)[0]
            if tag == 273:
                (blk,) = struct.unpack_from(
                    "<I", evil, ifd_off + 2 + 12 * i + 8)
                struct.pack_into("<I", evil, blk, 1 << 30)
        with pytest.raises(ValueError):
            C.decode_tiff(bytes(evil))

    def test_truncated_raster_rejects(self):
        import pytest
        buf = self._buf(8 * 7 * 3)   # one row short
        with pytest.raises(ValueError):
            C.encode_tiff_rgb(8, 8, buf, 4)
