"""Real image decode (round-2): PPM/PGM/BMP decoding correctness,
graceful degradation on undecodable payloads, true features through the
Arrow pipeline, and exact nearest-neighbor resize digests."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.operators import multimodal as mm
from s3_elasticsearch_data_pipeline_spark.tables import load_table


def _bmp_24(width, height, rgb_rows, bottom_up=True):
    """Hand-built uncompressed 24-bpp BMP; rgb_rows[y][x] = (r, g, b)
    in TOP-DOWN visual order."""
    row_size = ((24 * width + 31) // 32) * 4
    raster = b""
    ys = range(height - 1, -1, -1) if bottom_up else range(height)
    for y in ys:
        row = b"".join(bytes((b, g, r)) for (r, g, b) in rgb_rows[y])
        raster += row + b"\x00" * (row_size - len(row))
    data_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", data_off + len(raster), 0, 0,
                                  data_off)
              + struct.pack("<IiiHHIIiiII", 40, width,
                            height if bottom_up else -height,
                            1, 24, 0, len(raster), 2835, 2835, 0, 0))
    return header + raster


def test_ppm_roundtrip_and_comments():
    px = bytes(range(2 * 2 * 3))
    img = mm.decode_image(mm.encode_ppm(2, 2, px))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == px
    # header comments + multiple whitespace forms
    with_comment = b"P6\n# a comment\n 2 2\n# another\n255\n" + px
    assert mm.decode_image(with_comment)["pixels"] == px


def test_pgm_grayscale():
    payload = b"P5\n3 2\n255\n" + bytes([0, 10, 20, 30, 40, 50])
    img = mm.decode_image(payload)
    assert (img["width"], img["height"], img["channels"]) == (3, 2, 1)
    assert img["pixels"] == bytes([0, 10, 20, 30, 40, 50])


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_normalizes_to_rgb_topdown(bottom_up):
    rows = [[(255, 0, 0), (0, 255, 0)],
            [(0, 0, 255), (9, 8, 7)]]
    img = mm.decode_image(_bmp_24(2, 2, rows, bottom_up=bottom_up))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == bytes(
        v for row in rows for (r, g, b) in row for v in (r, g, b))


def test_undecodable_and_truncated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n....")
    with pytest.raises(ValueError):
        mm.decode_image(b"P6\n4 4\n255\n" + b"\x01" * 5)  # short raster


def test_image_features_true_values_and_degradation(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    feats = mm.image_features(mm.attach_image_payload(docs)).collect()
    assert len(feats) == 50 and all(r["decode_ok"] for r in feats)
    for r in feats[:10]:
        w, h = mm._gen_dims(r["doc_id"])
        px = mm._gen_pixels(r["doc_id"], w, h)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["mean_intensity"] == pytest.approx(sum(px) / len(px))
    # text payloads are not images → decode_ok=false rows, no task error
    bad = mm.image_features(mm.attach_payload(docs)).collect()
    assert all(not r["decode_ok"] and r["width"] is None for r in bad)


def test_resize_real_exact_digest(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    out = {r["doc_id"]: r for r in mm.resize_images_real(
        mm.attach_image_payload(docs), width=4, height=5).collect()}
    for doc_id, r in list(out.items())[:5]:
        assert r["decode_ok"] and (r["width"], r["height"]) == (4, 5)
        sw, sh = mm._gen_dims(doc_id)
        px = mm._gen_pixels(doc_id, sw, sh)
        expected = bytearray()
        for ty in range(5):
            sy = min(ty * sh // 5, sh - 1)
            for tx in range(4):
                sx = min(tx * sw // 4, sw - 1)
                expected += px[(sy * sw + sx) * 3:(sy * sw + sx) * 3 + 3]
        assert r["resized_md5"] == hashlib.md5(
            bytes(expected).hex().encode()).hexdigest()


def test_image_decode_oracle_parity(spark, sf_oracle):
    """The registered query's Spark result must match the symbolic
    DuckDB oracle (same check the driver runs)."""
    from s3_elasticsearch_data_pipeline_spark import registry
    from tests.oracle import compare, duckdb_conn
    con = duckdb_conn(sf_oracle)
    try:
        df = registry.queries()["image_decode_features"](spark, sf_oracle)
        probs = compare(df, con, registry.oracle_sql()["image_decode_features"])
        assert not probs, probs
    finally:
        con.close()

# ---------------------------------------------------------------------------
# Real audio decode (round-3): RIFF/WAVE PCM parsing correctness,
# chunk-skip tolerance, degradation, true features, oracle parity.
# ---------------------------------------------------------------------------

def test_wav_roundtrip_16bit_mono():
    samples = [0, 100, -100, 32767, -32768, 7]
    au = mm.decode_audio(mm.encode_wav(8000, samples))
    assert (au["sample_rate"], au["n_channels"],
            au["bits_per_sample"], au["n_samples"]) == (8000, 1, 16, 6)
    assert list(au["samples"]) == samples


def test_wav_stereo_frames_counted_per_channel_set():
    # interleaved L/R: 4 frames of 2 channels
    samples = [1, -1, 2, -2, 3, -3, 4, -4]
    au = mm.decode_audio(mm.encode_wav(44100, samples, n_channels=2))
    assert au["n_channels"] == 2 and au["n_samples"] == 4
    assert list(au["samples"]) == samples


def test_wav_skips_unknown_chunks_and_8bit():
    # hand-build: RIFF + LIST chunk (skipped) + fmt(8-bit) + data
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    data = bytes([0, 128, 255, 200])      # unsigned on disk
    body = (b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    au = mm.decode_audio(payload)
    assert (au["sample_rate"], au["bits_per_sample"]) == (4000, 8)
    assert list(au["samples"]) == [-128, 0, 127, 72]  # normalized signed


def test_wav_undecodable_and_corrupt():
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"xx")                        # not RIFF
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"OggS" + b"\x00" * 40)       # other container
    # compressed wav (format tag 3 = float) → not implemented
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        mm.decode_audio(payload)
    # truncated data chunk → ValueError
    good = mm.encode_wav(8000, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        mm.decode_audio(good[:-3])


def test_audio_features_true_values_and_degradation(spark, sf_smoke):
    import math
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    feats = mm.audio_features(mm.attach_audio_payload(docs)).collect()
    assert len(feats) == 50 and all(r["decode_ok"] for r in feats)
    for r in feats[:10]:
        rate, n = mm._gen_audio_params(r["doc_id"])
        s = mm._gen_audio_samples(r["doc_id"], n)
        assert (r["sample_rate"], r["n_channels"],
                r["bits_per_sample"], r["n_samples"]) == (rate, 1, 16, n)
        assert r["duration_s"] == pytest.approx(n / rate)
        assert r["rms"] == math.sqrt(sum(v * v for v in s) / len(s))
    # text payloads are not WAV → decode_ok=false rows, no task error
    bad = mm.audio_features(mm.attach_payload(docs)).collect()
    assert all(not r["decode_ok"] and r["rms"] is None for r in bad)


def test_audio_decode_oracle_parity(spark, sf_oracle):
    """The registered query's Spark result must match the symbolic
    DuckDB oracle (same check the driver runs)."""
    from s3_elasticsearch_data_pipeline_spark import registry
    from tests.oracle import compare, duckdb_conn
    con = duckdb_conn(sf_oracle)
    try:
        df = registry.queries()["audio_decode_features"](spark, sf_oracle)
        probs = compare(df, con, registry.oracle_sql()["audio_decode_features"])
        assert not probs, probs
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Real video decode (round-3): y4m parsing correctness, colourspace
# handling, degradation, per-frame features, oracle parity.
# ---------------------------------------------------------------------------

def test_y4m_roundtrip_and_header_tags():
    f0, f1 = bytes(range(16)), bytes(range(16, 32))
    vid = mm.decode_video(mm.encode_y4m(4, 4, [f0, f1], fps=(30, 1)))
    assert (vid["width"], vid["height"], vid["n_frames"]) == (4, 4, 2)
    assert (vid["fps_num"], vid["fps_den"]) == (30, 1)
    assert vid["frames"] == [f0, f1]


@pytest.mark.parametrize("colour,chroma_factor", [
    (b"C420", 0.5), (b"C422", 1.0), (b"C444", 2.0), (b"Cmono", 0.0)])
def test_y4m_colourspaces_locate_luma(colour, chroma_factor):
    w, h = 4, 2
    luma = bytes(range(w * h))
    chroma = bytes([128]) * int(w * h * chroma_factor)
    payload = (b"YUV4MPEG2 W4 H2 F25:1 " + colour + b"\x0a"
               + b"FRAME\x0a" + luma + chroma
               + b"FRAME\x0a" + luma + chroma)
    vid = mm.decode_video(payload)
    assert vid["n_frames"] == 2 and vid["frames"][1] == luma


def test_y4m_undecodable_and_corrupt():
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"xx")
    with pytest.raises(NotImplementedError):  # compressed container
        mm.decode_video(b"\x00\x00\x00\x18ftypmp42....")
    good = mm.encode_y4m(4, 4, [bytes(16)])
    with pytest.raises(ValueError):
        mm.decode_video(good[:-5])            # truncated raster
    with pytest.raises(ValueError):           # bad frame marker
        mm.decode_video(good[:good.index(b"FRAME")] + b"JUNK\x0a" + bytes(24))
    with pytest.raises(NotImplementedError):  # exotic colourspace
        mm.decode_video(b"YUV4MPEG2 W4 H2 C411\x0aFRAME\x0a" + bytes(12))


def test_video_frame_features_true_values_and_degradation(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    feats = mm.video_frame_features(mm.attach_video_payload(docs)).collect()
    by_doc = {}
    for r in feats:
        assert r["decode_ok"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 40
    for doc_id, rows in list(by_doc.items())[:8]:
        w, h, n = mm._gen_video_params(doc_id)
        assert len(rows) == n
        for r in sorted(rows, key=lambda r: r["frame_index"]):
            luma = mm._gen_video_luma(doc_id, w, h, r["frame_index"])
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
            assert r["fps"] == 25.0
            assert r["mean_luma"] == pytest.approx(sum(luma) / len(luma))
    # text payloads are not y4m → one decode_ok=false row each
    bad = mm.video_frame_features(mm.attach_payload(docs)).collect()
    assert len(bad) == 40
    assert all(not r["decode_ok"] and r["mean_luma"] is None for r in bad)


def test_video_decode_oracle_parity(spark, sf_oracle):
    """The registered query's Spark result must match the symbolic
    DuckDB oracle (same check the driver runs)."""
    from s3_elasticsearch_data_pipeline_spark import registry
    from tests.oracle import compare, duckdb_conn
    con = duckdb_conn(sf_oracle)
    try:
        df = registry.queries()["video_decode_features"](spark, sf_oracle)
        probs = compare(df, con, registry.oracle_sql()["video_decode_features"])
        assert not probs, probs
    finally:
        con.close()


def test_audio_chunk_rms_values_and_degradation(spark, sf_smoke):
    import math
    docs = load_table(spark, sf_smoke, "documents").limit(30)
    rows = mm.audio_chunk_rms(mm.attach_audio_payload(docs),
                              128, 64).collect()
    by_doc = {}
    for r in rows:
        assert r["decode_ok"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in list(by_doc.items())[:6]:
        rate, n = mm._gen_audio_params(doc_id)
        s = mm._gen_audio_samples(doc_id, n)
        expected = []
        off = 0
        while off < n:
            w = s[off:off + 128]
            expected.append((off // 64, off / rate, len(w),
                             math.sqrt(sum(v * v for v in w) / len(w))))
            off += 64
        got = sorted((r["chunk_index"], r["start_s"],
                      r["n_chunk_samples"], r["rms"]) for r in chunks)
        assert [g[0] for g in got] == [e[0] for e in expected]
        for g, e in zip(got, expected):
            assert g[1] == pytest.approx(e[1]) and g[2] == e[2]
            assert g[3] == pytest.approx(e[3])
    bad = mm.audio_chunk_rms(mm.attach_payload(docs), 128, 64).collect()
    assert all(not r["decode_ok"] and r["rms"] is None for r in bad)


def test_audio_chunk_rms_oracle_parity(spark, sf_oracle):
    from s3_elasticsearch_data_pipeline_spark import registry
    from tests.oracle import compare, duckdb_conn
    con = duckdb_conn(sf_oracle)
    try:
        df = registry.queries()["audio_chunk_rms"](spark, sf_oracle)
        probs = compare(df, con, registry.oracle_sql()["audio_chunk_rms"])
        assert not probs, probs
    finally:
        con.close()


def test_frameless_clip_and_empty_wav_still_accounted(spark):
    """A VALID clip with zero frames / a VALID WAV with an empty data
    chunk must still produce one decode_ok=true row — a doc must never
    silently vanish from the output (the degradation contract is that
    every input is accounted for)."""
    empty_clip = b"YUV4MPEG2 W4 H4 F25:1 C420\x0a"
    empty_wav = mm.encode_wav(8000, [])
    payloads = spark.createDataFrame(
        [(1, "video/x-yuv4mpeg", bytearray(empty_clip), len(empty_clip)),
         (2, "audio/wav", bytearray(empty_wav), len(empty_wav))],
        "doc_id long, media_type string, payload binary, n_bytes long")
    vrows = mm.video_frame_features(
        payloads.where("doc_id = 1")).collect()
    assert len(vrows) == 1 and vrows[0]["decode_ok"]
    assert vrows[0]["n_frames"] == 0 and vrows[0]["frame_index"] is None
    arows = mm.audio_chunk_rms(payloads.where("doc_id = 2"),
                               128, 64).collect()
    assert len(arows) == 1 and arows[0]["decode_ok"]
    assert arows[0]["rms"] is None


def test_audio_chunk_rms_stereo_timebase(spark):
    """Interleaved stereo: start_s advances by hop/(rate*channels) —
    a 2-channel clip's second chunk starts at half the mono time."""
    samples = [((i * 7) % 256) - 128 for i in range(512)]
    wav = mm.encode_wav(8000, samples, n_channels=2)
    payloads = spark.createDataFrame(
        [(1, "audio/wav", bytearray(wav), len(wav))],
        "doc_id long, media_type string, payload binary, n_bytes long")
    rows = sorted(mm.audio_chunk_rms(payloads, 128, 64).collect(),
                  key=lambda r: r["chunk_index"])
    assert rows[0]["start_s"] == 0.0
    assert rows[1]["start_s"] == pytest.approx(64 / (8000 * 2))


def test_png_round_trip_all_filters_and_damage(spark):
    """The real PNG codec: encode cycles every scanline filter
    (None/Sub/Up/Average/Paeth), decode must reproduce the raster
    byte-for-byte through inflate + unfilter; CRC damage and
    truncation are structural errors, unsupported color types are
    honest NotImplementedError guards."""
    import zlib

    import pytest as _pytest

    from s3_elasticsearch_data_pipeline_spark.operators import (
        multimodal as mm)
    for w, h, ch in [(16, 12, 3), (5, 7, 1), (1, 1, 3), (3, 9, 3),
                     (6, 11, 2), (9, 8, 4)]:  # + gray+alpha, RGBA
        px = bytes((x * 7 + 13 * (x // w) + 31 * (x % ch) + 5) % 256
                   for x in range(w * h * ch))
        blob = mm.encode_png(w, h, px, ch)
        assert blob[:8] == mm.PNG_SIGNATURE
        d = mm.decode_image(blob)
        assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
        assert d["pixels"] == px
    blob = mm.encode_png(4, 6, bytes(range(72)), 3)
    bad = bytearray(blob)
    bad[40] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        mm._decode_png(bytes(bad))
    with _pytest.raises(ValueError, match="truncated"):
        mm._decode_png(blob[:30])
    # unsupported bit depth → honest guard, not garbage
    import struct
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr)
            + mm._png_chunk(b"IDAT", zlib.compress(bytes(24)))
            + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError):
        mm._decode_png(deep)


def test_png_palette_round_trip_and_damage():
    """Indexed-color PNG (type 3, RFC 2083 §4.1.2): unfilter operates
    on index bytes, PLTE expansion yields RGB — and palette damage
    (missing PLTE, short PLTE, out-of-range index) is structural
    ValueError, not garbage pixels."""
    import struct
    import zlib

    import pytest as _pytest

    from s3_elasticsearch_data_pipeline_spark.operators import (
        multimodal as mm)
    w, h = 7, 9
    palette = bytes((i * 11 + j * 3) % 256
                    for i in range(16) for j in range(3))
    indices = bytes((x * 5 + 3) % 16 for x in range(w * h))
    blob = mm.encode_png_palette(w, h, indices, palette)
    d = mm.decode_image(blob)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    expect = b"".join(palette[i * 3:i * 3 + 3] for i in indices)
    assert d["pixels"] == expect
    # structurally valid chunks, but the PLTE is missing entirely
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = zlib.compress(b"\x00\x00\x01")  # filter 0, indices 0,1
    no_plte = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", raw)
               + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="PLTE"):
        mm._decode_png(no_plte)
    # index 1 points past a one-entry palette
    short_plte = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr)
                  + mm._png_chunk(b"PLTE", b"\x10\x20\x30")
                  + mm._png_chunk(b"IDAT", raw)
                  + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="index out of range"):
        mm._decode_png(short_plte)
    # PLTE not a multiple of 3 bytes
    bad_plte = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr)
                + mm._png_chunk(b"PLTE", b"\x10\x20")
                + mm._png_chunk(b"IDAT", raw)
                + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="triples"):
        mm._decode_png(bad_plte)


def test_png_decode_features_match_ppm_features(spark, sf_smoke):
    """The PNG payload pipeline must decode to the IDENTICAL features
    as the uncompressed PPM pipeline over the same generative raster —
    the compressed path adds no drift."""
    import os

    from pyspark.sql import functions as F

    from s3_elasticsearch_data_pipeline_spark.operators import (
        multimodal as mm)
    docs = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")).limit(60)
    ppm = {r.doc_id: (r.width, r.height, r.channels, r.n_pixels,
                      r.mean_intensity)
           for r in mm.image_features(
               mm.attach_image_payload(docs)).collect()}
    png = {r.doc_id: (r.width, r.height, r.channels, r.n_pixels,
                      r.mean_intensity)
           for r in mm.image_features(
               mm.attach_png_payload(docs)).collect()}
    assert png == ppm and len(png) == 60
    # and PNG payloads are genuinely compressed DIFFERENT bytes
    a = mm.attach_image_payload(docs).agg(F.sum("n_bytes")).first()[0]
    b = mm.attach_png_payload(docs).agg(F.sum("n_bytes")).first()[0]
    assert a != b


def test_png_structural_damage_degrades_not_kills(spark):
    """zlib/struct failures must surface as the documented ValueError —
    and through image_features as decode_ok=false rows — never as a
    stage-killing foreign exception."""
    import struct

    import pytest as _pytest

    from s3_elasticsearch_data_pipeline_spark.operators import (
        multimodal as mm)
    # CRC-valid chunks but no IDAT stream at all
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    no_idat = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="inflate"):
        mm._decode_png(no_idat)
    # CRC-valid IDAT carrying garbage (not a deflate stream)
    bad_idat = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr)
                + mm._png_chunk(b"IDAT", b"not-deflate")
                + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="inflate"):
        mm._decode_png(bad_idat)
    # IHDR with the wrong length (struct.error must not escape)
    short = (mm.PNG_SIGNATURE + mm._png_chunk(b"IHDR", ihdr[:9])
             + mm._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="IHDR length"):
        mm._decode_png(short)
    # end-to-end posture: the corrupt blob yields decode_ok=false, the
    # good one decodes — one task, no exception
    good = mm.encode_png(3, 2, bytes(range(18)), 3)
    frame = spark.createDataFrame(
        [(1, bytearray(bad_idat), len(bad_idat)),
         (2, bytearray(good), len(good))],
        "doc_id long, payload binary, n_payload_bytes long")
    rows = {r.doc_id: r.decode_ok
            for r in mm.image_features(frame).collect()}
    assert rows == {1: False, 2: True}


# ---------------------------------------------------------------------------
# Baseline JPEG (round-9): encode/decode roundtrip exactness on
# constant-block fixtures, lossy-bound on arbitrary data, subsampling,
# restart markers, degradation, oracle parity.
# ---------------------------------------------------------------------------

def _predict_jpeg_constant(doc_id, w, h):
    """Pure-Python replay of the symbolic oracle's per-pixel chain —
    the closed form of the lossy roundtrip for constant 8x8 blocks."""
    import math
    px = []
    for y in range(h):
        by = y // 8
        for x in range(w):
            bx = x // 8
            r = (doc_id * 3 + bx * 7 + by * 11) % 256
            g = (doc_id * 5 + bx * 13 + by * 3) % 256
            b = (doc_id * 7 + bx * 5 + by * 17) % 256
            yf = 0.299 * r + 0.587 * g + 0.114 * b
            cbf = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            crf = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

            def q(c):
                return min(255.0, max(0.0, 2 * math.floor(
                    8.0 * (c - 128.0) / 16.0 + 0.5) + 128))
            yp, cbp, crp = q(yf), q(cbf), q(crf)
            px += [
                int(min(255, max(0, math.floor(
                    yp + 1.402 * (crp - 128.0) + 0.5)))),
                int(min(255, max(0, math.floor(
                    yp - 0.344136 * (cbp - 128.0)
                    - 0.714136 * (crp - 128.0) + 0.5)))),
                int(min(255, max(0, math.floor(
                    yp + 1.772 * (cbp - 128.0) + 0.5))))]
    return bytes(px)


def test_jpeg_constant_block_roundtrip_exact():
    """Encode → decode of the generative constant-block fixtures must
    reproduce the closed-form prediction BIT-FOR-BIT (this is what
    licenses the symbolic oracle): every block is DC-only, the DC
    quantizes from the block mean with no float noise, and all
    rounding is floor(x+0.5)."""
    for doc_id in (0, 1, 7, 42, 123, 255, 999):
        w, h = mm._gen_dims(doc_id)
        enc = mm.encode_jpeg(w, h, mm._gen_block_pixels(doc_id, w, h))
        dec = mm._decode_jpeg(enc)
        assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
        assert dec["pixels"] == _predict_jpeg_constant(doc_id, w, h)


def test_jpeg_grayscale_and_lossy_bound():
    """1-component JPEGs decode to channels=1; on a smooth gradient the
    lossy error stays within a few quantization steps; on uniform
    blocks it is exact."""
    import numpy as np
    grad = np.linspace(0, 255, 24 * 24).reshape(24, 24).astype(np.uint8)
    dec = mm._decode_jpeg(mm.encode_jpeg(24, 24, grad.tobytes(),
                                         channels=1))
    assert dec["channels"] == 1
    err = np.abs(np.frombuffer(dec["pixels"], np.uint8)
                 .astype(int).reshape(24, 24) - grad.astype(int))
    assert err.max() <= 8, err.max()
    flat = np.full((8, 8), 200, dtype=np.uint8)
    dec2 = mm._decode_jpeg(mm.encode_jpeg(8, 8, flat.tobytes(),
                                          channels=1))
    assert np.frombuffer(dec2["pixels"], np.uint8).reshape(8, 8)[0, 0] == 200


def test_jpeg_420_and_restart_markers():
    """4:2:0 chroma subsampling (interleaved 4-Y MCUs + upsample) and
    restart intervals (RSTn byte-align + DC predictor reset) must both
    roundtrip; restart placement must not change the decoded raster."""
    raw = mm._gen_block_pixels(4, 16, 16)
    for rst in (0, 1, 3):
        d420 = mm._decode_jpeg(mm.encode_jpeg(16, 16, raw,
                                              subsampling="420",
                                              restart_interval=rst))
        assert (d420["width"], d420["height"], d420["channels"]) \
            == (16, 16, 3)
    a = mm._decode_jpeg(mm.encode_jpeg(16, 12, raw[:16 * 12 * 3],
                                       restart_interval=1))
    b = mm._decode_jpeg(mm.encode_jpeg(16, 12, raw[:16 * 12 * 3],
                                       restart_interval=2))
    c = mm._decode_jpeg(mm.encode_jpeg(16, 12, raw[:16 * 12 * 3]))
    assert a["pixels"] == b["pixels"] == c["pixels"]


def test_jpeg_unsupported_and_damage():
    """Progressive SOF2 and 16-bit qtables gate as NotImplementedError;
    structural damage (truncation, corrupt table ids, stray markers)
    raises ValueError — both of which image_features degrades to
    decode_ok=false."""
    enc = bytearray(mm.encode_jpeg(16, 12, mm._gen_block_pixels(3, 16, 12)))
    with pytest.raises(ValueError):
        mm._decode_jpeg(bytes(enc[:40]))
    with pytest.raises(ValueError):
        mm._decode_jpeg(b"\xff\xd8\xff\xd9")
    # SOF0 -> SOF2 (progressive)
    prog = bytes(enc).replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError):
        mm._decode_jpeg(prog)
    # 16-bit quant table (Pq=1 in the DQT precision nibble)
    dqt_at = bytes(enc).index(b"\xff\xdb") + 4
    hacked = bytearray(enc)
    hacked[dqt_at] = 0x10
    with pytest.raises(NotImplementedError):
        mm._decode_jpeg(bytes(hacked))


def test_jpeg_features_degradation(spark):
    """Through the Arrow pipeline: one valid JPEG + one truncated one →
    decode_ok true/false rows, never a task failure."""
    enc = mm.encode_jpeg(16, 12, mm._gen_block_pixels(8, 16, 12))
    rows = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(enc), len(enc)),
         (2, "image/jpeg", bytearray(enc[:60]), 60)],
        "doc_id long, media_type string, payload binary, n_bytes long")
    out = {r["doc_id"]: r for r in mm.image_features(rows).collect()}
    assert out[1]["decode_ok"] and out[1]["width"] == 16
    assert not out[2]["decode_ok"] and out[2]["width"] is None


def test_jpeg_decode_oracle_parity(spark, sf_oracle):
    """The registered query's Spark result must match the symbolic
    DuckDB oracle (same check the driver runs)."""
    from s3_elasticsearch_data_pipeline_spark import registry
    from tests.oracle import compare, duckdb_conn
    con = duckdb_conn(sf_oracle)
    try:
        df = registry.queries()["image_decode_jpeg"](spark, sf_oracle)
        probs = compare(df, con, registry.oracle_sql()["image_decode_jpeg"])
        assert not probs, probs
    finally:
        con.close()


def test_jpeg_overfull_huffman_table_rejected():
    """A CONSISTENT (BITS, HUFFVAL) pair can still declare more codes
    than fit the code space (e.g. 3 codes of length 1). The flat-table
    builder must raise ValueError instead of slice-appending past the
    65536-entry table (~8 MB/table memory amplification on untrusted
    corpora); the canonical-code builder must agree."""
    bits = [3] + [0] * 15          # 3 codes of length 1 — max is 2
    vals = [0, 1, 2]
    with pytest.raises(ValueError):
        mm._jpeg_decode_tree(bits, vals)
    with pytest.raises(ValueError):
        mm._jpeg_canonical_codes(bits, vals)
    # the pathological advisor case: one 255-code length-1 class
    bits2 = [255] + [0] * 15
    vals2 = list(range(255))
    with pytest.raises(ValueError):
        mm._jpeg_decode_tree(bits2, vals2)
    # a legal full table still builds (2 codes of length 1)
    table = mm._jpeg_decode_tree([2] + [0] * 15, [7, 9])
    assert len(table) == 65536 and table[0] == (7, 1)


def test_jpeg_bitreader_padding_is_all_ones():
    """peek16 reads a 4-byte window; once pos sits entirely inside the
    virtual padding (reachable on corrupt streams within the 7-bit
    overrun allowance) the contract is ALL-ONES — a short 3-byte pad
    would return 0x00FF-shaped values and let a leading-zeros huffman
    code match garbage instead of tripping the truncation error."""
    r = mm._JpegBitReader([b""])
    assert r.peek16() == 0xFFFF
    r2 = mm._JpegBitReader([b"\x00"])
    r2.consume(7)               # legal flush-padding overrun
    assert r2.peek16() == 0x7FFF  # 1 real zero bit then pure padding


def test_flac_roundtrip_every_subframe_path():
    """r10 FLAC codec: every subframe family (CONSTANT, VERBATIM,
    FIXED 0-2 via the auto chooser), rice escape, multi-frame streams,
    independent and mid/side stereo, 8-bit — decode must return the
    encoder's input EXACTLY (losslessness is the whole oracle lever)."""
    import random
    rng = random.Random(11)
    cases = [
        ([64] * 300, 1, {}),                            # CONSTANT
        (list(range(-250, 250)), 1, {}),                # FIXED ramp
        ([rng.randrange(-2048, 2048) for _ in range(777)], 1, {}),
        ([rng.randrange(-30000, 30000) for _ in range(300)], 1,
         {"force_verbatim": True}),                     # VERBATIM
        ([rng.randrange(-1000, 1000) for _ in range(600)], 2, {}),
        ([rng.randrange(-1000, 1000) for _ in range(600)], 2,
         {"mid_side": True}),
        ([rng.randrange(-128, 128) for _ in range(300)], 1, {"bps": 8}),
        ([-32768, 32767] * 150, 1, {}),                 # rice escape
        (list(range(200)) * 40, 1, {"block_size": 192}),  # many frames
        ([7], 1, {}),
        ([], 1, {}),
    ]
    for samples, nch, kw in cases:
        payload = mm.encode_flac(8000, samples, n_channels=nch, **kw)
        dec = mm.decode_audio(payload)
        assert list(dec["samples"]) == list(samples), (nch, kw)
        assert dec["n_channels"] == nch and dec["sample_rate"] == 8000
        assert dec["n_samples"] == len(samples) // nch


def test_flac_structural_damage_degrades_not_kills():
    """Bad CRCs, truncation, reserved codes, and wrong magic raise
    exactly the caught types (ValueError / NotImplementedError)."""
    full = bytearray(mm.encode_flac(8000, mm._gen_audio_samples(9, 400)))
    with pytest.raises((ValueError, NotImplementedError)):
        mm.decode_audio(bytes(full[:30]))            # inside STREAMINFO
    with pytest.raises(ValueError):
        mm.decode_audio(bytes(full[:-1]))            # truncated frame
    bad = bytearray(full)
    bad[-1] ^= 0xFF                                  # frame CRC-16
    with pytest.raises(ValueError):
        mm.decode_audio(bytes(bad))
    # 20-bit streams gate as unsupported, not as garbage
    deep = bytearray(mm.encode_flac(8000, [0, 1, 2, 3]))
    # STREAMINFO bps-1 field: byte 4+4+12 .. set bps-1=19 (20-bit)
    # bits 100..107 of the 34-byte body start at payload offset 8+12
    body_off = 8  # 4 magic + 4 block header
    si = int.from_bytes(deep[body_off:body_off + 34], "big")
    si = (si & ~(0x1F << 164)) | (19 << 164)
    deep[body_off:body_off + 34] = si.to_bytes(34, "big")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(bytes(deep))


def test_flac_features_through_audio_pipeline(spark):
    """The Arrow feature pipeline reads FLAC payloads exactly like WAV
    ones — identical features for identical tones, decode_ok=false on
    a corrupted stream."""
    docs = spark.createDataFrame([(i,) for i in range(6)],
                                 "doc_id long")
    wav = mm.audio_features(mm.attach_audio_payload(docs)).collect()
    flac = mm.audio_features(mm.attach_flac_payload(docs)).collect()
    key = lambda r: r["doc_id"]
    for a, b in zip(sorted(wav, key=key), sorted(flac, key=key)):
        assert tuple(a) == tuple(b)


def test_flac_decode_oracle_parity(spark, sf_oracle):
    from s3_elasticsearch_data_pipeline_spark import registry
    from tests.oracle import compare, duckdb_conn
    con = duckdb_conn(sf_oracle)
    try:
        df = registry.queries()["audio_decode_flac"](spark, sf_oracle)
        probs = compare(df, con, registry.oracle_sql()["audio_decode_flac"])
        assert not probs, probs
    finally:
        con.close()


def test_flac_lpc_subframe_decodes():
    """The LPC subframe path (order-2 quantized predictor) — the
    encoder twin only emits fixed predictors, so this hand-crafts the
    bitstream: warmup + coefficients + shift + rice residuals computed
    from a known signal, wrapped in a valid frame (CRC-8/16). Decode
    must reproduce the signal exactly."""
    import math
    bps, bs, rate = 16, 64, 8000
    x = [round(1000 * math.sin(i / 5)) for i in range(bs)]
    order, prec, shift = 2, 12, 5
    coefs = [63, -31]  # prediction = (63*x[n-1] - 31*x[n-2]) >> 5
    res = [x[i] - ((coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift)
           for i in range(order, bs)]
    w = mm._FlacBitWriter()
    w.put(0x3FFE, 14)
    w.put(0, 2)          # reserved + fixed blocking
    w.put(7, 4)          # 16-bit block size at end
    w.put(0, 4)          # rate from STREAMINFO
    w.put(0, 4)          # 1 channel
    w.put(4, 3)          # 16-bit samples
    w.put(0, 1)
    w.put(0, 8)          # frame number 0
    w.put(bs - 1, 16)
    w.put(mm._flac_crc8(bytes(w.buf)), 8)
    # LPC subframe: pad 0, type 1xxxxx = 100000 + (order-1), wasted 0
    w.put(0, 1)
    w.put(32 + order - 1, 6)
    w.put(0, 1)
    for v in x[:order]:
        w.put(v, bps)
    w.put(prec - 1, 4)
    w.put(shift, 5)
    for c in coefs:
        w.put(c, prec)
    mm._flac_write_residuals(w, res)
    w.align()
    frame = w.bytes()
    frame += mm._flac_crc16(frame).to_bytes(2, "big")
    si = 0
    for v, k in ((bs, 16), (bs, 16), (0, 24), (0, 24), (rate, 20),
                 (0, 3), (bps - 1, 5), (bs, 36)):
        si = (si << k) | v
    streaminfo = si.to_bytes(18, "big") + bytes(16)
    payload = (mm.FLAC_SIGNATURE + bytes((0x80,))
               + len(streaminfo).to_bytes(3, "big") + streaminfo + frame)
    dec = mm.decode_audio(payload)
    assert list(dec["samples"]) == x
    assert dec["n_samples"] == bs
