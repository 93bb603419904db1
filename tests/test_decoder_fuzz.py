"""Property fuzz for the real media decoders: ARBITRARY bytes must
either decode to a well-formed dict or raise exactly the exception
types the Arrow pipelines catch (NotImplementedError / ValueError) —
any other escape (struct.error, IndexError, UnicodeDecodeError,
OverflowError, infinite loop) would kill a 100 TB stage on one corrupt
blob instead of degrading to a decode_ok=false row."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from s3_elasticsearch_data_pipeline_spark.operators import multimodal as mm

CAUGHT = (NotImplementedError, ValueError)

raw = st.binary(min_size=0, max_size=400)
# bias the fuzz toward each decoder's magic bytes so header parsing
# actually runs instead of failing at the magic check
imagey = st.one_of(raw, st.binary(max_size=200).map(lambda b: b"P6" + b),
                   st.binary(max_size=200).map(lambda b: b"P5" + b),
                   st.binary(max_size=200).map(lambda b: b"BM" + b),
                   st.binary(max_size=200).map(
                       lambda b: mm.PNG_SIGNATURE + b),
                   st.binary(max_size=200).map(
                       lambda b: b"\xff\xd8" + b))
wavy = st.one_of(raw, st.binary(max_size=200).map(
    lambda b: b"RIFF" + b[:4] + b"WAVE" + b[4:]),
                 st.binary(max_size=200).map(
    lambda b: mm.FLAC_SIGNATURE + b))
y4my = st.one_of(raw, st.binary(max_size=200).map(
    lambda b: b"YUV4MPEG2 " + b))


@settings(max_examples=400, deadline=None)
@given(imagey)
def test_decode_image_never_escapes(payload):
    try:
        img = mm.decode_image(payload)
        assert img["width"] > 0 and img["height"] > 0
        assert img["channels"] in (1, 2, 3, 4)
        assert len(img["pixels"]) == (img["width"] * img["height"]
                                      * img["channels"])
    except CAUGHT:
        pass


@settings(max_examples=400, deadline=None)
@given(wavy)
def test_decode_audio_never_escapes(payload):
    try:
        au = mm.decode_audio(payload)
        assert au["sample_rate"] > 0 and au["n_channels"] > 0
        assert au["n_samples"] * au["n_channels"] == len(au["samples"])
        assert au["bits_per_sample"] in (8, 16)
    except CAUGHT:
        pass


@settings(max_examples=400, deadline=None)
@given(y4my)
def test_decode_video_never_escapes(payload):
    try:
        vid = mm.decode_video(payload)
        assert vid["width"] > 0 and vid["height"] > 0
        assert vid["n_frames"] == len(vid["frames"])
        for f in vid["frames"]:
            assert len(f) == vid["width"] * vid["height"]
    except CAUGHT:
        pass


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2000), st.data())
def test_truncated_valid_payloads_never_escape(cut, data):
    """Every truncation point of a VALID payload must degrade cleanly
    (the realistic corruption: an interrupted object-store read)."""
    kind = data.draw(st.sampled_from(
        ["img", "wav", "y4m", "png", "png_rgba", "png_pal", "jpeg",
         "jpeg420", "jpeg_gray", "flac", "flac_ms"]))
    if kind == "img":
        full = mm.encode_ppm(4, 3, bytes(range(36)))
        fn = mm.decode_image
    elif kind == "png":
        full = mm.encode_png(4, 3, bytes(range(36)), 3)
        fn = mm.decode_image
    elif kind == "png_rgba":
        full = mm.encode_png(3, 4, bytes(range(48)), 4)
        fn = mm.decode_image
    elif kind == "png_pal":
        full = mm.encode_png_palette(5, 5, bytes(x % 4 for x in range(25)),
                                     bytes(range(12)))
        fn = mm.decode_image
    elif kind == "jpeg":
        full = mm.encode_jpeg(9, 10, mm._gen_block_pixels(5, 9, 10))
        fn = mm.decode_image
    elif kind == "jpeg420":
        full = mm.encode_jpeg(16, 16, mm._gen_block_pixels(6, 16, 16),
                              subsampling="420")
        fn = mm.decode_image
    elif kind == "jpeg_gray":
        full = mm.encode_jpeg(8, 8, bytes(range(64)), channels=1)
        fn = mm.decode_image
    elif kind == "wav":
        full = mm.encode_wav(8000, list(range(-20, 20)))
        fn = mm.decode_audio
    elif kind == "flac":
        full = mm.encode_flac(8000, mm._gen_audio_samples(3, 300))
        fn = mm.decode_audio
    elif kind == "flac_ms":
        full = mm.encode_flac(8000, mm._gen_audio_samples(4, 400),
                              n_channels=2, mid_side=True)
        fn = mm.decode_audio
    else:
        full = mm.encode_y4m(4, 4, [bytes(16), bytes(range(16))])
        fn = mm.decode_video
    try:
        fn(full[:min(cut, len(full))])
    except CAUGHT:
        pass


@settings(max_examples=120, deadline=None)
@given(st.integers(min_value=2, max_value=10_000),
       st.integers(min_value=0, max_value=255))
def test_mutated_jpeg_never_escapes(pos, val):
    """Single-byte corruption anywhere in a valid baseline JPEG —
    header, tables, or entropy data — must either still decode (a
    flipped coefficient bit is legal data) or raise exactly the
    caught types; huffman desync must not loop or throw IndexError."""
    full = bytearray(mm.encode_jpeg(16, 12, mm._gen_block_pixels(9, 16, 12)))
    p = pos % len(full)
    full[p] = val
    try:
        img = mm.decode_image(bytes(full))
        assert img["width"] > 0 and img["height"] > 0
        assert len(img["pixels"]) == (img["width"] * img["height"]
                                      * img["channels"])
    except CAUGHT:
        pass


@settings(max_examples=120, deadline=None)
@given(st.integers(min_value=4, max_value=10_000),
       st.integers(min_value=0, max_value=255))
def test_mutated_flac_never_escapes(pos, val):
    """Single-byte corruption anywhere in a valid FLAC stream —
    metadata, frame header, rice-coded residuals — must either still
    decode (CRCs do not cover STREAMINFO padding bytes) or raise
    exactly the caught types; a corrupted unary run must not loop."""
    full = bytearray(mm.encode_flac(8000, mm._gen_audio_samples(6, 500)))
    p = pos % len(full)
    full[p] = val
    try:
        au = mm.decode_audio(bytes(full))
        assert au["n_samples"] * au["n_channels"] == len(au["samples"])
    except CAUGHT:
        pass
