"""Multimodal column plumbing (M4 north star).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, partitioning,
``mapInPandas`` signatures — is real and tested. ``decode_image`` is a
REAL dependency-free decoder for binary PPM/PGM and uncompressed BMP
(true width/height/channels/pixels), and ``decode_audio`` a real
RIFF/WAVE PCM parser (true sample-rate/channels/duration/RMS); richer
codecs (JPEG/PNG, MP3/FLAC, video) would need libraries this container
doesn't ship, so those paths degrade to ``decode_ok=false`` rows /
``NotImplementedError`` and a deterministic fake extractor keeps the
full pipeline exercisable for arbitrary payloads.

Scale posture: ``mapInPandas`` streams Arrow batches per partition —
memory is bounded by batch size, not partition size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), which is what makes
binary-payload pipelines survivable at 100 TB. Metadata-only queries
never touch payload bytes (column pruning drops the binary column at
the parquet scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = ("doc_id long, media_type string, payload binary, "
                  "n_bytes long")
FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "payload_md5 string, fake_feature double")


def attach_payload(documents: DataFrame,
                   media_type: str = "image/fake") -> DataFrame:
    """Build the canonical multimodal frame: binary payload + typed
    metadata. Here the payload is the utf-8 text bytes (deterministic
    stand-in for real media blobs)."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"))


def decode_image(payload: bytes) -> dict:
    """Real, dependency-free image decode for three public formats:

    * binary PPM/PGM (netpbm ``P6``/``P5``: ASCII header with optional
      ``#`` comments, then a raw RGB/gray raster),
    * uncompressed BMP (``BM`` + BITMAPINFOHEADER, 24/32 bpp,
      bottom-up or top-down, BGR(A) rows padded to 4 bytes —
      normalized to RGB here), and
    * PNG, 8-bit grayscale/truecolor non-interlaced (RFC 2083): chunk
      walk with CRC verification, stdlib-zlib IDAT inflate, and full
      None/Sub/Up/Average/Paeth scanline unfiltering — a genuinely
      COMPRESSED format decoded end-to-end with no codec library, and
    * baseline sequential JPEG (ITU T.81 SOF0, r9): huffman entropy
      decode, dequant, exact IDCT, chroma upsample, YCbCr→RGB — the
      dominant scraped-corpus image format (:func:`_decode_jpeg`).

    Returns ``{"width", "height", "channels", "pixels"}`` with pixels
    as a row-major RGB/gray byte string. Any other byte stream raises
    ``NotImplementedError`` — formats that genuinely need codec
    libraries this container doesn't ship (WebP/AVIF/progressive
    JPEG/…) stay undecodable, and callers are expected to catch and
    mark the row rather than fail the task.
    """
    if len(payload) >= 2 and payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if len(payload) >= 2 and payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == PNG_SIGNATURE:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    raise NotImplementedError(
        "only binary PPM/PGM, uncompressed BMP, 8-bit gray/RGB PNG, "
        "and baseline sequential JPEG are decodable without external "
        "image libraries; mark other payloads undecodable")


def _decode_pnm(payload: bytes) -> dict:
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    # header: magic, then 3 ASCII ints (width, height, maxval) separated
    # by whitespace, with '#' comments allowed; then ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError(f"non-positive PNM dimensions {width}x{height}")
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM/PGM supported")
    n = width * height * channels
    pixels = payload[pos:pos + n]
    if len(pixels) != n:
        raise ValueError(f"truncated raster: {len(pixels)}/{n} bytes")
    return {"width": width, "height": height, "channels": channels,
            "pixels": pixels}


def _decode_bmp(payload: bytes) -> dict:
    import struct
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, raw_h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError("only uncompressed 24/32-bpp BMP")
    if width <= 0 or raw_h == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{raw_h}")
    height, bottom_up = abs(raw_h), raw_h > 0
    src_ch = bpp // 8
    row_size = ((bpp * width + 31) // 32) * 4
    out = bytearray()
    for y in range(height):
        src_y = height - 1 - y if bottom_up else y
        row = payload[data_off + src_y * row_size:
                      data_off + src_y * row_size + width * src_ch]
        if len(row) != width * src_ch:
            raise ValueError("truncated BMP raster")
        for x in range(width):
            b, g, r = row[x * src_ch], row[x * src_ch + 1], row[x * src_ch + 2]
            out += bytes((r, g, b))
    return {"width": width, "height": height, "channels": 3,
            "pixels": bytes(out)}


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary P6 PPM encoder (row-major RGB raster) — the fixture/sink
    twin of :func:`decode_image`."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: channel count → IHDR color type (RFC 2083 §4.1.1): gray,
#: gray+alpha, truecolor, truecolor+alpha. Palette (type 3) is a
#: separate encoder entry point (it carries a PLTE chunk).
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}
_PNG_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4}


def _png_filter_raster(width: int, height: int, pixels: bytes,
                       bpp: int) -> bytes:
    """Forward-filter a raster for IDAT, scanline filter ``y % 5`` —
    deliberately cycling None/Sub/Up/Average/Paeth so round-trip tests
    exercise every unfilter branch of :func:`_decode_png`."""
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            x = row[i]
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                raw.append(x)
            elif ftype == 1:
                raw.append((x - a) & 0xFF)
            elif ftype == 2:
                raw.append((x - b) & 0xFF)
            elif ftype == 3:
                raw.append((x - (a + b) // 2) & 0xFF)
            else:
                raw.append((x - _paeth(a, b, c)) & 0xFF)
        prev = row
    return bytes(raw)


def encode_png(width: int, height: int, pixels: bytes,
               channels: int = 3) -> bytes:
    """Minimal-but-real PNG encoder (8-bit, non-interlaced; gray,
    gray+alpha, RGB, or RGBA by ``channels``). IDAT is stdlib zlib."""
    import struct
    import zlib
    if channels not in _PNG_COLOR_TYPE:
        raise ValueError("channels must be 1/2/3/4 "
                         "(gray/gray+alpha/RGB/RGBA)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    raw = _png_filter_raster(width, height, pixels, channels)
    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       _PNG_COLOR_TYPE[channels], 0, 0, 0)
    return (PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def encode_png_palette(width: int, height: int, indices: bytes,
                       palette: bytes) -> bytes:
    """Indexed-color PNG (color type 3): one palette index per pixel,
    PLTE carries the RGB triples. Filtering operates on the index
    bytes (bpp = 1), exactly what :func:`_decode_png` unfilters before
    palette expansion."""
    import struct
    import zlib
    if len(indices) != width * height:
        raise ValueError("index buffer size mismatch")
    if not palette or len(palette) % 3 or len(palette) > 256 * 3:
        raise ValueError("palette must be 1..256 RGB triples")
    if max(indices) * 3 >= len(palette):
        raise ValueError("palette index out of range")
    raw = _png_filter_raster(width, height, indices, 1)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", palette)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, height: int, stride: int,
                  bpp: int) -> bytes:
    """Reverse the adaptive scanline filters (RFC 2083 §6) with numpy
    per scanline: None/Up are whole-row uint8 adds (wraparound IS mod
    256), Sub is a per-lane cumulative sum (rec[i] = Σ line mod 256 —
    the recurrence is linear, so one cumsum per row replaces the byte
    loop). Average/Paeth are non-linear in the running value, so a
    per-byte chain remains; r7 trimmed its constant factor — Paeth
    hoists |b−c| (vectorized) and shares the running (a−c) term
    between the other two distances, dropping the per-byte
    ``_paeth()`` call (~1.12x end-to-end, inner loop ~1.3x), and
    consecutive Average/Paeth rows carry the prev row as a list (no
    per-row tolist). Exhaustively measured alternatives — split-mean
    hoisting, per-lane registers, frompyfunc.accumulate, per-pixel
    numpy slices — all benched equal-or-slower on encoder-realistic
    rasters (median of 3, tools/png_filter_bench.py): CPython
    list/ufunc overhead exceeds the saved arithmetic, so a real
    further step needs a C-level kernel this container doesn't ship.
    Scale note: these loops bound per-IMAGE latency only — corpus
    decode throughput parallelizes across images via mapInPandas."""
    import numpy as np
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if height and int(ftypes.max()) > 4:
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"PNG filter type {bad} invalid")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    # list twin of `prev`, carried across CONSECUTIVE sequential rows
    # (real encoders emit Paeth/Average runs) so chained rows skip the
    # per-row tolist conversion; invalidated by every vector branch
    prev_l: list | None = [0] * stride
    npix = stride // bpp
    for y in range(height):
        f = int(ftypes[y])
        line = arr[y, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 2:
            rec = line + prev  # uint8 wraparound == mod 256
        elif f == 1:
            rec = (np.cumsum(line.reshape(npix, bpp), axis=0,
                             dtype=np.uint32)
                   .astype(np.uint8).reshape(stride))
        elif f == 3:
            # Average: rec[i] = line[i] + (a + prev[i])//2 with
            # a = rec[i-bpp] — a true sequential chain (the floor-mean
            # is non-linear in the running value). This indexed loop
            # IS the fastest CPython form measured: split-mean
            # hoisting, zip-carried operands, per-lane registers and
            # frompyfunc.accumulate all benched equal-or-slower
            # (median of 3, tools/png_filter_bench.py) — conversion
            # overhead eats the saved arithmetic. The kept r7 gain is
            # the carried prev LIST: consecutive Average/Paeth rows
            # skip the per-row tolist.
            if prev_l is None:
                prev_l = prev.tolist()
            ln = line.tolist()
            rec_l = [0] * stride
            for i in range(stride):
                a = rec_l[i - bpp] if i >= bpp else 0
                rec_l[i] = (ln[i] + (a + prev_l[i]) // 2) & 0xFF
            rec = np.asarray(rec_l, dtype=np.uint8)
        else:  # 4 (Paeth): the predictor branch is genuinely
            # sequential, but two of its three distances involve only
            # prev-row values: with p = a+b-c, pa = |p-a| = |b-c|
            # vectorizes entirely, and pc = |p-c| = (a-c)+(b-c)
            # shares the running (a-c) term with pb = |a-c| — the
            # per-byte work drops to one subtraction, two |x|, the
            # three-way pick and one add, with no _paeth() call and
            # zip-carried operands; measured ~1.12x end-to-end over
            # the r6 per-byte call loop (median of 3,
            # tools/png_filter_bench.py — the inner loop alone
            # measures ~1.3x; per-row numpy setup absorbs part of it)
            if prev_l is None:
                prev_l = prev.tolist()
            pv16 = prev.astype(np.int16)
            c16 = (np.concatenate([np.zeros(bpp, dtype=np.int16),
                                   pv16[:-bpp]])
                   if stride > bpp else np.zeros_like(pv16))
            d = pv16 - c16
            rec_l = [0] * stride
            i = 0
            for ln_i, b_i, c_i, d_i, pa_i in zip(
                    line.tolist(), prev_l, c16.tolist(),
                    d.tolist(), np.abs(d).tolist()):
                a = rec_l[i - bpp] if i >= bpp else 0
                e = a - c_i
                pb_ = e if e >= 0 else -e
                pc_t = e + d_i
                pc_ = pc_t if pc_t >= 0 else -pc_t
                if pa_i <= pb_ and pa_i <= pc_:
                    pred = a
                elif pb_ <= pc_:
                    pred = b_i
                else:
                    pred = c_i
                rec_l[i] = (ln_i + pred) & 0xFF
                i += 1
            rec = np.asarray(rec_l, dtype=np.uint8)
        out[y] = rec
        prev = rec
        prev_l = rec_l if f >= 3 else None
    return out.tobytes()


def _decode_png(payload: bytes) -> dict:
    """8-bit non-interlaced PNG decode (RFC 2083): verify chunk CRCs,
    inflate the IDAT stream, unfilter every scanline (numpy —
    :func:`_png_unfilter`), expand indexed color through PLTE. Color
    types 0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA) are
    supported; palette images decode to ``channels=3`` RGB, alpha
    types keep the alpha as a trailing channel. Ancillary chunks
    (tRNS included) are CRC-checked and skipped. Unsupported bit
    depths / interlacing raise ``NotImplementedError`` (real
    unsupported-codec guards, same contract as the BMP/PNM branches);
    structural damage (bad CRC, truncation, size mismatch, missing or
    short PLTE) raises ``ValueError``."""
    import struct
    import zlib
    pos = len(PNG_SIGNATURE)
    ihdr = None
    idat = bytearray()
    plte = None
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        length, = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk body")
        crc, = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if len(data) != 13:  # struct.error must not escape the
                raise ValueError(   # ValueError/NotImplemented contract
                    f"PNG IHDR length {len(data)} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if not data or len(data) % 3 or len(data) > 256 * 3:
                raise ValueError("PNG PLTE must be 1..256 RGB triples")
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None or not seen_end:
        raise ValueError("PNG missing IHDR/IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            "only 8-bit PNG color types 0/2/3/4/6")
    if comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            "only deflate/adaptive-filter/non-interlaced PNG")
    bpp = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # corrupt/absent deflate stream is structural damage — map it
        # into the documented ValueError contract so image_features
        # marks the row decode_ok=false instead of failing the stage
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG raster size mismatch")
    pixels = _png_unfilter(raw, height, stride, bpp)
    if color_type == 3:
        import numpy as np
        if plte is None:
            raise ValueError("PNG color type 3 requires a PLTE chunk")
        idx = np.frombuffer(pixels, dtype=np.uint8)
        if len(idx) and int(idx.max()) * 3 >= len(plte):
            raise ValueError("PNG palette index out of range")
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return {"width": width, "height": height, "channels": 3,
                "pixels": table[idx].tobytes()}
    channels = _PNG_CHANNELS[color_type]
    return {"width": width, "height": height, "channels": channels,
            "pixels": pixels}


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 / ISO 10918-1, public spec): SOF0 huffman
# entropy decode + dequant + IDCT + YCbCr->RGB, all numpy/stdlib — the
# dominant scraped-corpus image format, decoded end-to-end with no
# codec library. Encoder twin below synthesizes deterministic fixtures
# (same discipline as encode_png: the symbolic oracle predicts the
# decoded raster exactly — see attach_jpeg_payload).

#: zigzag scan order (T.81 Figure 5): _JPEG_ZIGZAG[k] = raster index
#: of the k-th zigzagged coefficient.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

#: T.81 Annex K.1 luminance quantization table (zigzag order here is
#: NOT used — this is raster order; Q[0]=16 makes the DC roundtrip
#: land on even integers, which the symbolic fixture oracle exploits).
_JPEG_STD_QT = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

#: T.81 Annex K.3 typical huffman tables (luminance DC / AC): BITS
#: (count of codes per length 1..16) then HUFFVAL.
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)


_JPEG_ZERO_AC = [0] * 63


def _jpeg_canonical_codes(bits, vals) -> dict:
    """symbol -> (code, length) from a DHT (BITS, HUFFVAL) pair —
    canonical assignment per T.81 Annex C."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("JPEG over-full huffman table")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: flat huffman lookup cache keyed by the (BITS, HUFFVAL) content —
#: one 65536-entry table per distinct DHT, so the per-image decode
#: cost is one peek + one list index per symbol. BOUNDED: spec-table
#: (Annex K) encoders share a handful of entries, but optimize_coding
#: encoders (mozjpeg, libjpeg -optimize — most web pipelines) emit
#: PER-IMAGE tables, and an unbounded dict on a long-lived executor
#: would grow ~0.5 MB per unique table until OOM. FIFO eviction at 64
#: keeps the spec-table hot path cached and the worst case ~32 MB.
_JPEG_TREE_CACHE: dict = {}
_JPEG_TREE_CACHE_MAX = 64


def _jpeg_decode_tree(bits, vals) -> list:
    """Flat 16-bit-prefix lookup: table[peek16] = (symbol, length),
    None where no code matches (invalid stream)."""
    key = (tuple(bits), tuple(vals))
    hit = _JPEG_TREE_CACHE.get(key)
    if hit is not None:
        return hit
    table: list = [None] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            n = 1 << (16 - length)
            if start + n > 65536:
                # Over-full canonical spec (a consistent BITS/HUFFVAL
                # pair can still exceed 2^length codes); slice-assign
                # past the end would APPEND, amplifying a 64 KiB table
                # to ~8M entries per malformed DHT.
                raise ValueError("JPEG over-full huffman table")
            table[start:start + n] = [(vals[k], length)] * n
            code += 1
            k += 1
        code <<= 1
    if len(_JPEG_TREE_CACHE) >= _JPEG_TREE_CACHE_MAX:
        _JPEG_TREE_CACHE.pop(next(iter(_JPEG_TREE_CACHE)))
    _JPEG_TREE_CACHE[key] = table
    return table


def _dct_basis():
    """Orthonormal 8x8 DCT-II matrix M (M[u,x]): F = M f M^T,
    f = M^T F M."""
    import numpy as np
    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / (2.0 * np.sqrt(2.0))) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


def _rgb_to_ycbcr_planes(px, width: int, height: int):
    """JFIF forward color transform, float64, one fixed expression
    order per component — the symbolic oracle replays these exact
    IEEE ops (term order matters; do not refactor)."""
    import numpy as np
    a = np.frombuffer(px, dtype=np.uint8).reshape(height, width, 3) \
        .astype(np.float64)
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [y, cb, cr]


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def _pad_align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # 1-pad
            byte = self.acc & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n = 0

    def restart(self, i: int) -> None:
        """Byte-align and emit RSTn (raw marker — never stuffed)."""
        self._pad_align()
        self.buf += bytes((0xFF, 0xD0 + (i % 8)))

    def flush(self) -> bytes:
        self._pad_align()
        return bytes(self.buf)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient
    (T.81 F.1.2.1.1): negatives encode as v - 1 in category bits."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(width: int, height: int, pixels: bytes,
                channels: int = 3, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder — the fixture/test twin of
    :func:`_decode_jpeg` (same role as :func:`encode_png` for PNG).
    Grayscale (1 channel) or YCbCr (3 channels, ``"444"`` or
    ``"420"`` chroma subsampling); one quantization table
    (:data:`_JPEG_STD_QT`) and the Annex-K luminance huffman pair for
    every component. Quantized DC comes from the block MEAN
    (mathematically the DCT's F(0,0)/8 — floor(8*(mean-128)/Q00+0.5)
    in one fixed order) so constant blocks quantize with NO float
    noise; ACs quantize from the exact orthonormal DCT."""
    import numpy as np
    if channels == 3:
        planes = _rgb_to_ycbcr_planes(pixels, width, height)
        samp = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" \
            else [(1, 1), (1, 1), (1, 1)]
    elif channels == 1:
        planes = [np.frombuffer(pixels, dtype=np.uint8)
                  .reshape(height, width).astype(np.float64)]
        samp = [(1, 1)]
    else:
        raise ValueError("encode_jpeg: 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("encode_jpeg: subsampling 444 or 420")
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    # chroma downsample (box mean over the 2x2 cell — exact for the
    # constant-block fixtures) after padding the full-res plane to an
    # even multiple of the MCU span via edge replication
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    comp_blocks = []
    for ci, (sh, sv) in enumerate(samp):
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        plane = planes[ci]
        # downsample first (on true data), then pad to (ph, pw)
        if (sh, sv) != (hmax, vmax):
            fx, fy = hmax // sh, vmax // sv
            th, tw = plane.shape[0] // fy * fy, plane.shape[1] // fx * fx
            core = plane[:th, :tw].reshape(th // fy, fy, tw // fx, fx) \
                .mean(axis=(1, 3))
            # ragged edges: replicate the last full-cell row/col
            need_h, need_w = -(-height // fy), -(-width // fx)
            plane = np.pad(core, ((0, need_h - core.shape[0]),
                                  (0, need_w - core.shape[1])),
                           mode="edge")
        plane = np.pad(plane,
                       ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                       mode="edge")
        comp_blocks.append(plane)
    m = _dct_basis()
    qt = np.array(_JPEG_STD_QT, dtype=np.float64).reshape(8, 8)
    zz_np = np.array(_JPEG_ZIGZAG, dtype=np.int64)
    w = _JpegBitWriter()
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    pred = [0] * len(samp)
    n_mcu, n_rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                w.restart(n_rst)
                n_rst += 1
                pred = [0] * len(samp)
            n_mcu += 1
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = comp_blocks[ci][y0:y0 + 8, x0:x0 + 8]
                        mean = float(block.sum()) / 64.0
                        dcq = int(np.floor(8.0 * (mean - 128.0) / 16.0
                                           + 0.5))
                        if block.min() == block.max():
                            # constant block: every AC is exactly 0 —
                            # skip the DCT (correct for ANY encoder,
                            # and the fixture generator's hot path)
                            zz = _JPEG_ZERO_AC
                        else:
                            coef = m @ (block - 128.0) @ m.T
                            acq = np.floor(coef / qt + 0.5) \
                                .astype(np.int64)
                            zz = acq.flat[zz_np][1:].tolist()
                        diff = dcq - pred[ci]
                        pred[ci] = dcq
                        s, bitsv = _jpeg_magnitude(diff)
                        code, ln = dc_codes[s]
                        w.put(code, ln)
                        if s:
                            w.put(bitsv, s)
                        run = 0
                        last_nz = max((k for k, v in enumerate(zz) if v),
                                      default=-1)
                        for k in range(last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                if run == 16:
                                    code, ln = ac_codes[0xF0]  # ZRL
                                    w.put(code, ln)
                                    run = 0
                                continue
                            s, bitsv = _jpeg_magnitude(zz[k])
                            code, ln = ac_codes[(run << 4) | s]
                            w.put(code, ln)
                            w.put(bitsv, s)
                            run = 0
                        if last_nz < 62:
                            code, ln = ac_codes[0x00]      # EOB
                            w.put(code, ln)
    scan = w.flush()
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body
    qt_body = b"\x00" + bytes(
        _JPEG_STD_QT[_JPEG_ZIGZAG[k]] for k in range(64))
    sof_body = struct.pack(">BHHB", 8, height, width, len(samp))
    for ci, (sh, sv) in enumerate(samp):
        sof_body += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0)
    dht_body = (b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
                + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos_body = bytes([len(samp)])
    for ci in range(len(samp)):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += b"\x00\x3f\x00"
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xff\xd8" + seg(0xFFDB, qt_body) + dri
            + seg(0xFFC0, sof_body)
            + seg(0xFFC4, dht_body) + seg(0xFFDA, sos_body)
            + scan + b"\xff\xd9")


def _jpeg_scan_segments(data: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded scan into restart segments: unstuff
    0xFF00, cut at RSTn markers, stop at any other marker (EOI/next
    segment). Returns ≥1 byte strings; stray non-RST markers simply
    terminate the scan (whether that truncates a block is decided by
    the bit reader when a code overruns its segment)."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else None
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs


class _JpegBitReader:
    """MSB-first bit reader over one unstuffed restart segment with a
    fast 16-bit peek (int.from_bytes over a 1-padded tail). Consuming
    more than 7 bits past the real data — beyond the legal flush
    padding — raises the truncation error."""

    def __init__(self, segments: list[bytes]):
        self.segments = segments
        self.seg_i = 0
        self._load(segments[0])

    def _load(self, seg: bytes) -> None:
        # Virtual 1-padding: peek16 reads a 4-byte window, and on
        # corrupt streams pos can sit entirely inside the padding
        # (within the 7-bit overrun allowance) — 3 bytes would yield a
        # short slice whose int.from_bytes breaks the all-ones
        # contract, so pad a full window.
        self.buf = seg + b"\xff\xff\xff\xff"
        self.total = len(seg) * 8
        self.pos = 0

    def peek16(self) -> int:
        i, sh = self.pos >> 3, self.pos & 7
        w = int.from_bytes(self.buf[i:i + 4], "big")
        return (w >> (16 - sh)) & 0xFFFF

    def consume(self, k: int) -> None:
        self.pos += k
        if self.pos > self.total + 7:
            raise ValueError("JPEG entropy stream truncated")

    def bits(self, k: int) -> int:
        v = self.peek16() >> (16 - k) if k else 0
        self.consume(k)
        return v

    def align_restart(self) -> None:
        """Advance to the next restart segment (the marker was already
        consumed by the scan splitter); DC predictors reset caller-side."""
        self.seg_i += 1
        if self.seg_i >= len(self.segments):
            raise ValueError("JPEG expected restart marker")
        self._load(self.segments[self.seg_i])


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_jpeg(payload: bytes) -> dict:
    """Baseline sequential JPEG decode (SOF0, T.81): marker walk,
    8-bit quantization tables, canonical huffman tables from DHT,
    interleaved MCU entropy decode with restart-interval support,
    dequantize + exact orthonormal IDCT per block, chroma upsample
    (sampling factors 1-2), and the JFIF YCbCr->RGB transform with
    floor(x+0.5) rounding. Grayscale (1 component) returns
    channels=1; 3 components return RGB. Progressive (SOF2),
    arithmetic coding, 12-bit precision, hierarchical, and >2
    sampling factors raise ``NotImplementedError`` (unsupported-codec
    gates); structural damage (truncation, bad lengths, undefined
    tables, stray markers in entropy data) raises ``ValueError`` —
    callers mark the row ``decode_ok=false``."""
    import struct

    import numpy as np
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    scan_comps = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG expected marker, got 0x%02X"
                             % payload[pos])
        marker = payload[pos + 1] if pos + 1 < len(payload) else None
        if marker is None:
            raise ValueError("truncated JPEG marker")
        pos += 2
        if marker == 0xD9:                      # EOI before SOS
            raise ValueError("JPEG has no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                            # parameterless
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment length")
        seglen, = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("JPEG segment overruns payload")
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                      # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG qtable")
                if b + 65 > len(body):
                    raise ValueError("truncated DQT")
                zz = body[b + 1:b + 65]
                tab = [0] * 64
                for k in range(64):
                    tab[_JPEG_ZIGZAG[k]] = zz[k]
                qtabs[tq] = tab
                b += 65
        elif marker == 0xC4:                    # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = tuple(body[b + 1:b + 17])
                n = sum(bits)
                vals = tuple(body[b + 17:b + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT")
                htabs[(tc, th)] = _jpeg_decode_tree(bits, vals)
                b += 17 + n
        elif marker == 0xC0:                    # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0")
            prec, h, w0, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component specs")
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            if nc not in (1, 3):
                raise NotImplementedError(
                    "only 1- or 3-component JPEG")
            if w0 <= 0 or h <= 0:
                raise ValueError("invalid JPEG dimensions")
            comps = []
            for ci in range(nc):
                cid, sampv, tq = struct.unpack_from(
                    ">BBB", body, 6 + 3 * ci)
                sh, sv = sampv >> 4, sampv & 0x0F
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    raise NotImplementedError(
                        "JPEG sampling factors beyond 2")
                comps.append({"id": cid, "sh": sh, "sv": sv, "tq": tq})
            sof = (w0, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0)")
        elif marker == 0xDD:                    # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            restart, = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            if not body:
                raise ValueError("truncated SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS component specs")
            scan_comps = []
            for si in range(ns):
                cs, tds = body[1 + 2 * si], body[2 + 2 * si]
                scan_comps.append((cs, tds >> 4, tds & 0x0F))
            scan_start = pos
            break
        # APPn / COM / others: skipped (lengths already validated)
    else:
        raise ValueError("JPEG missing SOS")
    w0, h, comps = sof
    if scan_comps is None or len(scan_comps) != len(comps):
        raise ValueError("JPEG scan/frame component mismatch")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_comps:
        if cs not in by_id:
            raise ValueError("JPEG scan names unknown component")
        c = by_id[cs]
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError("JPEG scan uses undefined huffman table")
        if c["tq"] not in qtabs:
            raise ValueError("JPEG component uses undefined qtable")
        order.append((c, htabs[(0, td)], htabs[(1, ta)],
                      np.array(qtabs[c["tq"]], dtype=np.float64)
                      .reshape(8, 8)))
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    m = _dct_basis()
    planes = [np.zeros((mcuy * 8 * c["sv"], mcux * 8 * c["sh"]),
                       dtype=np.float64) for c, _, _, _ in order]
    rd = _JpegBitReader(_jpeg_scan_segments(payload, scan_start))
    zz_scatter = np.array(_JPEG_ZIGZAG, dtype=np.int64)

    def read_huff(table: list) -> int:
        ent = table[rd.peek16()]
        if ent is None:
            raise ValueError("invalid JPEG huffman code")
        rd.consume(ent[1])
        return ent[0]

    pred = [0] * len(order)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                rd.align_restart()
                pred = [0] * len(order)
            n_mcu += 1
            for ci, (c, dct_t, act_t, qt) in enumerate(order):
                for by in range(c["sv"]):
                    for bx in range(c["sh"]):
                        s = read_huff(dct_t)
                        diff = _jpeg_extend(rd.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz = np.zeros(64, dtype=np.float64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = read_huff(act_t)
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC index overruns block")
                            zz[k] = _jpeg_extend(rd.bits(sz), sz)
                            k += 1
                        coef = np.empty(64, dtype=np.float64)
                        coef[zz_scatter] = zz
                        coef = coef.reshape(8, 8) * qt
                        block = m.T @ coef @ m
                        out = np.clip(np.floor(block + 128.0 + 0.5),
                                      0.0, 255.0)
                        y0 = (my * c["sv"] + by) * 8
                        x0 = (mx * c["sh"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = out
    full = []
    for ci, (c, _, _, _) in enumerate(order):
        p = planes[ci]
        if c["sh"] != hmax or c["sv"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["sv"], axis=0),
                          hmax // c["sh"], axis=1)
        full.append(p[:h, :w0])
    if len(full) == 1:
        return {"width": w0, "height": h, "channels": 1,
                "pixels": full[0].astype(np.uint8).tobytes()}
    y, cb, cr = full
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0.0, 255.0)
    g = np.clip(np.floor(y - 0.344136 * (cb - 128.0)
                         - 0.714136 * (cr - 128.0) + 0.5), 0.0, 255.0)
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0.0, 255.0)
    rgb = np.stack([r, g, b], axis=2).astype(np.uint8)
    return {"width": w0, "height": h, "channels": 3,
            "pixels": rgb.tobytes()}


# Deterministic generative image: dims and pixel values are pure
# functions of doc_id, so an oracle can predict width/height/mean
# independently (and tests can recompute pixels exactly).
def _gen_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 9, 6 + doc_id % 7


def _gen_pixels(doc_id: int, width: int, height: int) -> bytes:
    return bytes(
        (x * 7 + y * 13 + ch * 31 + doc_id) % 256
        for y in range(height) for x in range(width) for ch in range(3))


def attach_image_payload(documents: DataFrame) -> DataFrame:
    """Real-image fixture frame: one deterministic P6 PPM per document,
    generated executor-side (Arrow-batched, no driver involvement) —
    the stand-in for reading real image blobs off object storage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = _gen_dims(int(doc_id))
                payloads.append(encode_ppm(w, h, _gen_pixels(int(doc_id), w, h)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "image/x-portable-pixmap",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    # deliberately NO parallelize_for_compute — measured slower for
    # this cheap codec (see attach_audio_payload note)
    return documents.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


def _gen_block_pixels(doc_id: int, width: int, height: int) -> bytes:
    """Constant-8×8-block RGB raster: every pixel's color depends only
    on (doc_id, x//8, y//8). Constant blocks make the lossy JPEG
    roundtrip EXACTLY predictable (only the DC coefficient is nonzero,
    and the DC quantizes from the block mean with no float noise), so
    a symbolic SQL oracle can replay decode output bit-for-bit."""
    out = bytearray()
    for y in range(height):
        by = y // 8
        for x in range(width):
            bx = x // 8
            out += bytes(((doc_id * 3 + bx * 7 + by * 11) % 256,
                          (doc_id * 5 + bx * 13 + by * 3) % 256,
                          (doc_id * 7 + bx * 5 + by * 17) % 256))
    return bytes(out)


def attach_jpeg_payload(documents: DataFrame) -> DataFrame:
    """Baseline-JPEG fixture frame: deterministic constant-block color
    images (:func:`_gen_block_pixels`) compressed through the real
    encoder (:func:`encode_jpeg` — forward DCT, quantization, huffman
    entropy coding), generated executor-side. A feature query over
    these payloads drives the FULL decode path — marker walk, huffman,
    dequant, IDCT, YCbCr→RGB — and the symbolic oracle predicts the
    decoded raster exactly (DC-only blocks: plane = clip(2·floor(
    (c−128)/2 + 0.5) + 128) per component, then the rounded color
    transform)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = _gen_dims(int(doc_id))
                payloads.append(encode_jpeg(
                    w, h, _gen_block_pixels(int(doc_id), w, h)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "image/jpeg",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    # DCT + huffman is ~0.4 ms/doc — orders costlier than the PPM/PNG
    # fixtures — so guarantee the codec stage at least cluster
    # parallelism (no-op at real split counts; see tables.py)
    from s3_elasticsearch_data_pipeline_spark.tables import (
        parallelize_for_compute)
    return (parallelize_for_compute(documents.select("doc_id"))
            .mapInPandas(run, PAYLOAD_SCHEMA))


def attach_jpeg420_payload(documents: DataFrame) -> DataFrame:
    """4:2:0-subsampled JPEG fixture frame: ONE deterministic color
    per document (``(doc_id*3, doc_id*5, doc_id*7) % 256``), encoded
    with ``subsampling="420"`` — a whole-image-constant raster keeps
    every Y block AND every box-downsampled chroma block constant, so
    even the subsampled lossy roundtrip (interleaved 4-Y MCUs, chroma
    box mean, upsample) is exactly the DC closed form. A feature
    query over these drives the decoder's MCU-interleave + upsample
    path under the same bit-exact oracle discipline as
    :func:`attach_jpeg_payload`'s 4:4:4 fixtures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = _gen_dims(did)
                px = bytes(((did * 3) % 256, (did * 5) % 256,
                            (did * 7) % 256)) * (w * h)
                payloads.append(encode_jpeg(w, h, px,
                                            subsampling="420"))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "image/jpeg",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    from s3_elasticsearch_data_pipeline_spark.tables import (
        parallelize_for_compute)
    return (parallelize_for_compute(documents.select("doc_id"))
            .mapInPandas(run, PAYLOAD_SCHEMA))


def attach_png_payload(documents: DataFrame) -> DataFrame:
    """PNG fixture frame: the SAME deterministic generative pixels as
    :func:`attach_image_payload`, but compressed through the real PNG
    encoder (zlib IDAT, per-row filter cycling through all five types)
    — so a feature query over these payloads proves the full
    inflate + unfilter path reproduces the exact raster the symbolic
    oracle predicts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = _gen_dims(int(doc_id))
                payloads.append(
                    encode_png(w, h, _gen_pixels(int(doc_id), w, h)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "image/png",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    # zlib deflate + per-row filter search is real per-row compute —
    # same single-task-scan guard as the JPEG attachers
    from s3_elasticsearch_data_pipeline_spark.tables import (
        parallelize_for_compute)
    return (parallelize_for_compute(documents.select("doc_id"))
            .mapInPandas(run, PAYLOAD_SCHEMA))


IMAGE_FEATURE_SCHEMA = ("doc_id long, decode_ok boolean, width int, "
                        "height int, channels int, n_pixels long, "
                        "mean_intensity double")


def image_features(payloads: DataFrame) -> DataFrame:
    """TRUE image features via :func:`decode_image` — width/height/
    channels/mean-intensity computed from decoded pixel bytes inside an
    Arrow-batched ``mapInPandas``. Undecodable payloads yield a
    ``decode_ok=false`` row with null features instead of failing the
    task (the 100 TB posture: one corrupt blob must not kill a stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "decode_ok": [], "width": [],
                   "height": [], "channels": [], "n_pixels": [],
                   "mean_intensity": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_image(bytes(payload))
                except (NotImplementedError, ValueError):
                    out["decode_ok"].append(False)
                    for k in ("width", "height", "channels", "n_pixels",
                              "mean_intensity"):
                        out[k].append(None)
                    continue
                px = img["pixels"]
                out["decode_ok"].append(True)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["channels"].append(img["channels"])
                out["n_pixels"].append(img["width"] * img["height"])
                out["mean_intensity"].append(sum(px) / len(px) if px else None)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


RESIZE_REAL_SCHEMA = ("doc_id long, decode_ok boolean, width int, "
                      "height int, resized_md5 string")


def resize_images_real(payloads: DataFrame, width: int = 16,
                       height: int = 16) -> DataFrame:
    """Real nearest-neighbor resize over decoded pixels: decode →
    sample source pixel per target pixel → digest of the resized RGB
    raster. Same Arrow batch shape as the fake path; undecodable rows
    degrade to ``decode_ok=false`` instead of failing.

    ``resized_md5`` digests the LOWERCASE-HEX rendering of the raster
    (not the raw bytes): byte-for-byte equivalent pinning of the pixel
    content, but expressible in ANSI SQL (md5 over a hex string_agg),
    so the registry query carries a symbolic DuckDB oracle that
    recomputes every resized pixel from the generative formula."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "decode_ok": [], "width": [],
                   "height": [], "resized_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                try:
                    img = decode_image(bytes(payload))
                except (NotImplementedError, ValueError):
                    out["decode_ok"].append(False)
                    out["resized_md5"].append(None)
                    continue
                sw, sh, ch, px = (img["width"], img["height"],
                                  img["channels"], img["pixels"])
                resized = bytearray()
                for ty in range(height):
                    sy = min(ty * sh // height, sh - 1)
                    for tx in range(width):
                        sx = min(tx * sw // width, sw - 1)
                        base = (sy * sw + sx) * ch
                        resized += px[base:base + ch]
                out["decode_ok"].append(True)
                out["resized_md5"].append(
                    hashlib.md5(bytes(resized).hex().encode()).hexdigest())
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, RESIZE_REAL_SCHEMA)


def _fake_feature(payload: bytes) -> float:
    """Deterministic stand-in feature: first 4 bytes of md5 as a float
    in [0, 1) — reproducible across runs/engines."""
    digest = hashlib.md5(payload).digest()
    return int.from_bytes(digest[:4], "big") / 2**32


def extract_features(payloads: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, per-partition streaming — the pattern a real
    decode/resize/embed stage plugs into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            if not fake:
                payload.map(decode_image)  # raises NotImplementedError
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "payload_md5": payload.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "fake_feature": payload.map(
                    lambda b: _fake_feature(bytes(b))),
            })

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end: attach payload → Arrow-batched feature extraction.
    ``fake_feature`` is omitted from the output contract here so the
    result is oracle-checkable (md5/octet_length exist in ANSI SQL)."""
    return (extract_features(attach_payload(documents), fake=True)
            .select("doc_id", "media_type", "n_bytes", "payload_md5"))


RESIZE_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                 "resized_md5 string")
FRAME_SCHEMA = ("doc_id long, frame_index int, frame_md5 string, "
                "frame_offset_bytes long")


def decode_audio(payload: bytes) -> dict:
    """Real, dependency-free audio decode for RIFF/WAVE uncompressed
    PCM (the WAV container: ``RIFF`` + ``WAVE``, then word-aligned
    chunks; ``fmt `` declares format 1 = PCM with 8- or 16-bit
    samples, ``data`` carries the interleaved raster) — the audio twin
    of :func:`decode_image`, pure ``struct``.

    Returns ``{"sample_rate", "n_channels", "bits_per_sample",
    "n_samples", "samples"}`` where ``n_samples`` counts frames (one
    per channel set) and ``samples`` is the flat interleaved tuple of
    signed ints (8-bit WAV is unsigned on disk, normalized to signed
    here). Unknown chunks (LIST, cue, …) are skipped like any
    compliant reader. Any other byte stream raises
    ``NotImplementedError``; compressed/esoteric WAV raises too —
    callers catch and mark the row undecodable rather than fail the
    task.
    """
    import struct
    if payload[:4] == FLAC_SIGNATURE:  # r10: lossless compressed path
        return _decode_flac(payload)
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM and FLAC are decodable without "
            "external audio libraries; mark other payloads "
            "undecodable")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + csize]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if audio_fmt != 1 or bits not in (8, 16) or n_ch == 0:
                raise NotImplementedError(
                    "only uncompressed 8/16-bit PCM WAV")
            if rate == 0:
                raise ValueError("zero sample rate in fmt chunk")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            if len(body) != csize:
                raise ValueError(
                    f"truncated data chunk: {len(body)}/{csize} bytes")
            data = body
        pos += 8 + csize + (csize & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    frame_bytes = (bits // 8) * n_ch
    n_frames = len(data) // frame_bytes
    if bits == 16:
        samples = struct.unpack(
            f"<{n_frames * n_ch}h", data[:n_frames * n_ch * 2])
    else:
        samples = tuple(b - 128 for b in data[:n_frames * n_ch])
    return {"sample_rate": rate, "n_channels": n_ch,
            "bits_per_sample": bits, "n_samples": n_frames,
            "samples": samples}


def encode_wav(sample_rate: int, samples, n_channels: int = 1) -> bytes:
    """Minimal 16-bit PCM RIFF/WAVE encoder (interleaved int16
    samples) — the fixture/sink twin of :func:`decode_audio`."""
    import struct
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      n_channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# Deterministic generative audio: rate, length, and sample values are
# pure functions of doc_id, so an oracle can predict duration/RMS
# symbolically (and tests can recompute the PCM exactly).
def _gen_audio_params(doc_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples) for the fixture tone."""
    return 8000 * (1 + doc_id % 3), 200 + (doc_id % 37) * 10


def _gen_audio_samples(doc_id: int, n: int) -> list[int]:
    return [(i * 17 + doc_id * 31) % 4096 - 2048 for i in range(n)]


def attach_audio_payload(documents: DataFrame) -> DataFrame:
    """Real-audio fixture frame: one deterministic 16-bit PCM mono WAV
    per document, generated executor-side (Arrow-batched, no driver
    involvement) — the stand-in for reading real audio blobs off
    object storage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                rate, n = _gen_audio_params(int(doc_id))
                payloads.append(
                    encode_wav(rate, _gen_audio_samples(int(doc_id), n)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "audio/wav",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    # deliberately NO parallelize_for_compute: WAV synth+decode is
    # cheap per row — the round-robin exchange + per-task Python
    # worker fan-out measured SLOWER than the serial scan at sf0.1
    # (0.93 → 1.11 s; multimodal_curation 1.81 → 3.20 s), and at real
    # split counts the guard is a no-op anyway. FLAC (genuinely
    # expensive rice coding) keeps the guard.
    return documents.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


AUDIO_FEATURE_SCHEMA = ("doc_id long, decode_ok boolean, "
                        "sample_rate int, n_channels int, "
                        "bits_per_sample int, n_samples long, "
                        "duration_s double, rms double")


def audio_features(payloads: DataFrame) -> DataFrame:
    """TRUE audio features via :func:`decode_audio` — sample rate /
    channel count / frame count / duration / RMS amplitude computed
    from decoded PCM inside an Arrow-batched ``mapInPandas``.
    Undecodable payloads yield ``decode_ok=false`` rows with null
    features (one corrupt blob must not kill a stage).

    Numeric discipline: the sum of squared integer samples is exact in
    any order (integers < 2^53), so ``rms = sqrt(sum/n)`` is the same
    IEEE double on any engine/partitioning — oracle-reproducible
    without decimal machinery.
    """
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("sample_rate", "n_channels", "bits_per_sample",
                "n_samples", "duration_s", "rms")
        for pdf in batches:
            out = {"doc_id": [], "decode_ok": [],
                   **{c: [] for c in cols}}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    au = decode_audio(bytes(payload))
                except (NotImplementedError, ValueError):
                    out["decode_ok"].append(False)
                    for c in cols:
                        out[c].append(None)
                    continue
                s = au["samples"]
                out["decode_ok"].append(True)
                out["sample_rate"].append(au["sample_rate"])
                out["n_channels"].append(au["n_channels"])
                out["bits_per_sample"].append(au["bits_per_sample"])
                out["n_samples"].append(au["n_samples"])
                out["duration_s"].append(
                    au["n_samples"] / au["sample_rate"]
                    if au["sample_rate"] else None)
                out["rms"].append(
                    math.sqrt(sum(v * v for v in s) / len(s))
                    if s else None)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def resize_images(payloads: DataFrame, width: int = 64,
                  height: int = 64) -> DataFrame:
    """Resize stage plumbing: Arrow-batched mapInPandas with a
    deterministic fake resize (md5 over payload+dims stands in for the
    resized bitmap digest). A real implementation swaps the inner
    lambda for PIL/opencv — schema, batching, and partitioning are
    unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tag = f":{width}x{height}".encode()
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": width,
                "height": height,
                "resized_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b) + tag).hexdigest()),
            })

    return payloads.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit ``n_frames``
    evenly spaced 'frames' per payload (fan-out inside mapInPandas —
    one input row → n output rows, the shape a real decoder produces).
    Frame bytes are windows of the payload; digests are deterministic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_index": [], "frame_md5": [],
                   "frame_offset_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(data) - 1, 0))
                    window = data[off:off + step] or b"\x00"
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_md5"].append(hashlib.md5(window).hexdigest())
                    out["frame_offset_bytes"].append(off)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = ("doc_id long, chunk_index int, start_ms double, "
                      "end_ms double, n_chunk_bytes long, chunk_md5 string")


def chunk_audio(payloads: DataFrame, window_ms: float = 1.0,
                hop_ms: float = 0.5, sample_rate: int = 16_000,
                bytes_per_sample: int = 2) -> DataFrame:
    """Sliding-window audio chunking plumbing (the STFT/feature front
    end of a speech pipeline): each binary payload is treated as PCM at
    ``sample_rate``×``bytes_per_sample`` and fanned out into
    overlapping windows of ``window_ms`` every ``hop_ms``.

    Same fan-out shape as ``sample_frames`` (one row → many), same
    Arrow-batched memory bound; a real decoder replaces the byte-slice
    with decoded samples without touching schema or partitioning. The
    digests are deterministic so tests pin exact outputs.
    """
    bytes_per_ms = sample_rate * bytes_per_sample / 1000.0
    win = max(int(window_ms * bytes_per_ms), 1)
    hop = max(int(hop_ms * bytes_per_ms), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "chunk_index": [], "start_ms": [],
                   "end_ms": [], "n_chunk_bytes": [], "chunk_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_chunks = max((max(len(data) - win, 0) + hop - 1) // hop,
                               0) + 1
                for i in range(n_chunks):
                    off = i * hop
                    window = data[off:off + win]
                    if not window:
                        break
                    out["doc_id"].append(doc_id)
                    out["chunk_index"].append(i)
                    out["start_ms"].append(off / bytes_per_ms)
                    out["end_ms"].append((off + len(window)) / bytes_per_ms)
                    out["n_chunk_bytes"].append(len(window))
                    out["chunk_md5"].append(
                        hashlib.md5(window).hexdigest())
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, AUDIO_CHUNK_SCHEMA)

def decode_video(payload: bytes) -> dict:
    """Real, dependency-free video decode for YUV4MPEG2 ("y4m") — the
    classic uncompressed video container (ASCII stream header with
    W/H/F(rame-rate)/C(olourspace) tags, then ``FRAME\\n`` markers each
    followed by a raw planar YUV raster) — the video twin of
    :func:`decode_image` / :func:`decode_audio`.

    Supports the common planar layouts C420 (default; chroma quarter
    size), C422 (half), C444 (full), and Cmono (luma only). Returns
    ``{"width", "height", "fps_num", "fps_den", "n_frames", "frames"}``
    with ``frames`` a list of row-major LUMA planes (bytes) — chroma is
    parsed past but not returned (features here are luma statistics).
    Any other byte stream raises ``NotImplementedError``; a malformed
    or truncated y4m raises ``ValueError`` — callers catch both and
    mark the row undecodable rather than fail the task.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "only YUV4MPEG2 (y4m) video is decodable without external "
            "codec libraries; mark other payloads undecodable")
    nl = payload.find(b"\x0a")
    if nl < 0:
        raise ValueError("unterminated y4m stream header")
    width = height = None
    fps_num, fps_den, colour = 25, 1, "420"
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        c, val = chr(tag[0]), tag[1:].decode("ascii", "replace")
        if c == "W":
            width = int(val)
        elif c == "H":
            height = int(val)
        elif c == "F":
            fps_num, fps_den = (int(x) for x in val.split(":"))
        elif c == "C":
            colour = val
    if not width or not height or width < 0 or height < 0:
        raise ValueError("y4m header missing or non-positive W/H")
    base = colour.rstrip("p")[:4]
    if base.startswith("420"):
        chroma = 2 * ((width // 2) * (height // 2))
    elif base.startswith("422"):
        chroma = 2 * ((width // 2) * height)
    elif base.startswith("444"):
        chroma = 2 * (width * height)
    elif base.startswith("mono"):
        chroma = 0
    else:
        raise NotImplementedError(f"unsupported y4m colourspace {colour}")
    luma = width * height
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\x0a", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed y4m FRAME marker")
        start = fnl + 1
        if start + luma + chroma > len(payload):
            raise ValueError("truncated y4m frame raster")
        frames.append(payload[start:start + luma])
        pos = start + luma + chroma
    return {"width": width, "height": height, "fps_num": fps_num,
            "fps_den": fps_den, "n_frames": len(frames), "frames": frames}


def encode_y4m(width: int, height: int, frames_luma, fps=(25, 1)) -> bytes:
    """Minimal C420 y4m encoder (luma planes + deterministic mid-grey
    chroma) — the fixture/sink twin of :func:`decode_video`."""
    if width % 2 or height % 2:
        raise ValueError("C420 needs even dimensions")
    chroma = bytes([128]) * (2 * ((width // 2) * (height // 2)))
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\x0a"
           % (width, height, fps[0], fps[1])]
    for luma in frames_luma:
        if len(luma) != width * height:
            raise ValueError("luma plane size mismatch")
        out.append(b"FRAME\x0a" + luma + chroma)
    return b"".join(out)


# Deterministic generative video: dims, frame count, and luma values
# are pure functions of doc_id (same discipline as the image/audio
# fixtures), so an oracle predicts per-frame mean luma symbolically.
def _gen_video_params(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for the fixture clip."""
    return 4 + 2 * (doc_id % 3), 4 + 2 * (doc_id % 2), 2 + doc_id % 3


def _gen_video_luma(doc_id: int, width: int, height: int,
                    frame: int) -> bytes:
    return bytes((x * 5 + y * 11 + frame * 23 + doc_id) % 256
                 for y in range(height) for x in range(width))


def attach_video_payload(documents: DataFrame) -> DataFrame:
    """Real-video fixture frame: one deterministic y4m clip per
    document, generated executor-side (Arrow-batched) — the stand-in
    for reading real video blobs off object storage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h, n = _gen_video_params(int(doc_id))
                payloads.append(encode_y4m(
                    w, h, [_gen_video_luma(int(doc_id), w, h, f)
                           for f in range(n)]))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "video/x-yuv4mpeg",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    # deliberately NO parallelize_for_compute — measured slower for
    # this cheap codec (see attach_audio_payload note)
    return documents.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


VIDEO_FRAME_SCHEMA = ("doc_id long, decode_ok boolean, width int, "
                      "height int, n_frames int, fps double, "
                      "frame_index int, mean_luma double")


def video_frame_features(payloads: DataFrame) -> DataFrame:
    """TRUE per-frame video features via :func:`decode_video`: one
    output row per decoded frame (the 1→N fan-out a real frame sampler
    produces) with the frame's mean luma computed from the actual
    raster bytes. Undecodable payloads yield a single
    ``decode_ok=false`` row. Mean luma sums integer bytes — exact in
    any order, oracle-reproducible."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("width", "height", "n_frames", "fps", "frame_index",
                "mean_luma")
        for pdf in batches:
            out = {"doc_id": [], "decode_ok": [],
                   **{c: [] for c in cols}}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    vid = decode_video(bytes(payload))
                except (NotImplementedError, ValueError):
                    out["doc_id"].append(doc_id)
                    out["decode_ok"].append(False)
                    for c in cols:
                        out[c].append(None)
                    continue
                fps = (vid["fps_num"] / vid["fps_den"]
                       if vid["fps_den"] else None)
                if not vid["frames"]:
                    # a valid but frame-less clip must still be
                    # accounted for — every input doc yields ≥1 row
                    out["doc_id"].append(doc_id)
                    out["decode_ok"].append(True)
                    out["width"].append(vid["width"])
                    out["height"].append(vid["height"])
                    out["n_frames"].append(0)
                    out["fps"].append(fps)
                    out["frame_index"].append(None)
                    out["mean_luma"].append(None)
                    continue
                for i, luma in enumerate(vid["frames"]):
                    out["doc_id"].append(doc_id)
                    out["decode_ok"].append(True)
                    out["width"].append(vid["width"])
                    out["height"].append(vid["height"])
                    out["n_frames"].append(vid["n_frames"])
                    out["fps"].append(fps)
                    out["frame_index"].append(i)
                    out["mean_luma"].append(
                        sum(luma) / len(luma) if luma else None)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, VIDEO_FRAME_SCHEMA)

AUDIO_CHUNK_RMS_SCHEMA = ("doc_id long, decode_ok boolean, "
                          "chunk_index int, start_s double, "
                          "n_chunk_samples int, rms double")


def audio_chunk_rms(payloads: DataFrame, window_samples: int = 128,
                    hop_samples: int = 64) -> DataFrame:
    """Sliding-window features over REAL decoded audio: decode each WAV
    (:func:`decode_audio`), fan out overlapping windows of
    ``window_samples`` every ``hop_samples``, and emit each chunk's RMS
    computed from the actual PCM — the decoded-sample upgrade of the
    byte-window :func:`chunk_audio` plumbing (same 1→N Arrow fan-out
    shape, same degradation contract). Frames are interleaved-flat for
    multi-channel input; the fixture corpus is mono. Integer
    square-sums keep RMS exact in any order (oracle-reproducible)."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "decode_ok": [], "chunk_index": [],
                   "start_s": [], "n_chunk_samples": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    au = decode_audio(bytes(payload))
                except (NotImplementedError, ValueError):
                    out["doc_id"].append(doc_id)
                    out["decode_ok"].append(False)
                    for c in ("chunk_index", "start_s",
                              "n_chunk_samples", "rms"):
                        out[c].append(None)
                    continue
                s, rate = au["samples"], au["sample_rate"]
                n_ch = au["n_channels"]
                if not s:
                    # a valid but empty-data WAV must still be
                    # accounted for — every input doc yields ≥1 row
                    out["doc_id"].append(doc_id)
                    out["decode_ok"].append(True)
                    for c in ("chunk_index", "start_s",
                              "n_chunk_samples", "rms"):
                        out[c].append(None)
                    continue
                off, ci = 0, 0
                while off < len(s):
                    window = s[off:off + window_samples]
                    out["doc_id"].append(doc_id)
                    out["decode_ok"].append(True)
                    out["chunk_index"].append(ci)
                    # off counts interleaved samples: rate*n_ch of them
                    # elapse per second, so stereo times stay honest
                    out["start_s"].append(
                        off / (rate * n_ch) if rate else None)
                    out["n_chunk_samples"].append(len(window))
                    out["rms"].append(math.sqrt(
                        sum(v * v for v in window) / len(window)))
                    off += hop_samples
                    ci += 1
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, AUDIO_CHUNK_RMS_SCHEMA)


# ---------------------------------------------------------------------------
# FLAC (r10): dependency-free decoder + encoder twin. The lossless
# audio codec scraped corpora actually carry next to WAV — and, being
# integer-exact end-to-end (rice entropy coding + integer predictors),
# the ONE compressed audio format whose decode is oracle-checkable
# the way PNG's was for images: decoded samples equal the generative
# fixture samples bit-for-bit, so the symbolic WAV tone oracle doubles
# as the FLAC oracle. MP3/AAC remain out of oracle reach by design
# (float transforms, encoder freedom).

FLAC_SIGNATURE = b"fLaC"

_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_FLAC_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

#: Fixed-predictor coefficient rows, order 0..4 (FLAC spec §9.2.1 —
#: the binomial rows; residual = x(n) - Σ coef·x(n-i)).
_FLAC_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _crc_table(poly: int, width: int) -> tuple:
    """256-entry lookup table for an MSB-first CRC — byte-at-a-time
    instead of the 8-step bit loop (identical values; the table is
    just the bit loop precomputed per byte)."""
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top \
                else (crc << 1) & mask
        table.append(crc)
    return tuple(table)


_FLAC_CRC8_TABLE = _crc_table(0x07, 8)
_FLAC_CRC16_TABLE = _crc_table(0x8005, 16)


def _flac_crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header CRC.
    Table-driven (r10): the per-bit loop was ~10% of codec CPU."""
    crc = 0
    t = _FLAC_CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — whole-frame CRC. Table-driven."""
    crc = 0
    t = _FLAC_CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ t[(crc >> 8) ^ b]
    return crc


class _FlacBits:
    """MSB-first bit reader over the frame byte stream; running past
    the end raises the truncation ValueError (decode_ok=false row,
    never an IndexError escape)."""

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits
        self.total = len(buf) * 8

    def bits(self, k: int) -> int:
        if self.pos + k > self.total:
            raise ValueError("FLAC stream truncated")
        v = 0
        p = self.pos
        # byte-at-a-time fast path
        while k:
            i, sh = p >> 3, p & 7
            take = min(k, 8 - sh)
            chunk = (self.buf[i] >> (8 - sh - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            p += take
            k -= take
        self.pos = p
        return v

    def signed(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        n = 0
        while True:
            if self.pos >= self.total:
                raise ValueError("FLAC stream truncated")
            if self.bits(1):
                return n
            n += 1
            if n > 1 << 20:  # corrupt all-zeros run; bail loudly
                raise ValueError("FLAC unary run overlong")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _flac_utf8_number(r: "_FlacBits") -> int:
    """UTF-8-style coded frame/sample number (spec §9.1.5: the UTF-8
    length/continuation scheme extended to 36 bits)."""
    first = r.bits(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("FLAC bad UTF-8 frame number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = r.bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("FLAC bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _flac_residuals(r: "_FlacBits", block_size: int, order: int) -> list:
    """Partitioned rice residuals (spec §9.2.7): 2-bit method (rice
    4-bit / rice2 5-bit params), 4-bit partition order, per-partition
    parameter with all-ones escape to raw ``n``-bit verbatim."""
    method = r.bits(2)
    if method > 1:
        raise ValueError("FLAC reserved residual method")
    plen = 4 + method
    esc = (1 << plen) - 1
    porder = r.bits(4)
    n_parts = 1 << porder
    if block_size % n_parts:  # spec: block size must divide evenly
        raise ValueError("FLAC bad partition order")
    out = []
    for p in range(n_parts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC bad partition order")
        param = r.bits(plen)
        if param == esc:
            raw = r.bits(5)
            for _ in range(n):
                out.append(r.signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | r.bits(param) if param else q
                out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


def _flac_subframe(r: "_FlacBits", block_size: int, bps: int) -> list:
    """One subframe (spec §9.2): CONSTANT / VERBATIM / FIXED 0-4 /
    LPC 1-32, with the wasted-bits prefix."""
    if r.bits(1):
        raise ValueError("FLAC subframe padding bit set")
    t = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if t == 0:           # CONSTANT
        v = r.signed(eff)
        out = [v] * block_size
    elif t == 1:         # VERBATIM
        out = [r.signed(eff) for _ in range(block_size)]
    elif 8 <= t <= 12:   # FIXED, order t-8
        order = t - 8
        if order > block_size:
            raise ValueError("FLAC predictor order exceeds block")
        out = [r.signed(eff) for _ in range(order)]
        res = _flac_residuals(r, block_size, order)
        coefs = _FLAC_FIXED_COEFS[order]
        for e in res:
            x = e
            for c, prev in zip(coefs, out[-1:-order - 1:-1]):
                x += c * prev
            out.append(x)
    elif t >= 32:        # LPC, order t-31
        order = t - 31
        if order > block_size:
            raise ValueError("FLAC predictor order exceeds block")
        out = [r.signed(eff) for _ in range(order)]
        prec = r.bits(4)
        if prec == 15:
            raise ValueError("FLAC invalid qlp precision")
        prec += 1
        shift = r.bits(5)
        coefs = [r.signed(prec) for _ in range(order)]
        res = _flac_residuals(r, block_size, order)
        for e in res:
            pred = 0
            for c, prev in zip(coefs, out[-1:-order - 1:-1]):
                pred += c * prev
            out.append(e + (pred >> shift))
    else:
        raise ValueError("FLAC reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_flac(payload: bytes) -> dict:
    """FLAC decode (the format spec, RFC 9639): magic, metadata-block
    walk (STREAMINFO required), then frame-by-frame — header with
    CRC-8, per-channel subframes (constant / verbatim / fixed / LPC,
    partitioned-rice residuals), stereo decorrelation (left-side /
    right-side / mid-side), CRC-16 footer. Integer-exact throughout:
    decoded samples equal the encoder's input bit-for-bit, which is
    what makes a COMPRESSED codec oracle-checkable. Returns the
    :func:`decode_audio` dict (interleaved samples). 8/16-bit streams
    are supported; 12/20/24/32-bit raise ``NotImplementedError``
    (unsupported-codec gate); structural damage (bad CRCs, truncation,
    reserved codes) raises ``ValueError``."""
    if len(payload) < 42 or payload[:4] != FLAC_SIGNATURE:
        raise NotImplementedError("not a FLAC stream")
    import struct
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("FLAC metadata truncated")
        if btype == 0:
            if blen != 34:
                raise ValueError("FLAC bad STREAMINFO length")
            streaminfo = body
        elif btype == 127:
            raise ValueError("FLAC invalid metadata block type")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = int.from_bytes(streaminfo, "big")
    # fields from the top: minbs(16) maxbs(16) minfs(24) maxfs(24)
    # rate(20) ch-1(3) bps-1(5) total(36) md5(128)
    rate = (si >> (272 - 100)) & 0xFFFFF
    n_ch = ((si >> (272 - 103)) & 0x7) + 1
    bps = ((si >> (272 - 108)) & 0x1F) + 1
    total = (si >> 128) & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC zero sample rate")
    if bps not in (8, 16):
        raise NotImplementedError("only 8/16-bit FLAC is decodable")
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame_start = pos
        r = _FlacBits(payload, pos * 8)
        if r.bits(14) != 0x3FFE:
            raise ValueError("FLAC lost frame sync")
        if r.bits(1):
            raise ValueError("FLAC reserved header bit set")
        r.bits(1)  # blocking strategy
        bs_code = r.bits(4)
        rate_code = r.bits(4)
        ch_code = r.bits(4)
        size_code = r.bits(3)
        if r.bits(1):
            raise ValueError("FLAC reserved header bit set")
        _flac_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC reserved block size code")
        elif bs_code == 6:
            block_size = r.bits(8) + 1
        elif bs_code == 7:
            block_size = r.bits(16) + 1
        else:
            block_size = _FLAC_BLOCKSIZES[bs_code]
        if rate_code == 12:
            r.bits(8)
        elif rate_code in (13, 14):
            r.bits(16)
        elif rate_code == 15:
            raise ValueError("FLAC invalid sample rate code")
        if size_code in (3, 7):
            raise ValueError("FLAC reserved sample size code")
        fbps = _FLAC_SAMPLE_SIZES.get(size_code, bps)
        if fbps not in (8, 16):
            raise NotImplementedError("only 8/16-bit FLAC is decodable")
        hdr_end = r.pos // 8  # header fields are byte-multiples
        if _flac_crc8(payload[frame_start:hdr_end]) != r.bits(8):
            raise ValueError("FLAC frame header CRC mismatch")
        if ch_code <= 7:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC channel count mismatch")
            subs = [_flac_subframe(r, block_size, fbps)
                    for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC stereo assignment on non-stereo")
            # the difference channel carries one extra bit
            if ch_code == 8:    # left/side
                left = _flac_subframe(r, block_size, fbps)
                side = _flac_subframe(r, block_size, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(r, block_size, fbps + 1)
                right = _flac_subframe(r, block_size, fbps)
                subs = [[rr + s for rr, s in zip(right, side)], right]
            else:               # mid/side
                mid = _flac_subframe(r, block_size, fbps)
                side = _flac_subframe(r, block_size, fbps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
        else:
            raise ValueError("FLAC reserved channel assignment")
        r.align()
        crc_end = r.pos // 8
        want = r.bits(16)
        if _flac_crc16(payload[frame_start:crc_end]) != want:
            raise ValueError("FLAC frame CRC mismatch")
        for ch, s in zip(channels, subs):
            ch.extend(s)
        got += block_size
        pos = r.pos // 8
    if total and got < total:
        raise ValueError("FLAC stream truncated before total_samples")
    if total:
        channels = [ch[:total] for ch in channels]
    inter = []
    for frame in zip(*channels) if n_ch > 1 else [(v,) for v in
                                                  channels[0]]:
        inter.extend(frame)
    return {"sample_rate": rate, "n_channels": n_ch,
            "bits_per_sample": bps,
            "n_samples": len(channels[0]) if channels else 0,
            "samples": tuple(inter)}


class _FlacBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _flac_utf8_encode(n: int) -> bytes:
    """The frame-number UTF-8-style coding (inverse of
    :func:`_flac_utf8_number`)."""
    if n < 0x80:
        return bytes((n,))
    out = []
    bits = n.bit_length()
    n_follow = 1
    while bits > 6 * n_follow + (6 - n_follow):
        n_follow += 1
    lead = (0xFF << (7 - n_follow)) & 0xFF
    out.append(lead | (n >> (6 * n_follow)))
    for i in range(n_follow - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _flac_write_residuals(w: "_FlacBitWriter", res: list) -> None:
    """Single-partition rice residuals with a deterministic parameter
    choice: the smallest p minimizing the exact coded size (ties →
    smaller p), escape to verbatim when even p=14 underperforms."""
    zig = [(v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
           for v in res]
    # vectorized exact cost scan (r10): cost(p) = Σ(u >> p) + n·(1+p)
    # — the Python genexpr per candidate p was the encoder's single
    # hottest line. int64 is exact here: the encoder tries FIXED
    # PREDICTION ORDERS UP TO 4 (_FLAC_FIXED_COEFS), whose residuals
    # on the ≤17-bit side channel stay within ~2^21 after zigzag
    # (order-4 worst case: Σ|coef| = 16 × the 2^17 sample range), so
    # a block's Σ(u >> p) is ≪ 2^63. (r11: the comment previously
    # claimed order ≤ 2 — the bound holds for the real order-4 case.)
    import numpy as np
    zz = np.asarray(zig, dtype=np.int64)
    best_p, best_cost = 0, None
    for p in range(15):
        cost = int((zz >> p).sum()) + len(zig) * (1 + p)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if not (zz >> p).any():
            break
    raw_bits = max((abs(v).bit_length() + 1 for v in res), default=1)
    w.put(0, 2)   # rice method, 4-bit params
    w.put(0, 4)   # partition order 0
    if best_cost is not None and best_cost <= len(res) * raw_bits + 5:
        w.put(best_p, 4)
        for u in zig:
            w.unary(u >> best_p)
            if best_p:
                w.put(u & ((1 << best_p) - 1), best_p)
    else:
        w.put(0xF, 4)  # escape: verbatim residuals
        w.put(raw_bits, 5)
        for v in res:
            w.put(v, raw_bits)


def _flac_subframe_encode(w: "_FlacBitWriter", block: list, bps: int,
                          force_verbatim: bool = False) -> None:
    """Deterministic subframe choice: CONSTANT when flat, else the
    fixed predictor order 0-2 with the smallest exact residual cost
    (ties → lower order); ``force_verbatim`` pins the VERBATIM path
    for coverage. No wasted-bits analysis (flag always 0)."""
    if force_verbatim:
        w.put(2, 8)  # pad 0 + type 000001 + wasted 0
        for v in block:
            w.put(v, bps)
        return
    if all(v == block[0] for v in block):
        w.put(0, 8)  # pad 0 + type 000000 + wasted 0
        w.put(block[0], bps)
        return
    best_order, best_res, best_cost = None, None, None
    for order in range(3):
        if order > len(block):
            break
        coefs = _FLAC_FIXED_COEFS[order]
        res = []
        for i in range(order, len(block)):
            e = block[i]
            for j, c in enumerate(coefs):
                e -= c * block[i - 1 - j]
            res.append(e)
        cost = sum(abs(v).bit_length() for v in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    w.put(0, 1)
    w.put(8 + best_order, 6)
    w.put(0, 1)  # no wasted bits
    for v in block[:best_order]:
        w.put(v, bps)
    _flac_write_residuals(w, best_res)


def encode_flac(sample_rate: int, samples, n_channels: int = 1,
                block_size: int = 256, bps: int = 16,
                force_verbatim: bool = False,
                mid_side: bool = False) -> bytes:
    """Real FLAC encoder (the fixture/sink twin of
    :func:`_decode_flac`): STREAMINFO + fixed-blocking frames with
    CONSTANT / VERBATIM / FIXED-predictor subframes, single-partition
    rice residuals, correct CRC-8/CRC-16. ``mid_side`` exercises the
    mid/side stereo decorrelation path. Lossless by construction —
    decode returns the input samples exactly."""
    import hashlib
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    lim = 1 << (bps - 1)
    if any(not -lim <= v < lim for v in samples):
        raise ValueError("sample out of range for bps")
    n_frames_total = len(samples) // n_channels
    chans = [list(samples[c::n_channels]) for c in range(n_channels)]
    # STREAMINFO: min/max blocksize equal (fixed blocking)
    raw = bytearray()
    for i in range(n_frames_total):
        for c in range(n_channels):
            raw += int(chans[c][i]).to_bytes(bps // 8, "little",
                                             signed=True)
    si = 0
    si = (si << 16) | block_size
    si = (si << 16) | block_size
    si = (si << 24) | 0          # min frame size unknown
    si = (si << 24) | 0
    si = (si << 20) | sample_rate
    si = (si << 3) | (n_channels - 1)
    si = (si << 5) | (bps - 1)
    si = (si << 36) | n_frames_total
    streaminfo = si.to_bytes(18, "big") + hashlib.md5(bytes(raw)).digest()
    out = bytearray(FLAC_SIGNATURE)
    out += bytes((0x80,)) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo
    frame_no = 0
    for start in range(0, n_frames_total, block_size):
        blocks = [ch[start:start + block_size] for ch in chans]
        bs = len(blocks[0])
        w = _FlacBitWriter()
        w.put(0x3FFE, 14)
        w.put(0, 1)
        w.put(0, 1)       # fixed blocking
        w.put(7, 4)       # block size: 16-bit at end of header
        w.put(0, 4)       # sample rate: from STREAMINFO
        use_ms = mid_side and n_channels == 2
        w.put(10 if use_ms else n_channels - 1, 4)
        w.put(4 if bps == 16 else 1, 3)
        w.put(0, 1)
        for b in _flac_utf8_encode(frame_no):
            w.put(b, 8)
        w.put(bs - 1, 16)
        hdr = bytes(w.buf)
        w.put(_flac_crc8(hdr), 8)
        if use_ms:
            mid = [(l + r) >> 1 for l, r in zip(*blocks)]
            side = [l - r for l, r in zip(*blocks)]
            _flac_subframe_encode(w, mid, bps, force_verbatim)
            _flac_subframe_encode(w, side, bps + 1, force_verbatim)
        else:
            for b in blocks:
                _flac_subframe_encode(w, b, bps, force_verbatim)
        w.align()
        frame = w.bytes()
        out += frame + _flac_crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


def attach_flac_payload(documents: DataFrame) -> DataFrame:
    """FLAC fixture frame: the SAME deterministic tone as
    :func:`attach_audio_payload` (same rate/length/sample generative
    formulas), compressed through the real FLAC encoder executor-side.
    Losslessness is the oracle lever: decode returns the generative
    samples bit-for-bit, so the symbolic WAV tone oracle predicts the
    decoded features of the COMPRESSED stream too — while the decode
    path exercises rice coding, fixed predictors, CRCs, and the frame
    walk for real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                rate, n = _gen_audio_params(int(doc_id))
                payloads.append(encode_flac(
                    rate, _gen_audio_samples(int(doc_id), n)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "audio/flac",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads]})

    # rice coding + CRCs + the downstream full FLAC decode are by far
    # the costliest per-row compute in the media family (measured
    # 15.5 s in ONE task over the single-row-group fixture scan at
    # sf0.1) — same cluster-parallelism guard as the JPEG attachers
    # (no-op at real split counts; see tables.py)
    from s3_elasticsearch_data_pipeline_spark.tables import (
        parallelize_for_compute)
    return (parallelize_for_compute(documents.select("doc_id"))
            .mapInPandas(run, PAYLOAD_SCHEMA))
