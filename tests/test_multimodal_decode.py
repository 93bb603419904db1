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
        assert r["resized_md5"] == hashlib.md5(bytes(expected)).hexdigest()


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
