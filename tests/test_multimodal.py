"""Multimodal binary-column plumbing tests (stubbed codec, real Spark)."""

from __future__ import annotations

import hashlib

import pytest

from ml_data_pipeline_spark.operators.multimodal import (
    binary_payload_features,
    decode_image_fake,
    decode_image_stub,
    decode_resize_pipeline,
    detect_format,
)


def test_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG....")


def test_detect_format_extension_and_double_extension():
    # extension only
    assert detect_format("a/b/data.csv") == ("csv", None)
    assert detect_format("x.jsonl") == ("json", None)
    assert detect_format("img.JPG") == ("jpeg", None)
    # .gz double extension peels compression then resolves the inner ext
    assert detect_format("corpus.csv.gz") == ("csv", "gzip")
    assert detect_format("dump.json.gzip") == ("json", "gzip")
    assert detect_format("blob.gz") == ("raw", "gzip")
    # magic bytes win over a lying extension
    assert detect_format("fake.csv", b"\x89PNG\r\n") == ("png", None)
    assert detect_format("fake.txt", b"PAR1xxxx") == ("parquet", None)
    # gzip magic defers to the inner extension
    assert detect_format("corpus.csv.gz", b"\x1f\x8b\x08") == ("csv", "gzip")
    # dotfiles: leading dot is not an extension
    assert detect_format(".gitignore") == ("raw", None)
    # no extension, no magic
    assert detect_format("README", b"hello") == ("raw", None)


def test_fake_decoder_deterministic():
    a = decode_image_fake(b"hello")
    assert a == decode_image_fake(b"hello")
    assert a != decode_image_fake(b"world")
    h, w, hist = a
    assert 8 <= h < 64 and 8 <= w < 64 and len(hist) == 4


def test_codec_selection_honest():
    """image_codec() always returns the REAL decoder (pillow-backed
    when importable, vendored pure-PNG otherwise); the fake codec is
    only ever an explicit opt-in."""
    from ml_data_pipeline_spark.operators.multimodal import (
        decode_image_real,
        image_codec,
    )

    assert image_codec() is decode_image_real
    with pytest.raises(ValueError):
        decode_image_real(b"\xff\xd8\xff not actually decodable")


def _make_png(width: int, height: int) -> bytes:
    from ml_data_pipeline_spark.operators.png_codec import encode_png

    pixels = bytes(i % 256 for i in range(width * height))
    return encode_png(pixels, width, height, color_type=0)


def test_real_codec_decodes_png():
    """Real PNG → (h, w, hist) through the shared codec interface —
    runs in EVERY container now: pillow when present, the vendored
    pure-Python PNG decoder otherwise (round-5; this test used to
    skip without pillow)."""
    from ml_data_pipeline_spark.operators.multimodal import decode_image_real

    h, w, hist = decode_image_real(_make_png(12, 7))
    assert (h, w) == (7, 12)
    assert len(hist) == 4
    assert abs(sum(hist) - 1.0) < 1e-4  # normalized luminance histogram
    # 84 gray values 0..83 → bins [0,64): 64, [64,128): 20, rest 0
    assert hist == [round(64 / 84, 6), round(20 / 84, 6), 0.0, 0.0]


def test_decode_resize_pipeline(spark, sf_dir):
    out = decode_resize_pipeline(spark, sf_dir, target=32).collect()
    assert len(out) > 0
    for r in out[:20]:
        assert max(r["resized_h"], r["resized_w"]) == 32
        assert len(r["hist"]) == 4
    # spot-check one row against a driver-side decode of the same bytes
    from ml_data_pipeline_spark.sources.tables import load_table

    row0 = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id = 0")
        .collect()[0]
    )
    h, w, hist = decode_image_fake(row0["text"].encode())
    got = next(r for r in out if r["doc_id"] == 0)
    assert (got["height"], got["width"]) == (h, w)
    assert got["hist"] == hist


def test_payload_digest_matches_hashlib(spark, sf_dir):
    rows = binary_payload_features(spark, sf_dir).limit(5).collect()
    from ml_data_pipeline_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").limit(50).collect()
    }
    for r in rows:
        if r["doc_id"] in texts:
            raw = texts[r["doc_id"]].encode()
            assert r["digest"] == hashlib.md5(raw).hexdigest()
            assert r["n_bytes"] == len(raw)
            assert r["sniffed_format"] == "raw"
