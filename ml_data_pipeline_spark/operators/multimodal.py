"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats media as `binary` columns with metadata, processed by Arrow-
batched `mapInPandas` — the real Spark-side plumbing (schema,
batching, UDF signature) with the codec itself stubbed, since no
image/audio libraries ship in this container. Reference analog: the
image reader's lazy/eager/metadata loading modes and magic-byte format
sniffing (/root/reference/ml-data/ml-data-readers/src/image.rs:51-77,
160-500).

`binary_payload_features` is the oracle-checkable path: it derives the
payload from `documents.text` (utf-8 bytes) so DuckDB can verify the
byte length, magic-byte sniff, and content digest exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ml_data_pipeline_spark.sources.tables import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("sniffed_format", T.StringType()),
    ]
)


def _sniff(payload: bytes) -> str:
    """Magic-byte format sniffing (reference: image.rs:51-77,
    common.rs:109-148 — PAR1/ARROW1/gzip/PNG/JPEG magic)."""
    if payload.startswith(b"\x89PNG"):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith(b"PAR1"):
        return "parquet"
    if payload.startswith(b"\x1f\x8b"):
        return "gzip"
    return "raw"


_EXT_FORMATS = {
    "png": "png",
    "jpg": "jpeg",
    "jpeg": "jpeg",
    "parquet": "parquet",
    "arrow": "arrow",
    "feather": "arrow",
    "csv": "csv",
    "tsv": "csv",
    "json": "json",
    "jsonl": "json",
    "txt": "text",
    "tfrecord": "tfrecord",
}


def detect_format(
    path: str, payload: bytes | None = None
) -> tuple[str, str | None]:
    """Format detection: magic bytes first, then file extension,
    including the ``.gz`` double-extension (reference: extension
    detection with the compression suffix peeled,
    ml-data-readers/src/common.rs:72-106, magic bytes :109-148).

    Returns ``(format, compression)`` — e.g. ``("csv", "gzip")`` for
    ``data.csv.gz``. Magic bytes win when they identify a concrete
    format; gzip magic defers to the inner extension.
    """
    compression = None
    name = path.rsplit("/", 1)[-1].lower()
    parts = name.split(".")
    exts = parts[1:] if parts and parts[0] else parts[2:]
    if exts and exts[-1] in ("gz", "gzip"):
        compression = "gzip"
        exts = exts[:-1]
    if payload is not None:
        sniffed = _sniff(payload)
        if sniffed == "gzip":
            compression = "gzip"
        elif sniffed != "raw":
            return sniffed, compression
    if exts and exts[-1] in _EXT_FORMATS:
        return _EXT_FORMATS[exts[-1]], compression
    return "raw", compression


def decode_image_stub(payload: bytes) -> "object":
    """Deliberate stub: real decode needs an image library not present
    in this container. The Spark-side plumbing around it is real."""
    raise NotImplementedError(
        "image decode requires an image codec library (not bundled); "
        "payload plumbing (binary column, Arrow batching) is exercised "
        "by binary_payload_features / decode_resize_pipeline"
    )


def decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real image decode (same interface as the fake codec): pillow
    when importable (all formats), else the vendored pure-Python PNG
    decoder (``operators.png_codec`` — stdlib zlib, critical chunks,
    all five scanline filters), so the real decode path EXECUTES in
    codec-less containers instead of skipping. Both paths use the same
    ITU-R 601-2 truncating luminance conversion, so they agree
    byte-for-byte on shared inputs. Returns (height, width, 4-bin
    luminance histogram normalized to [0, 1]) — exactly the fake
    codec's shape, so the decode → resize → feature pipeline is
    codec-agnostic (reference analog: the image reader's eager decode
    path, image.rs:160-500, which the reference itself stubs)."""
    import io

    try:
        from PIL import Image
    except ImportError:
        import struct
        import zlib

        from ml_data_pipeline_spark.operators.png_codec import decode_png

        # Error contract (round-5 advice): undecodable payloads raise
        # ValueError on BOTH paths. decode_png leaks struct.error on a
        # truncated chunk and zlib.error on corrupt IDAT — normalize.
        try:
            height, width, gray = decode_png(payload)
        except (struct.error, zlib.error) as e:
            raise ValueError(f"undecodable image payload: {e}") from e
        counts = [0] * 4
        for px in gray:
            counts[px >> 6] += 1
        total = max(1, height * width)
        return height, width, [round(c / total, 6) for c in counts]

    # Error contract: undecodable payloads raise ValueError on BOTH
    # paths. PIL raises UnidentifiedImageError (an OSError subclass) —
    # normalize it so callers catch one exception type regardless of
    # which decoder the environment provides.
    try:
        with Image.open(io.BytesIO(payload)) as im:
            gray = im.convert("L")
            width, height = gray.size
            counts = gray.histogram()  # 256 bins
    except Exception as e:
        raise ValueError(f"undecodable image payload: {e}") from e
    total = max(1, height * width)
    hist = [
        round(sum(counts[i * 64 : (i + 1) * 64]) / total, 6) for i in range(4)
    ]
    return height, width, hist


def image_codec():
    """The best available REAL codec under the shared (h, w, hist)
    interface: pillow when importable (all formats), else the vendored
    pure-PNG decoder via ``decode_image_real`` (PNG only — other
    formats raise, honestly). ``decode_image_fake`` remains the
    explicit choice for arbitrary non-image payloads (the
    driver-contract pipeline default)."""
    return decode_image_real


def decode_image_fake(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic FAKE decoder (container has no image libs): derives
    (height, width, 4-bin 'pixel histogram') purely from the payload
    bytes. Stands in for a real codec so the full decode → resize →
    feature pipeline plumbing (schemas, batching, partitioning) runs
    and is testable. Swap for a real codec in production."""
    import hashlib

    h = hashlib.md5(payload).digest()
    height = 8 + h[0] % 56
    width = 8 + h[1] % 56
    hist = [round(b / 255.0, 6) for b in h[2:6]]
    return height, width, hist


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("hist", T.ArrayType(T.DoubleType())),
    ]
)


def decode_resize_pipeline(
    spark: SparkSession, sf_dir: str, target: int = 32, codec=None
) -> DataFrame:
    """Full multimodal pipeline shape: binary payload → decode →
    aspect-preserving resize metadata → per-image features, as one
    Arrow-batched mapInPandas pass (reference: image reader's
    lazy/eager modes + resize preprocessing, image.rs:93-132,160-500).

    ``codec`` is any (payload) → (h, w, hist) callable — default the
    deterministic fake (the oracle-stable driver-contract path); pass
    ``image_codec()`` to pick the pillow-backed real decoder when
    installed. Scale: one Python pass per partition, no driver
    involvement; the binary column never leaves the executor.
    """
    codec = codec or decode_image_fake
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, hist = codec(bytes(payload))
                scale = target / max(h, w)
                rows.append(
                    (
                        doc_id,
                        h,
                        w,
                        max(1, round(h * scale)),
                        max(1, round(w * scale)),
                        hist,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "height",
                    "width",
                    "resized_h",
                    "resized_w",
                    "hist",
                ],
            )

    return d.mapInPandas(run, DECODED_SCHEMA).orderBy("doc_id")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "sniffed_format": payloads.map(_sniff),
            }
        )


def binary_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas.

    Payload = utf-8 bytes of the text (a deterministic stand-in for
    image bytes); features = byte length, md5 digest, sniffed format.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = d.mapInPandas(_feature_batches, FEATURE_SCHEMA)
    return feats.orderBy("doc_id")
