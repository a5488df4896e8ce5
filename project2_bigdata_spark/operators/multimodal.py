"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
decode step is STUBBED (clearly marked below) with a deterministic fake;
everything Spark-side is real and tested: binary column handling, the
metadata struct schema, Arrow batch shape through mapInPandas, and
partition-preserving execution. Swapping `_fake_decode` for a real
PIL/ffmpeg call changes no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from ..catalog import table

DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_checksum", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mime", StringType()),
])

HAVE_PIL = False
try:  # decode libs absent in this container — plumbing stays real
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def attach_payload(df: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Uses the document text bytes as the stand-in payload; a real
    pipeline would read image/audio bytes from object storage with
    `spark.read.format("binaryFile")` into exactly this shape.
    """
    return df.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


#: file extension → mime for the binaryFile source (best-effort; unknown
#: extensions fall through to application/octet-stream)
_EXT_MIME = {
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "bmp": "image/bmp", "wav": "audio/wav",
    "mp3": "audio/mpeg", "mp4": "video/mp4", "txt": "text/plain",
}


def attach_payload_binary(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """The real object-storage ingestion boundary: ``binaryFile`` scan →
    the exact (doc_id, payload, meta) shape ``attach_payload`` fakes.

    doc_id is xxhash64(path) — deterministic, partition-independent, and
    collision-safe at catalog scale; mime is derived from the extension
    (a real pipeline would sniff magic bytes in the decode step anyway).
    binaryFile supports predicate pushdown on path/length/modificationTime,
    so e.g. ``.filter("meta.n_bytes < 10e6")`` before decode still prunes
    at the scan when expressed on the source columns.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split("path", r"\."), -1))
    mime_map = F.create_map(*[F.lit(x) for kv in _EXT_MIME.items() for x in kv])
    return raw.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.coalesce(mime_map[ext], F.lit("application/octet-stream")).alias("mime"),
            F.col("length").alias("n_bytes"),
        ).alias("meta"),
    )


def _md5_52(b: bytes) -> int:
    """First 13 hex chars of md5 as a (52-bit, always positive) int64 —
    the same engine-portable fingerprint the dedup/minhash operators use,
    so the DuckDB oracle can rebuild it as
    ``CAST(concat('0x', substr(md5(x), 1, 13)) AS BIGINT)``."""
    import hashlib

    return int(hashlib.md5(b).hexdigest()[:13], 16)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake for the absent image decoder: derives
    pseudo-dimensions from the byte length so downstream schema/tests
    are meaningful. Checksum is the md5-prefix fingerprint (portable:
    the registered query's oracle recomputes it in SQL)."""
    n = len(payload)
    return _md5_52(payload), (n % 640) + 1, (n % 480) + 1


def _decode(payload: bytes) -> tuple[int, int, int]:
    """Decode one payload → (checksum, width, height).

    Uses PIL when importable AND the payload is actually a decodable
    image; any other case (no PIL in this container, or a non-image
    stand-in payload like the text bytes used in tests) falls back to
    the deterministic fake, so the operator upgrades transparently when
    a real decoder is installed instead of breaking.
    """
    if HAVE_PIL:
        import io

        try:
            with PIL.Image.open(io.BytesIO(payload)) as img:
                w, h = img.size
                checksum = sum(img.tobytes()) % (1 << 31)
                return checksum, w, h
        except Exception:
            pass  # not an image → deterministic fake below
    return _fake_decode(payload)


def decode_features(df_with_payload: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas decode: Arrow batches in, typed feature rows out.

    Partition-preserving (no shuffle); batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory is
    bounded regardless of corpus size.

    ``decoder`` defaults to :func:`_decode` (PIL-upgradeable). The
    registered ``multimodal_decode`` query pins ``decoder=_fake_decode``
    so its output is environment-independent and oracle-checkable.
    """
    decoder = decoder or _decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            rows = [decoder(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "byte_checksum": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "mime": pdf["meta"].map(lambda m: m["mime"]),
            })

    return df_with_payload.mapInPandas(decode_batches, DECODE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing decode relation, pinned to the deterministic fake
    decoder (environment-independent → exact DuckDB oracle). The
    PIL-upgradeable path stays available via
    ``decode_features(df, decoder=_decode)``."""
    return decode_features(
        attach_payload(table(spark, sf_dir, "documents")), decoder=_fake_decode
    )


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def resize_images(df_with_payload: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """mapInPandas resize STUB: real impl = PIL `.resize((w, h))` per
    payload; the fake deterministically truncates/pads the byte payload
    to w*h bytes so output size is schema-governed. Plan shape (Arrow
    batches, no shuffle, binary in → binary out) is the real contract.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = [
                (bytes(p) + b"\x00" * target)[:target] for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": out,
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
            })

    return df_with_payload.mapInPandas(resize_batches, RESIZE_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_checksum", LongType()),
])


def sample_frames(df_with_payload: DataFrame, every_n: int = 10) -> DataFrame:
    """mapInPandas frame-sampling STUB — the flat-map shape (one video
    row → many frame rows), which neither a UDF nor applyInPandas
    expresses as naturally. Real impl = ffmpeg/pyav keyframe iteration;
    the fake treats every 100 bytes as a 'frame' and samples every
    ``every_n``-th with a deterministic checksum."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(len(b) // 100, 1)
                for i in range(0, n_frames, every_n):
                    chunk = b[i * 100:(i + 1) * 100]
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(_md5_52(chunk))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_checksum": pd.Series(sums, dtype="int64"),
            })

    return df_with_payload.mapInPandas(frame_batches, FRAMES_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(attach_payload(table(spark, sf_dir, "documents")))
