"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

The reference has no multimodal surface; this is a north-star extension
(BASELINE.json). Design per the 100 TB pipeline pattern:

- blobs are opaque ``binary`` columns with a typed metadata struct sitting
  next to them (mime, n_bytes, width/height) — never parsed by Catalyst,
  so they flow through shuffles/joins untouched;
- decode / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (one Python worker per partition, whole batches
  over Arrow — never row-at-a-time UDFs);
- the actual codec step is STUBBED (``decode_image`` raises
  ``NotImplementedError`` — image/audio libs are not in this container);
  a deterministic fake stands in so the Spark-side plumbing (schema,
  partitioning, UDF signature, batch shape, 1→N frame explosion) is real
  and testable end-to-end.

Scale notes: feature extraction is map-only (zero shuffle); frame
sampling multiplies rows ~n_bytes/frame_size so it repartitions after
explode when downstream aggregates; blobs stay in the executor — nothing
collects to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha_hex string, head_hex string"
)
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_md5 string"


def decode_image(blob: bytes) -> object:
    """REAL image decode — intentionally stubbed.

    The container has no image/audio libraries (no PIL / cv2 / soundfile).
    In production this body is ``PIL.Image.open(io.BytesIO(blob))``; here
    any caller that needs true pixel data must inject its own decoder.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "use fake_decode_meta() for deterministic plumbing tests"
    )


def fake_decode_meta(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: fake (width, height) derived
    from the byte content so tests are reproducible."""
    h = int.from_bytes(hashlib.sha256(blob).digest()[:4], "big")
    return (64 + h % 1024, 64 + (h >> 10) % 1024)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct.

    Testdata ships no real media, so the blob is the UTF-8 bytes of the
    text column — the point is the column layout (binary + struct), which
    is exactly what a real image column looks like to Catalyst.
    """
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "blob_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def extract_blob_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the blob column.

    Emits per-blob (n_bytes, sha256 hex, first-8-bytes hex). Map-only:
    no shuffle, one Python worker pass per partition.
    """

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "sha_hex": blobs.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "head_hex": blobs.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return df.select(id_col, "blob").mapInPandas(fe, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, frame_size: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sample a "video" blob: split into fixed-size byte frames,
    emit one row per frame (1→N explosion inside the Arrow batch)."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for did, blob in zip(pdf[id_col], pdf["blob"]):
                b = bytes(blob)
                # empty blob -> no frames (the oracle's generate_series
                # over floor((0-1)/frame) is empty; a zero-length frame
                # row would be an engine-only extra)
                for i in range(0, len(b), frame_size):
                    frame = b[i : i + frame_size]
                    ids.append(did)
                    idxs.append(i // frame_size)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_md5": md5s,
                }
            )

    return df.select(id_col, "blob").mapInPandas(fs, FRAME_SCHEMA)
