"""Multimodal column convention + Arrow-batched processing (SURVEY §2b X5).

Convention: an opaque ``payload binary`` column plus a typed ``meta`` struct
(kind/mime/n_bytes/checksum — schemas.MULTIMODAL_META_SCHEMA). Parquet
stores binaries natively; the metadata struct prunes independently, so
queries that never touch bytes never read them (column pruning does the
heavy lifting at 100 TB — a metadata-only scan reads ~1% of the data).

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
image/audio libraries are not in this container, so the actual byte decode
is stubbed behind ``_decode_image_bytes`` (deterministic fake measurements
derived from the payload), while everything Spark-side — schema contract,
batch shape, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id long, width int, height int, n_frames int"


def attach_payload(df: DataFrame, text_col: str, kind: str = "image") -> DataFrame:
    """Wrap a source column as the multimodal (payload, meta) pair. In a real
    ingest the payload bytes come from the object store; here the fixture
    text stands in as the byte source."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(f"{kind}/fake").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def _decode_image_bytes(buf: bytes) -> tuple[int, int, int]:
    """STUB decode — the container has no PIL/ffmpeg. Returns deterministic
    fake (width, height, n_frames) derived from the payload size so the
    pipeline shape (and its oracle) is fully testable. A real deployment
    replaces only this function:

        raise NotImplementedError("wire PIL.Image.open(io.BytesIO(buf))")
    """
    n = len(buf)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) → per-item
    measurements. Batches arrive as pandas DataFrames (vectorized transfer);
    per-item decode happens inside the batch loop — the correct shape for a
    CPU-bound decode at scale (repartition upstream to spread batches)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_image_bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    # Production note: with a real (CPU-bound) decoder, repartition first
    # (operators.dedup.spread) so batches spread across executors; for the
    # stub the extra payload shuffle costs more than the decode.
    return df.select(id_col, "payload").mapInPandas(batches, DECODE_SCHEMA)
