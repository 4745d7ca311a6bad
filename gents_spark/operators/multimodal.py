"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct.  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` iteration, partition sizing — is real and tested; the
actual media decode is STUBBED (this container ships no image/audio
libraries): ``decode_stub`` produces a deterministic fake feature vector
from the payload bytes, and ``decode_real`` raises NotImplementedError
with the integration point documented.

At 100 TB the pattern is: keep payloads in their own column (Parquet
stores them as separate chunks — metadata-only queries never touch
them), repartition by size before the decode stage (payload bytes, not
row count, is the cost unit), and run decode via ``mapInPandas`` so each
task streams Arrow batches instead of materializing the partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_DIM = 4

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, header_hash string, feature array<float>"
)


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingestion: utf-8 bytes of text as the opaque payload.
    (Real pipelines read the bytes from object storage.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_real(payload: bytes) -> list[float]:
    """Integration point for a real decoder (PIL/torchaudio/ffmpeg).

    Deliberately unimplemented: the container has no media libraries.
    Swap this for e.g. ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``
    and the surrounding Spark plumbing is unchanged.
    """
    raise NotImplementedError("media decode requires image/audio libs")


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode': fixed-dim feature from byte stats."""
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:16]) % 256),
    ]


def decode_features(
    with_payload_df: DataFrame, batch_size_hint: int = 1024
) -> DataFrame:
    """mapInPandas decode stage: streams Arrow batches; one Python call
    per batch.  Schema is fixed up-front (DECODED_SCHEMA) so downstream
    plans resolve without running the decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hash": payloads.map(
                        lambda b: bytes(b[:4]).hex().upper()
                    ),
                    "feature": payloads.map(lambda b: decode_stub(bytes(b))),
                }
            )

    return with_payload_df.mapInPandas(run, DECODED_SCHEMA)


def payload_meta(docs: DataFrame) -> DataFrame:
    """Metadata-only path (never touches decode): byte length + header
    hex — expressible fully JVM-side, used as the SQL-oracle query."""
    p = with_payload(docs)
    return p.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.upper(F.substring(F.hex("payload"), 1, 8)).alias("header_hash"),
    )
