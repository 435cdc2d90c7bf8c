"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video live as ``binary`` columns with a metadata struct; the
decode / feature-extract step is a ``mapInPandas`` stage (Arrow-batched —
the payload bytes never round-trip through Python row objects one at a
time). The actual codec calls are STUBBED (no image/audio libs in this
container): ``decode_stub_features`` computes deterministic byte-level
features so the Spark-side plumbing — schema, batching, partition shape —
is fully real and oracle-checked, while ``decode_real`` raises
NotImplementedError to mark where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
        StructField("byte_sum_mod", LongType()),
    ]
)

BYTE_SUM_MOD = 65521  # largest prime < 2^16 (adler-style)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct.

    In production the payload is the raw image/audio blob from the lakehouse;
    here it is the utf-8 encoding of ``text`` so every stage downstream is
    deterministic and oracle-checkable.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.octet_length("payload").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def decode_real(payload: bytes) -> dict:
    """Where a real decoder (PIL.Image.open / soundfile / pyav) plugs in."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use decode_stub_features for the deterministic test path"
    )


def decode_stub_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The stub computes byte-level statistics (length, boundary bytes,
    checksum-style byte sum) — the exact shape a real embed/resize stage
    has: mapInPandas over (id, payload), one output row per input row,
    numeric feature columns out.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % BYTE_SUM_MOD
                    ),
                }
            )

    return src.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic 1-in-N sampling for frame/segment extraction.

    Hash-based (md5 of the id), not rand() — reproducible across retries
    and cluster re-runs, which matters for training-data lineage.
    """
    return df.filter(
        (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
         .cast("long") % every_n) == 0
    ).select(id_col, payload_col)
