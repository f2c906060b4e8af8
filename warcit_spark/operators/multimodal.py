"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct — the same late-bound-payload shape as the reference's
FileInfo (lazy ``open()``, /root/reference/warcit/base.py:99-100) and the
pages table's ``html`` column.  The Spark-side contract (schema,
partition-preserving ``mapInPandas`` batch shape, Arrow transfer) is real
and tested; the codec work itself is stubbed behind import-gates because
the sandbox has no image/audio libraries — each stub raises
``NotImplementedError`` unless a deterministic fake is requested, so the
plumbing is testable end-to-end without the codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_s:double>"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata projection over an opaque binary column: size, sha1,
    magic-byte sniff of the container format (first bytes only — the Spark
    analog of the reference sniffing 2048 bytes, warcit/warcit.py:28,640)."""
    head = F.substring(F.col(payload_col), 1, 8)
    sniffed = (
        F.when(F.startswith(head, F.lit(b"\x89PNG")), "image/png")
        .when(F.startswith(head, F.lit(b"\xff\xd8\xff")), "image/jpeg")
        .when(F.startswith(head, F.lit(b"GIF8")), "image/gif")
        .when(F.startswith(head, F.lit(b"RIFF")), "audio/wav")
        .when(F.startswith(head, F.lit(b"FLV\x01")), "video/x-flv")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("payload_size", F.length(payload_col).cast("long")) \
             .withColumn("payload_sha1", F.sha1(F.col(payload_col))) \
             .withColumn("sniffed_mime", sniffed)


def _decode_stub(payload: bytes, kind: str, deterministic_fake: bool):
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires PIL/av/soundfile — not in this container; "
            "pass deterministic_fake=True for the test double"
        )
    # deterministic fake: 8 float features derived from a sha256 of payload
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Real deployment: PIL/torchvision decode + resize inside the batch
    loop; here the decode is the documented stub.  Batch shape, schema and
    partitioning are the production contract.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(
                    bytes(p) if p is not None else b"", k, deterministic_fake
                )
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, FEATURE_SCHEMA
    )


def generate_media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (magic bytes + filler payloads)."""
    magics = {
        0: b"\x89PNG\r\n\x1a\n",
        1: b"\xff\xd8\xff\xe0",
        2: b"GIF89a",
        3: b"RIFF0000WAVE",
        4: b"FLV\x01",
    }
    kinds = {0: "image", 1: "image", 2: "image", 3: "audio", 4: "video"}
    rows = []
    for i in range(n):
        m = i % 5
        payload = magics[m] + bytes([(i * 7 + j) % 256 for j in range(64)])
        rows.append((i, kinds[m], payload, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
