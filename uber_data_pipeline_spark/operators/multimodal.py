"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
with decode / feature-extraction as Arrow-batched ``mapInPandas``
plumbing.

The design mirrors how a 100 TB training-data pipeline carries media:
the payload is an opaque binary blob that Spark never interprets
(parquet stores it page-compressed; predicate pushdown happens on the
*metadata* columns, never the blob), and every per-item transform is a
``mapInPandas`` kernel so bytes cross the JVM/Python boundary once per
Arrow batch, not once per row.

CODEC STUB: the container has no image/audio libraries, so
``_decode_payload`` is a deterministic fake (md5-derived feature
vector) and ``decode_image``/``decode_audio`` raise
``NotImplementedError``. The Spark-side plumbing — schema, Arrow batch
shape, partitioning, UDF signatures — is real and tested; swapping the
fake for PIL/torchaudio changes only the function body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

KINDS = ("image", "audio", "text")  # doc_id % 3 picks, deterministically
_MIME = {"image": "image/png", "audio": "audio/wav", "text": "text/plain"}


def attach_media(docs: DataFrame) -> DataFrame:
    """Build the media table from documents: payload = utf-8 bytes of
    the text (the deterministic stand-in for real media bytes), kind
    assigned round-robin by doc_id, typed metadata struct alongside."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("text")
    )
    mime = (
        F.when(F.col("kind") == "image", _MIME["image"])
        .when(F.col("kind") == "audio", _MIME["audio"])
        .otherwise(_MIME["text"])
    )
    return (
        docs.select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.encode("text", "UTF-8").alias("payload"),
            F.col("n_chars"),
        )
        .withColumn(
            "meta",
            F.struct(
                F.length("payload").alias("n_bytes"),
                mime.alias("mime"),
                # plausible typed fields a real pipeline would carry
                F.when(F.col("kind") == "image", F.col("n_chars") % 1024).alias("width"),
                F.when(F.col("kind") == "image", F.col("n_chars") % 768).alias("height"),
                F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
            ),
        )
        .drop("n_chars")
    )


def _decode_payload(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB CODEC — deterministic md5-derived pseudo-features.
    A real deployment replaces this body with the actual decoder
    (PIL image decode + resize + channel stats, torchaudio frames,
    ...); everything around it stays identical."""
    digest = hashlib.md5(payload).hexdigest()
    return [round(int(digest[2 * i : 2 * i + 2], 16) / 255.0, 6) for i in range(dim)]


def decode_image(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "image codec not available in this environment; "
        "_decode_payload is the deterministic stand-in"
    )


def decode_audio(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "_decode_payload is the deterministic stand-in"
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, kind, n_bytes, feat: array<double>) via mapInPandas:
    one Python roundtrip per Arrow batch; the blob never leaves the
    executor, and the output drops it so downstream stages shuffle
    only the (small) features."""

    schema = f"media_id long, kind string, n_bytes int, feat array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feat": [_decode_payload(bytes(p), dim) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(kernel, schema)


def media_features_flat(docs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Oracle-comparable projection: the feature vector flattened to
    f0..f{dim-1} scalar columns."""
    feats = extract_features(attach_media(docs), dim)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        *[F.col("feat")[i].alias(f"f{i}") for i in range(dim)],
    )
