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
    from uber_data_pipeline_spark.operators.spread import spread_rowlocal

    # downstream decode/hash kernels are per-partition compute over a
    # byte-cheap scan — spread the under-split local input (no-op on
    # an adequately-split lake)
    return (
        spread_rowlocal(docs).select(
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


# Codec REGISTRY — the real-codec integration point: a deployment
# with PIL/torchaudio installs its decoders per kind
# (register_codec("image", pil_decode)) and every mapInPandas kernel
# below dispatches through the registry; nothing else changes. The
# kernel CAPTURES the registry at plan time, so driver-side
# registration ships to executors inside the pickled closure (worker
# processes re-import modules — a worker-side module lookup would
# silently ignore driver registrations). The default for every kind
# is the deterministic stub.
CODECS: dict[str, "callable"] = {kind: _decode_payload for kind in KINDS}


def register_codec(kind: str, fn) -> None:
    """Install a real decoder for ``kind`` ('image'|'audio'|'text');
    fn(payload: bytes, dim: int) -> list[float]."""
    if kind not in KINDS:
        raise KeyError(f"unknown media kind {kind!r}; one of {KINDS}")
    CODECS[kind] = fn


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, kind, n_bytes, feat: array<double>) via mapInPandas:
    one Python roundtrip per Arrow batch; the blob never leaves the
    executor, and the output drops it so downstream stages shuffle
    only the (small) features. Decoders resolve per-row through the
    CODEC registry by kind."""

    schema = f"media_id long, kind string, n_bytes int, feat array<double>"

    codecs = dict(CODECS)  # captured at plan time, shipped in the closure

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feat": [
                        codecs[k](bytes(p), dim)
                        for k, p in zip(pdf["kind"], pdf["payload"])
                    ],
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


FRAME_BYTES = 64
FRAME_STRIDE = 4


def frame_sample(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Frame sampling — the video-ingest shape: each payload is a
    sequence of fixed-size frames; keep every ``stride``-th frame and
    emit ONE ROW PER SAMPLED FRAME (a 1->N mapInPandas, the row-count
    amplifying variant of the decode kernel). Emits the frame's
    fingerprint + length, never the bytes, so downstream stages
    shuffle fingerprints, not media.

    Scale shape: the kernel is per-partition streaming over Arrow
    batches — no shuffle at all; output cardinality is bounded by
    payload_bytes / (frame_bytes * stride) per row. A real deployment
    replaces the byte-slice "frames" with the container's codec
    (pyav keyframes, ffmpeg segments); everything around it — the
    schema, the batch loop, the amplification — stays identical."""

    schema = "media_id long, frame_idx int, frame_md5 string, frame_len int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            md5s: list[str] = []
            lens: list[int] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    md5s.append(hashlib.md5(fr).hexdigest())
                    lens.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, schema)


def sql_frame_sample(
    frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> str:
    """DuckDB twin of :func:`frame_sample` over the documents-derived
    media table (payload == utf-8 text bytes; the corpus is ASCII so
    byte frames == char frames)."""
    return f"""
        WITH m AS (
            SELECT doc_id AS media_id, text,
                   CAST(ceil(length(text) / {frame_bytes}.0) AS INT) AS n_frames
            FROM documents
        )
        SELECT media_id, i.i AS frame_idx,
               md5(substring(text, i.i * {frame_bytes} + 1, {frame_bytes}))
                   AS frame_md5,
               CAST(length(substring(text, i.i * {frame_bytes} + 1,
                    {frame_bytes})) AS INT) AS frame_len
        FROM m, unnest(range(0, n_frames)) AS i(i)
        WHERE i.i % {stride} = 0
    """


def metadata_stats(media_lake: DataFrame) -> DataFrame:
    """Per-kind corpus stats computed from the METADATA columns only —
    the query pattern that makes the opaque-blob design pay off: the
    parquet scan must read kind + meta and never touch the payload
    column (column pruning; at 100 TB the payload is ~all the bytes,
    so the pruned scan is orders of magnitude cheaper). The plan is
    audited for exactly that (tests/test_plans.py: payload not in
    ReadSchema)."""
    return (
        media_lake.groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("meta.n_bytes").cast("bigint")).alias("total_bytes"),
            F.max("meta.width").alias("max_width"),
            F.max("meta.sample_rate").alias("max_sample_rate"),
        )
    )


def sql_metadata_stats() -> str:
    """DuckDB twin over the documents source (the media table derives
    deterministically from it: payload = utf-8 text bytes, kind =
    doc_id % 3, width only for images, sample_rate only for audio)."""
    return """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                                   WHEN 1 THEN 'audio'
                                   ELSE 'text' END AS kind,
                   octet_length(encode(text)) AS n_bytes,
                   CASE WHEN doc_id % 3 = 0 THEN n_chars % 1024 END AS width,
                   CASE WHEN doc_id % 3 = 1 THEN 16000 END AS sample_rate
            FROM documents
        )
        SELECT kind,
               COUNT(*) AS n_items,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(MAX(width) AS BIGINT) AS max_width,
               CAST(MAX(sample_rate) AS INT) AS max_sample_rate
        FROM media GROUP BY kind
    """


# 60 signature bits (a real DCT pHash is 64; 60 keeps every weight
# 1<<i inside signed BIGINT range in BOTH engines and divides evenly
# into the pigeonhole segments). Width is a SCALE parameter, not a
# tuning nicety: the banded join buckets on bits/(h+1)-bit segments,
# so expected bucket size is n / 2^(bits/(h+1)) — at the original 16
# bits the 5-bit segments gave 32 bucket values and candidate volume
# grew QUADRATICALLY with the corpus (measured 65x wall at a 10x SF
# soak); at 60 bits the 20-bit segments keep candidates ~linear until
# the corpus approaches 2^20 per skew bucket, and AQE skew-split
# carries it from there.
PHASH_BITS = 60
PHASH_MAX_HAMMING = 2
# every REENCODE_EVERY-th media item gets a "re-encoded" variant in
# the phash corpus (tail-byte edit) — the real-world same-image-
# different-encoder case a perceptual hash exists to catch
PHASH_REENCODE_EVERY = 11
PHASH_VARIANT_OFFSET = 1_000_000_000


def _phash_sig_expr(text_col: str) -> str:
    """Perceptual-hash stand-in with REAL pHash structure: the
    payload is cut into PHASH_BITS equal blocks and bit i is a
    1-bit feature (md5 parity) of block i — the block-feature layout
    of an actual DCT pHash, so a local payload edit flips only the
    bits of the touched blocks and near-exact payloads land within
    small hamming, while unrelated payloads differ on ~half the
    bits. Engine-neutral string math — the SAME expression string
    parses in Spark SQL and DuckDB, so the oracle replays it
    verbatim. A real deployment swaps this for the true DCT-median
    inside the decode kernel; the banded join is unchanged."""
    b = (
        f"CAST(greatest(1, ceil(length({text_col}) / {PHASH_BITS}.0)) AS INT)"
    )
    return " + ".join(
        f"(CASE WHEN instr('89abcdef', substring(md5(substring({text_col}, "
        f"{i} * {b} + 1, {b})), 1, 1)) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(PHASH_BITS)
    )


def attach_reencodes(
    media: DataFrame, every: int = PHASH_REENCODE_EVERY
) -> DataFrame:
    """(media_id, payload_text): the media corpus plus a re-encoded
    VARIANT of every ``every``-th item — payload identical except the
    final byte (what a lossless re-encode or metadata rewrite does to
    a blob's tail). Variants take media_id + PHASH_VARIANT_OFFSET.
    This is the planted ground truth the phash join must recover:
    each (original, variant) pair differs in exactly one signature
    block."""
    base = media.selectExpr(
        "media_id", "CAST(payload AS STRING) AS payload_text"
    )
    variants = (
        base.filter(F.col("media_id") % every == 0)
        .filter(F.length("payload_text") >= 1)
        .selectExpr(
            f"media_id + {PHASH_VARIANT_OFFSET} AS media_id",
            "concat(substring(payload_text, 1, length(payload_text) - 1), "
            "'!') AS payload_text",
        )
    )
    return base.unionByName(variants)


def phash_signatures(media_text: DataFrame) -> DataFrame:
    """(media_id, phash): block-feature signature per media item
    (input: media_id, payload_text)."""
    return media_text.selectExpr(
        "media_id",
        f"CAST({_phash_sig_expr('payload_text')} AS BIGINT) AS phash",
    )


def phash_near_dups(
    media: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash hamming distance,
    via the generic pigeonhole banded join (operators/dedup.py
    banded_hamming_pairs — segment-bucket-local candidates, never an
    O(n^2) cross join; the identical shape dedups a billion-image
    corpus, with the signature table persisted once and the band join
    AQE-skew-split on hot buckets). The corpus is the media table
    plus its planted re-encode variants (attach_reencodes), and the
    expected result is exactly those (original, variant) pairs: a
    variant differs in one signature block -> hamming <= 1."""
    from uber_data_pipeline_spark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        phash_signatures(attach_reencodes(media)),
        PHASH_BITS,
        max_hamming,
        id_col="media_id",
        sig_col="phash",
    ).select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "hamming",
    )


def sql_phash_near_dups(max_hamming: int = PHASH_MAX_HAMMING) -> str:
    """DuckDB twin: the text IS the payload (attach_media encodes it
    utf-8 and the corpus is ASCII), so the re-encode construction and
    the block-feature signature expression replay verbatim."""
    return f"""
        WITH m AS (
            SELECT doc_id AS media_id, text AS payload_text
            FROM documents
            UNION ALL
            SELECT doc_id + {PHASH_VARIANT_OFFSET} AS media_id,
                   substring(text, 1, length(text) - 1) || '!'
                       AS payload_text
            FROM documents
            WHERE doc_id % {PHASH_REENCODE_EVERY} = 0
              AND length(text) >= 1
        ),
        sg AS (
            SELECT media_id,
                   CAST({_phash_sig_expr('payload_text')} AS BIGINT)
                       AS phash
            FROM m
        )
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        FROM sg a JOIN sg b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
    """
