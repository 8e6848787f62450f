"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct
(media_type, width/height or sample_rate, codec). The Spark-side plumbing
— schema, partition-aware batching, Arrow-batched ``mapInPandas`` UDF
signatures — is real and tested, and since round 6 so is the decode:

- ``decode_stub=False`` runs REAL decodes (``multimodal/decode.py``:
  PIL when importable, built-in pure-stdlib PNG and WAV codecs
  otherwise) — feature extraction and resize over genuine media bytes,
  identical schemas to the stub path (pinned in tests). Only video
  container parsing remains a NotImplementedError hook.
- ``decode_stub=True`` produces a deterministic fake feature vector from
  the payload bytes — the declared oracle queries keep this path (their
  synthetic payloads are text bytes, not real media, and DuckDB can
  recompute the fake exactly).

Scale notes: payloads never pass through Python row-at-a-time — Arrow
batches carry them into pandas; frame-sample/resize return *new* binary
columns so downstream stages stay columnar. Partition sizing matters more
than usual here (payloads are MBs, not bytes): repartition by a size-aware
key before heavy decode so one straggler partition doesn't hold the stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

# features are float64: the values stay bit-identical to an independent
# recomputation (the DuckDB oracle), which float32 storage would break
_FEATURES_FIELDS = "media_id bigint, media_type string, n_bytes int, features array<double>"


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic media table over ``documents`` (testdata has
    no binary column): payload = UTF-8 bytes of the text, media_type cycles
    by doc_id. Lets the mapInPandas decode pipeline run under the driver's
    oracle gate — the DuckDB twin recomputes the same features from the
    text chars (pure-ASCII corpus, so char codes == payload bytes)."""
    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    return ensure_parallel(documents).select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decode→embed path: byte-histogram
    moments (sum of bytes at positions ≡ i mod FEATURE_DIM, normalized).
    Vectorized with numpy — the integer sums are exact, so the values stay
    bit-identical to the per-byte Python loop the DuckDB oracle mirrors.
    Replace with a real decoder when codec libs are available."""
    import numpy as np

    if payload is None:
        return [0.0] * FEATURE_DIM
    n = max(len(payload), 1)
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    pad = (-len(a)) % FEATURE_DIM
    if pad:
        a = np.concatenate([a, np.zeros(pad, np.int64)])
    sums = a.reshape(-1, FEATURE_DIM).sum(axis=0)
    return (sums / (255.0 * n)).tolist()


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """binary payloads → fixed-width feature vectors via mapInPandas.

    Arrow moves whole partitions as pandas batches; the UDF is pure
    per-batch (no driver state), so the operator scales with partition
    count. ``decode_stub=False`` (round 6) runs the REAL decode
    (``multimodal/decode.py``: PIL when importable, built-in PNG/WAV
    codecs otherwise — image → luminance histogram, audio → segment
    RMS, video → temporal luminance profile over concatenated-frame
    MJPEG/MPNG containers — round 7) over genuine payload bytes;
    identical output schema, pinned stub-vs-real by
    tests/test_multimodal.py. The declared oracle queries keep the stub
    (their synthetic payloads are not real media). MJPEG pixel decode
    still needs PIL (capability gate); MPNG and all frame SPLITTING are
    pure stdlib."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            from page_rank_hadoop_spark.multimodal.decode import real_features
        for pdf in batches:
            if decode_stub:
                feats = pdf["payload"].map(_fake_features)
            else:
                feats = [
                    real_features(b, t)
                    for b, t in zip(pdf["payload"], pdf["media_type"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(op, schema=_FEATURES_FIELDS)


def resize_media(media: DataFrame, factor: int = 4, decode_stub: bool = True) -> DataFrame:
    """Resize/downsample: binary payload → NEW smaller binary payload via
    mapInPandas (every ``factor``-th byte in the stub). The Spark-side
    plumbing is the real thing — Arrow batches of binary in AND out, new
    payload column, same partitioning; with ``decode_stub=False`` the
    byte-stride IS a real decoder+resampler (round 6:
    ``decode.real_resize`` — PNG nearest-neighbor decimation, WAV frame
    decimation at rate/factor). Output rows are 1:1 with input (no
    explode), so the operator is map-only at any scale.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            from page_rank_hadoop_spark.multimodal.decode import real_resize
        for pdf in batches:
            if decode_stub:
                out = pdf["payload"].map(
                    lambda b: None if b is None else bytes(b[::factor])
                )
            else:
                # real path (round 6): decode → downsample → re-encode
                # (PNG nearest-neighbor / WAV frame decimation)
                out = [
                    real_resize(b, t, factor)
                    for b, t in zip(pdf["payload"], pdf["media_type"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return media.mapInPandas(op, schema="media_id bigint, media_type string, payload binary")


def frame_sample(
    media: DataFrame,
    every_n_bytes: int = 1024,
    frame_len: int = 64,
    decode_stub: bool = True,
) -> DataFrame:
    """Video-style frame sampling. Stub (default, the oracle path): pure
    column expressions slicing the payload every N bytes into
    fixed-length binary 'frames' (explode). ``decode_stub=False``
    (round 7): REAL container-frame extraction — ``decode.
    split_video_frames`` walks the concatenated-frame structure (MJPEG
    JPEG-segment walk / MPNG chunk walk, both pure stdlib) inside the
    same Arrow-batched mapInPandas shape as the other real-decode ops,
    emitting one row per actual frame with its full bytes. Output
    schema is identical either way; only frame boundaries differ."""
    if not decode_stub:

        def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from page_rank_hadoop_spark.multimodal.decode import (
                split_video_frames,
            )

            for pdf in batches:
                ids, nos, frs = [], [], []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    if payload is None:
                        continue
                    for i, fr in enumerate(split_video_frames(bytes(payload))):
                        ids.append(mid)
                        nos.append(i)
                        frs.append(fr)
                yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frs})

        return media.mapInPandas(
            op, schema="media_id bigint, frame_no int, frame binary"
        )
    n_frames = F.greatest((F.length("payload") / every_n_bytes).cast("int"), F.lit(1))
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substr(F.col("payload"), i * every_n_bytes + 1, F.lit(frame_len)),
    )
    return media.select(
        "media_id",
        F.posexplode(frames).alias("frame_no", "frame"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-type payload stats — metadata-only (never touches payload bytes
    beyond length, which parquet serves from column stats at scale)."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )


def media_near_dup(
    media: DataFrame,
    grid: int = 200,
    max_l2: float = 0.002,
    decode_stub: bool = True,
) -> DataFrame:
    """Near-duplicate media pairs by feature distance: payloads →
    feature vectors (the decode pipeline), 4dp-rounded (the declared
    feature contract), BLOCKED on (media_type, grid cell of the first
    two feature dims), then L2-verified within blocks — multimodal
    dedup with the same candidate-then-verify shape as the text side.
    Exact byte-duplicates land at distance 0 and are included.

    Boundary completeness (round-6 ADVICE fix): a true pair within
    ``max_l2`` can STRADDLE a cell boundary (cell width 1/grid=0.005 >
    max_l2=0.002, so neighbors differ by at most ONE cell per dim) —
    side B therefore explodes into its 3×3 cell neighborhood and side A
    keeps its home cell. Any qualifying pair matches in EXACTLY one
    offset combination (A's home cell is a single point of B's
    neighborhood), so no post-join dedup is needed, and recall is exact
    for any ``max_l2 <= 1/grid``. Candidate cost is 9× one join side's
    key stream — still block-local, never all-pairs.

    Scale shape: feature extraction is the existing Arrow mapInPandas
    map pass; the self-join keys on the block (never all-pairs
    corpus-wide); the verify is 8 multiply-adds per candidate. Blocking
    selectivity depends on feature spread — production would widen the
    key to more dims or LSH the full vector (see similarity.py) when a
    cell grows hot; the synthetic-corpus features cluster, which the
    test pins as the worst case. Engine determinism: 4dp features, L2
    accumulated in Spark's left-fold order (the oracle writes the
    nested additions explicitly), sqrt of identical doubles.
    """
    feats = extract_features(media, decode_stub=decode_stub)
    f4 = feats.select(
        "media_id",
        "media_type",
        F.transform("features", lambda x: F.round(x, 4)).alias("f"),
    )
    keyed = f4.select(
        "media_id",
        "media_type",
        "f",
        F.floor(F.element_at("f", 1) * grid).cast("long").alias("c0"),
        F.floor(F.element_at("f", 2) * grid).cast("long").alias("c1"),
    )
    a = keyed.select(
        F.col("media_id").alias("media_id_a"),
        "media_type",
        "c0",
        "c1",
        F.col("f").alias("fa"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(d0).alias("d0"), F.lit(d1).alias("d1"))
            for d0 in (-1, 0, 1)
            for d1 in (-1, 0, 1)
        ]
    )
    b = (
        keyed.select(
            F.col("media_id").alias("media_id_b"),
            "media_type",
            "c0",
            "c1",
            F.col("f").alias("fb"),
            F.explode(offsets).alias("d"),
        )
        .select(
            "media_id_b",
            "media_type",
            (F.col("c0") + F.col("d.d0")).alias("c0"),
            (F.col("c1") + F.col("d.d1")).alias("c1"),
            "fb",
        )
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with("fa", "fb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.join(b, ["media_type", "c0", "c1"])
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .select(
            "media_id_a",
            "media_id_b",
            "media_type",
            F.round(l2, 6).alias("l2"),
        )
        .filter(F.col("l2") <= max_l2)
    )
