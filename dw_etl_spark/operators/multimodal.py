"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns
with a metadata struct alongside. The Spark-side plumbing — schema,
partition sizing, Arrow-batched UDF signatures, batch shapes — is real
and tested. Codecs: ``functions/codecs.py`` provides REAL,
dependency-free decoders for uncompressed 24-bit BMP, PCM WAV, PNG
(stdlib zlib) and baseline JPEG (numpy DCT + hand-rolled Huffman) —
inject them as ``decode_fn=bmp_feature`` / ``resize_fn=resize_jpeg`` /
``decode_fn=wav_feature`` etc. Video containers (MP4) need libraries
this container lacks; for those, ``decode_fn=None`` uses a
deterministic fake, and a real decoder drops in unchanged.

Scale notes:
- Binary payloads dominate row size → cap ``maxPartitionBytes`` /
  repartition so one Arrow batch of blobs fits executor memory
  (``mapInPandas`` streams per-batch, never whole-partition).
- Metadata lives in ordinary columns, NOT inside the blob, so filters
  (e.g. ``width >= 64``) prune parquet row groups without touching
  payload bytes (parquet column pruning skips the blob column
  entirely).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mime", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def pack_documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: text bytes as an
    opaque payload (stands in for encoded image bytes) + metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a codec: fixed-width feature vector
    from byte statistics. Replace with a real decoder via ``decode_fn``."""
    if not payload:
        return [0.0] * dim
    return [
        round(payload[i % len(payload)] / 255.0, 6) for i in range(dim)
    ]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decode_fn: Callable[[bytes, int], list[float]] | None = None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract payloads via ``mapInPandas`` (Arrow
    batches of blobs — the real plumbing a codec UDF needs).

    ``decode_fn(payload_bytes, dim) -> list[float]`` is the injection
    point for a real image/audio decoder; default is the deterministic
    fake. A genuinely-unavailable codec should raise
    ``NotImplementedError`` from its ``decode_fn`` — the plumbing
    (schema, batching, partitioning) is identical either way.

    ``batch_size_hint`` bounds the rows decoded per pandas frame by
    slicing each incoming Arrow batch inside the UDF — a pure batch-
    shape control with NO driver action and NO shuffle of blob bytes
    (an earlier version repartitioned by ``count()/hint``, paying a
    full pass over the payload column plus a blob-sized exchange just
    to size partitions). Incoming batches are additionally capped by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; the hint tightens
    the decode working set below that when blobs are large.
    """
    import pandas as pd

    fn = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            step = max(batch_size_hint or len(pdf), 1)
            for i in range(0, len(pdf), step):
                chunk = pdf.iloc[i : i + step]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["n_bytes"],
                        "feature": [fn(p, dim) for p in chunk["payload"]],
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic codec stand-in: truncate/cycle payload to w*h bytes
    (a real implementation decodes, resamples, re-encodes)."""
    target = width * height
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` — 1:1 row mapping with
    payload rewrite and metadata update. ``resize_fn(payload, w, h) ->
    bytes`` injects a real codec (raise ``NotImplementedError`` there if
    genuinely absent); default is the deterministic fake."""
    import pandas as pd

    fn = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [fn(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def _fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: n equal chunks."""
    if not payload:
        return [b""] * n_frames
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    sample_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Sample frames from video payloads — a 1:N flat-map via
    ``mapInPandas`` (each input row yields ``n_frames`` output rows).
    The fan-out happens inside the Arrow batch, so downstream
    partitioning sees frame-sized rows, not whole-video blobs."""
    import pandas as pd

    fn = sample_fn or _fake_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in enumerate(fn(payload, n_frames)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "payload": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-relational metadata pass (no payload decode): per kind,
    count / total / min / max payload bytes + content digest sample.
    Runs entirely on metadata columns → blob column never read when
    the source is parquet with column pruning."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
