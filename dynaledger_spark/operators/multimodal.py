"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern (training-data pipeline north star; the reference has no media
surface): media travels as a `binary` column with typed metadata beside
it; decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages with explicit output schemas.

CODEC NOTICE: real codecs (PIL / soundfile) load behind an import-try
and are used automatically when (a) the library is present AND (b) the
bytes actually parse as that medium; every row reports which path
produced it in the `decoder` column ('pil' / 'soundfile' / 'stub').
Content that fails to parse — including the synthetic media table, whose
`content` is utf-8 text — falls back to the DETERMINISTIC FAKE decoder
(`_fake_decode`) whose arithmetic is simple enough to mirror in ANSI
SQL. So the *plumbing* — schema, batch shape, partitioning, row
expansion — is fully exercised and oracle-checked in any environment
(the oracle pins decoder='stub' because text bytes never parse), while a
user with real media and codecs gets real dimensions with no code
change.

Scale posture: mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch) — executors never hold a
partition of raw media in memory at once; binary columns stay opaque to
the JVM, so shuffles move bytes, not decoded frames. Partition by a
content-hash bucket when media skew is possible (one 4 GB video must not
pin a task): `repartition(n, media_id)` before the decode stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as _np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image

    _HAVE_PIL = True
except ImportError:
    Image = None
    _HAVE_PIL = False

try:  # pragma: no cover - not installed in this container
    import soundfile

    _HAVE_SOUNDFILE = True
except ImportError:
    soundfile = None
    _HAVE_SOUNDFILE = False

_MOD = 2_147_483_648  # 2^31: keeps checksums in signed-64 everywhere

KINDS = ("image", "audio", "video")
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feat_idx", T.IntegerType()),
        T.StructField("feat", T.DoubleType()),
    ]
)


def synthesize_media(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake media table from the documents corpus.

    content = utf-8 bytes of the text; kind cycles image/audio/video by
    id; duration_ms = n_chars*10. Exists so the multimodal stages have a
    driver-testdata input with an exact SQL mirror.
    """
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    fmt = F.when(kind == "image", "png").when(kind == "audio", "wav").otherwise("mp4")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        fmt.alias("fmt"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        (F.length(F.col(text_col)).cast("long") * 10).alias("duration_ms"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a codec: (n_bytes, width, height, checksum).

    Treats the bytes as utf-8 text and folds codepoints — chosen so a SQL
    oracle can reproduce it exactly. Replace with PIL/soundfile parsing
    when the real libraries exist; the signature is the contract.

    The codepoint fold runs vectorized: a UTF-32-LE re-encode is exactly
    one uint32 per codepoint, so numpy sums the same integers the old
    per-character Python loop did (guide §4.2 — this generator loop was
    the whole decode stage's hot path: ~5-10M interpreted ops per 5k-doc
    batch set). Codepoints are < 2^21 and docs are < 2^40 bytes, so the
    int64 accumulator cannot overflow.
    """
    n_bytes = len(content)
    s = content.decode("utf-8", errors="replace")
    first_cp = ord(s[0]) if s else 0
    width = n_bytes % 640 + 16
    height = (first_cp * 7) % 480 + 16
    cps = _np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
    checksum = int(cps.sum(dtype="int64")) % _MOD
    return n_bytes, width, height, checksum


def _decode_one(kind: str, content: bytes) -> tuple[int, int, int, int, str]:
    """(n_bytes, width, height, checksum, decoder) for one media blob.

    Tries the real codec for the claimed kind first (when the library is
    importable AND the bytes parse); anything else — missing library,
    wrong/corrupt bytes, unhandled kind — falls back to the
    deterministic stub, so the function is total and the output schema
    is identical on both paths. The checksum on real paths is the byte
    sum (cheap, order-independent of the codec), on the stub path the
    codepoint fold the SQL oracle mirrors.
    """
    if kind == "image" and _HAVE_PIL:
        try:  # pragma: no cover - exercised only where PIL exists
            import io as _io

            with Image.open(_io.BytesIO(content)) as img:
                w, h = img.size
            return len(content), int(w), int(h), sum(content) % _MOD, "pil"
        except Exception:
            pass
    if kind == "audio" and _HAVE_SOUNDFILE:
        try:  # pragma: no cover - exercised only where soundfile exists
            import io as _io

            info = soundfile.info(_io.BytesIO(content))
            return (
                len(content),
                int(info.channels),
                int(info.samplerate),
                sum(content) % _MOD,
                "soundfile",
            )
        except Exception:
            pass
    return (*_fake_decode(content), "stub")


def decode_media(media: DataFrame) -> DataFrame:
    """Binary → typed metadata, one output row per media row (mapInPandas).

    Auto-upgrades per row: real codec where available and parseable,
    deterministic stub otherwise; the `decoder` column reports which."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_one(k, bytes(c))
                for k, c in zip(pdf["kind"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "fmt": pdf["fmt"].to_numpy(),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "checksum": [d[3] for d in decoded],
                    "duration_ms": pdf["duration_ms"].to_numpy(),
                    "decoder": [d[4] for d in decoded],
                }
            )

    return media.mapInPandas(stage, schema=DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize dims. Pure integer arithmetic → kept as
    JVM expressions (no Python needed once metadata is columnar)."""
    m = F.greatest("width", "height")
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.floor(F.col("width") * target / m).cast("int").alias("out_w"),
        F.floor(F.col("height") * target / m).cast("int").alias("out_h"),
    )


def sample_frames(decoded: DataFrame, fps_ms: int = 1000) -> DataFrame:
    """Video rows → one row per sampled frame (row expansion in mapInPandas).

    Demonstrates the 1→N batch shape: a real implementation would emit
    decoded frame tensors; the fake emits (idx, ts, checksum+idx).
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            # vectorized 1→N expansion: same integers the per-row loop
            # produced, computed as whole-batch numpy ops (guide §4.2)
            n = vids["duration_ms"].to_numpy(dtype="int64") // fps_ms + 1
            total = int(n.sum())
            starts = _np.cumsum(n) - n
            fidx = _np.arange(total, dtype="int64") - _np.repeat(starts, n)
            yield pd.DataFrame(
                {
                    "media_id": _np.repeat(
                        vids["media_id"].to_numpy(dtype="int64"), n
                    ),
                    "frame_idx": fidx.astype("int32"),
                    "frame_ts_ms": fidx * fps_ms,
                    "frame_checksum": (
                        _np.repeat(vids["checksum"].to_numpy(dtype="int64"), n)
                        + fidx
                    )
                    % _MOD,
                }
            )

    return decoded.mapInPandas(stage, schema=FRAMES_SCHEMA)


def extract_features(decoded: DataFrame, dim: int = 8) -> DataFrame:
    """Fake feature extractor: dim pseudo-features per media row, exploded
    to (media_id, feat_idx, feat) so results stay scalar-typed for exact
    comparison. A real extractor would return array<float> embeddings."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = _np.arange(dim, dtype="int64")
        for pdf in batches:
            # vectorized: chk < 2^31 and (i+31) <= dim+30, so the int64
            # products are exact — identical values to the per-row loop
            chks = pdf["checksum"].to_numpy(dtype="int64")
            feat_idx = _np.tile(idx, len(pdf))
            yield pd.DataFrame(
                {
                    "media_id": _np.repeat(
                        pdf["media_id"].to_numpy(dtype="int64"), dim
                    ),
                    "feat_idx": feat_idx.astype("int32"),
                    "feat": (
                        (_np.repeat(chks, dim) * (feat_idx + 31)) % 1000
                    )
                    / 1000.0,
                }
            )

    return decoded.mapInPandas(stage, schema=FEATURES_SCHEMA)
