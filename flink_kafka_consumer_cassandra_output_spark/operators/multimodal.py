"""Multimodal (binary media) columns: schema, plumbing, feature extraction.

Not in the reference (its payload is XML text; SURVEY.md north-star
extensions); required by the project brief: image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Python
(``mapInPandas``) -- the ONE place the engine deliberately leaves the
JVM-only policy, because codec work is inherently Python/native-library
territory.

The real decode step is STUBBED (:func:`decode_media` raises
``NotImplementedError``: no PIL/ffmpeg in this container).  Everything
around it is real and tested: the binary column synthesis, the Arrow batch
iteration, the output schema contract, and header-level features (byte
length, md5 digest, deterministic pseudo-dimensions) that are replicated by
a DuckDB oracle -- so the mapInPandas plumbing itself is correctness-gated,
not just smoke-tested.

Scale: mapInPandas streams Arrow batches (no per-row Python crossing, no
collect); the operator is narrow -- feature extraction shuffles nothing.
Real media at 100 TB would partition by (media_type, size-band) so decode
cost is uniform per task; the synthesized ``media_type`` column models that.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output contract of :func:`extract_media_features`.
MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary media column from the documents fixture:
    ``content`` = UTF-8 bytes of the text (deterministic, oracle-replicable
    via DuckDB ``encode``), ``media_type`` derived from ``source``."""
    return docs.select(
        "doc_id",
        F.concat(F.lit("application/x-fake-"), F.col("source")).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def decode_media(content: bytes, media_type: str):
    """Real codec decode -- deliberately stubbed.

    Production use would dispatch on ``media_type`` to PIL (images),
    soundfile/ffmpeg (audio), or a frame sampler (video); none of those
    libraries exist in this container, and faking pixel output would be
    worse than refusing.
    """
    raise NotImplementedError(
        f"decoding {media_type!r} requires codec libraries (PIL/ffmpeg) not "
        "present in this environment; use extract_media_features for "
        "header-level features"
    )


#: Output contract of :func:`sample_frames`.
FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_size: int = 64,
    stride: int = 4,
    max_frames: int = 8,
) -> DataFrame:
    """Deterministic frame sampling over an opaque binary column.

    The video-pipeline analog: treat ``content`` as an array of
    ``frame_size``-byte frames, keep every ``stride``-th frame up to
    ``max_frames`` per document, and emit one row per sampled frame with
    its offset, raw bytes, and digest.  Real video would let the (stubbed)
    codec find keyframes; the byte-slicing version exercises the exact
    plumbing that matters on Spark -- a 1->N Arrow-batched ``mapInPandas``
    (each input row fans out to multiple output rows inside one batch, no
    explode/shuffle), a ``binary`` output column, and a typed schema
    contract -- and is fully oracle-checkable.

    Scale: narrow operator; output size is bounded by
    ``max_frames x frame_size`` per document regardless of media size,
    which is what keeps a frame-sample stage's shuffle footprint flat when
    the inputs are multi-GB videos.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "sample_idx": [], "frame_offset": [],
                "frame_bytes": [], "frame_digest": [],
            }
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue  # NULL media: no frames (don't crash the stage)
                b = bytes(content)
                for k in range(max_frames):
                    off = k * stride * frame_size
                    if off >= len(b):
                        break
                    frame = b[off : off + frame_size]
                    out["doc_id"].append(doc_id)
                    out["sample_idx"].append(k)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(frame)
                    out["frame_digest"].append(hashlib.md5(frame).hexdigest())
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Header-level media features via Arrow-batched ``mapInPandas``.

    Features are chosen to be deterministic AND expressible in ANSI SQL, so
    the Python path itself is oracle-checked: byte length, md5 digest, and
    pseudo width/height derived from the byte length (stand-ins for the
    stubbed codec's real dimensions).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            n = content.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n.astype("int64"),
                    "digest": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "fake_width": (n % 640).astype("int32"),
                    "fake_height": ((n * 7) % 480).astype("int32"),
                }
            )

    return media.mapInPandas(batches, MEDIA_FEATURE_SCHEMA)
