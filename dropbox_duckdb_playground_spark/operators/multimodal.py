"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Model: media travels as an opaque ``binary`` column plus a typed metadata
struct — the layout used by public web-scale dataset pipelines
(img2dataset/WebDataset-style):

    content: binary, meta: struct<modality:string, mime:string,
    width:int, height:int, duration_ms:bigint>

Decode / feature-extraction run as Arrow-batched `mapInPandas` stages so
the heavy per-item work scales with partitions and never touches the
driver. The codecs are pluggable: the defaults try PIL with a lazy
worker-side import and fall back to a clearly-marked deterministic fake
when it isn't installed (this container ships no image libs), so the
Spark-side plumbing (schema, batching, partitioning) is real and tested
everywhere and a cluster image with PIL gets real decodes with zero code
change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def attach_media_meta(
    df: DataFrame,
    modality: str,
    mime: str,
    content_col: str = "content",
) -> DataFrame:
    """Wrap raw bytes with the typed metadata struct (dims unknown until
    decode)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ),
    )


def fake_image_decode(content: bytes) -> dict:
    """Deterministic stand-in for a real image decoder (PIL not in this
    container). Derives stable pseudo-dimensions and a 4-dim feature
    vector from the content digest — replace with a real codec via the
    ``decode_fn`` parameter of `decode_features`."""
    if content is None:
        raise NotImplementedError("real image decode requires PIL/ffmpeg")
    digest = hashlib.md5(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = [b / 255.0 for b in digest[2:6]]
    return {"width": width, "height": height, "features": feats}


def pil_image_decode(content: bytes) -> dict:
    """Real image decode via PIL (imported lazily, worker-side): true
    dimensions plus a 4-dim feature vector (normalized mean R/G/B +
    luminance of a 32x32 thumbnail). Raises ImportError when PIL is not
    installed — see `default_image_decode` for the fallback wiring."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(content))
    width, height = img.size
    thumb = img.convert("RGB")
    thumb.thumbnail((32, 32))
    px = list(thumb.getdata())
    n = max(len(px), 1)
    r = sum(p[0] for p in px) / (255.0 * n)
    g = sum(p[1] for p in px) / (255.0 * n)
    b = sum(p[2] for p in px) / (255.0 * n)
    lum = 0.2126 * r + 0.7152 * g + 0.0722 * b
    return {"width": width, "height": height, "features": [r, g, b, lum]}


def default_image_decode(content: bytes) -> dict:
    """PIL when importable, the deterministic fake otherwise — so the
    same pipeline code runs real decodes on a cluster image that ships
    PIL and stays testable in codec-less environments."""
    try:
        return pil_image_decode(content)
    except ImportError:
        return fake_image_decode(content)


def decode_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] = default_image_decode,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched decode + feature extraction:
    (media_id, width, height, features array<double>).

    Scale: pure map-side; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so a partition of
    high-resolution blobs doesn't OOM the Python worker."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "features": []}
            # column-wise zip, not iterrows (which builds a Series per row)
            for mid, content in zip(pdf[id_col].values, pdf[content_col].values):
                d = decode_fn(content)
                rows["media_id"].append(mid)
                rows["width"].append(d["width"])
                rows["height"].append(d["height"])
                rows["features"].append(d["features"])
            yield pd.DataFrame(rows)

    return media.select(id_col, content_col).mapInPandas(
        run,
        schema="media_id bigint, width int, height int, features array<double>",
    )


def fake_image_resize(content: bytes, width: int, height: int) -> dict:
    """Deterministic stand-in for a real resize (PIL not in this
    container): returns a stable digest-derived payload tagged with the
    target dims. Replace via the ``resize_fn`` parameter of
    `resize_images`."""
    if content is None:
        raise NotImplementedError("real image resize requires PIL")
    digest = hashlib.md5(content + f"{width}x{height}".encode()).digest()
    return {"content": digest, "width": width, "height": height}


def pil_image_resize(content: bytes, width: int, height: int) -> dict:
    """Real resize via PIL (lazy worker-side import): re-encodes to PNG
    at the target dims. Raises ImportError without PIL."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(content)).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return {"content": buf.getvalue(), "width": width, "height": height}


def default_image_resize(content: bytes, width: int, height: int) -> dict:
    """PIL when importable, deterministic fake otherwise."""
    try:
        return pil_image_resize(content, width, height)
    except ImportError:
        return fake_image_resize(content, width, height)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], dict] = default_image_resize,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched resize stage: (media_id, content binary, width, height).

    Same scale shape as `decode_features`: map-side only, Arrow batch
    transfer, pluggable codec. The default resolves PIL per worker and
    falls back to the fake, keeping the plumbing (schema, batching,
    binary round-trip) real and testable everywhere."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "content": [], "width": [], "height": []}
            for mid, content in zip(pdf[id_col].values, pdf[content_col].values):
                d = resize_fn(content, width, height)
                rows["media_id"].append(mid)
                rows["content"].append(d["content"])
                rows["width"].append(d["width"])
                rows["height"].append(d["height"])
            yield pd.DataFrame(rows)

    return media.select(id_col, content_col).mapInPandas(
        run, schema="media_id bigint, content binary, width int, height int"
    )


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    given per-item duration metadata — the explode that fans a video into
    decode tasks. The actual frame extraction is the pluggable decode
    stage; this produces the distributed work list."""
    return media.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
