"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs via
mapInPandas.

The decode step itself is STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (shape +
checksum from the bytes) exercises the real Spark-side plumbing —
schema, batching, partitioning, UDF signature — which is the part that
matters at 100 TB.

Design notes for scale:
  * binary payloads ride in parquet as BINARY; `spark.sql.files.
    maxPartitionBytes` keeps scan partitions bounded regardless of blob
    size skew.
  * mapInPandas streams Arrow batches — peak executor memory is one
    batch, not one partition.
  * feature extraction emits fixed-width struct/array columns so
    downstream joins/aggs stay columnar.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum string"
)
IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_intensity double, phash long"
)
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_checksum string"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: (media_id, kind, payload binary).
    Payload bytes are a pure function of (media_id, seed)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), 3) + 1).cast("int")).alias("kind"),
        F.encode(
            F.concat(
                F.lit("blob:"),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(f":{seed}")), 256),
                F.repeat(F.lit("x"), F.pmod(F.col("id") * 37, 256).cast("int")),
            ),
            "utf-8",
        ).alias("payload"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata without touching Python: size + checksum columnar."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("int").alias("n_bytes"),
        F.md5(F.col("payload")).alias("checksum"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float, int]:
    """Deterministic fake image decode: derive (w, h, c, mean, phash)
    from the bytes.  Stands in for PIL/cv2 — see module docstring."""
    import hashlib

    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 1 + h[2] % 3
    mean_intensity = sum(h) / (len(h) * 255.0)
    phash = int.from_bytes(h[8:16], "big", signed=True)
    return width, height, channels, mean_intensity, phash


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    With real decoders installed this is where PIL/torchvision would
    run; here the decode is stubbed (fake=True) or raises, but the
    executor-side batch shape is production-real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/cv2 (not in this container); "
                    "pass fake=True for the deterministic stub decoder"
                )
            rows = [
                (mid, *_fake_decode(bytes(payload)))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "mean_intensity", "phash",
                ],
            )

    imgs = df.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, fake: bool = False) -> DataFrame:
    """Frame-sample videos via mapInPandas: one output row per sampled
    frame (UDTF-shaped: rows out > rows in).  Stubbed decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires ffmpeg/cv2 (not in this container); "
                    "pass fake=True for the deterministic stub"
                )
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = 8 + data[-1] % 24 if data else 8
                for fi in range(0, n_frames, every_n):
                    # ASCII frame suffix keeps the fake checksum
                    # reproducible by any engine's md5(varchar)
                    fr = hashlib.md5(data + b":" + str(fi).encode()).hexdigest()
                    out.append((mid, fi, fr))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_checksum"]
            )

    vids = df.filter(F.col("kind") == "video").select("media_id", "payload")
    return vids.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
