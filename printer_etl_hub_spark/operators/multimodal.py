"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` column plus typed metadata — the
standard Spark layout for petabyte media corpora (payloads stay columnar in
parquet; only the batches being decoded materialize in Python).

The decode/feature kernels run through ``mapInPandas`` so bytes cross the
JVM→Python boundary once per Arrow batch, not per row. The actual codec
calls are STUBBED (no PIL/ffmpeg in this container): `decode_fake` derives
deterministic pseudo-metadata from the bytes so the plumbing — schema,
batching, partition sizing — is real and testable; swap `_decode_image`
for a real codec in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage (DDL string for mapInPandas).
DECODE_SCHEMA = (
    "media_id bigint, byte_len int, content_md5 string, "
    "width int, height int, n_frames int, format string"
)


def _decode_image(media_id: int, payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake metadata from the bytes.

    Real implementation would call PIL/libav here; the container has no
    media libs, so we derive stable pseudo-dimensions instead. The Spark-side
    contract (one dict per media row, fixed keys) is the real interface.
    """
    n = len(payload)
    return {
        "media_id": media_id,
        "byte_len": n,
        "content_md5": __import__("hashlib").md5(payload).hexdigest(),
        "width": 64 + (n % 577),
        "height": 64 + (n % 433),
        "n_frames": 1 + (n % 7),
        "format": "fake/%d" % (n % 3),
    }


def decode_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Run the (stubbed) decode kernel over a binary column, Arrow-batched.

    Input: any frame with (id_col bigint, payload_col binary).
    Output: DECODE_SCHEMA. Partitioning note: media rows are wide — size
    ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits in the
    Python worker; repartition upstream if payloads are >100 MB each.
    """
    src = df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_image(int(i), bytes(p) if p is not None else b"")
                for i, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, n_frames_col: str, every: int = 2) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    Pure relational explode — the frame *selection* needs no Python at all;
    only the eventual pixel decode does.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )


RESIZE_SCHEMA = (
    "media_id bigint, payload binary, width int, height int, resized boolean"
)


def resize_media(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Resize stage plumbing: binary in → binary out, Arrow-batched.

    The pixel kernel is STUBBED (no PIL here): output bytes are a
    deterministic truncation/pad of the input sized to target_w*target_h/64,
    so batch shapes and memory behavior match a real resize. Swap the body
    for PIL/torchvision in production; the plan (partition-parallel
    mapInPandas, binary columns, no collect) is the real thing.
    """
    out_len = max(1, target_w * target_h // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                resized = (b * (out_len // max(1, len(b)) + 1))[:out_len] if b else b""
                rows.append(
                    {
                        "media_id": int(mid),
                        "payload": resized,
                        "width": target_w,
                        "height": target_h,
                        "resized": bool(b),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(run, schema=RESIZE_SCHEMA)


FEATURES_SCHEMA = "media_id bigint, embedding array<float>"


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, dim: int = 16
) -> DataFrame:
    """Feature-extraction stage: binary → array<float> embedding.

    Kernel STUBBED with a deterministic md5-seeded pseudo-embedding (unit
    scale), so the output feeds the REAL similarity operators
    (cosine_topk_bruteforce / sign_lsh_pairs / ivf_topk) in tests — the
    full media→embedding→ANN pipeline shape without an ML runtime.
    """
    import hashlib
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                vec = []
                for i in range(dim):
                    h = hashlib.md5(b + i.to_bytes(2, "big")).digest()
                    (u,) = struct.unpack(">I", h[:4])
                    vec.append((u / 0xFFFFFFFF) * 2.0 - 1.0)
                rows.append({"media_id": int(mid), "embedding": vec})
            yield pd.DataFrame(rows)

    return df.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(run, schema=FEATURES_SCHEMA)
