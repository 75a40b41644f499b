"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` payload columns + typed metadata,
processed with Arrow-batched ``mapInPandas`` — the schema, batching,
partitioning and UDF signatures are the real production plumbing; only
the codec calls themselves (PIL/ffmpeg are not in this container) are
stubbed behind ``decode_stub`` / a deterministic fake so every stage
is testable end-to-end.

Scale notes (100 TB of media):
  - mapInPandas streams Arrow batches — no row-at-a-time Python, and
    memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    (payloads never accumulate per task).
  - Every operator is schema-stable (explicit output DDL) so Catalyst
    can prune/pushdown around the Python stage.
  - Frame sampling fans out rows; downstream shuffles key on
    (doc_id, frame_idx) — never payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def decode_stub(payload: bytes, fmt: str = "image"):
    """Where PIL.Image.open / av.open would run. Kept as a hard stub:
    the container has no codecs; swap in a real decoder in prod."""
    raise NotImplementedError("media codecs unavailable in this environment")


def binary_stats(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Cheap metadata pass (JVM-side, no Python): byte size + a
    deterministic stand-in for container-probed frame counts."""
    n = F.octet_length(F.col(payload_col))
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_bytes"),
        (n % 7 + 1).cast("bigint").alias("est_frames"),
    )


def frame_positions(df: DataFrame, k: int = 4, payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """Frame-sample planning: k byte offsets per payload,
    offset_i = floor(i * n_bytes / k). Pure JVM expression — the
    planning stage shuffles no payloads."""
    n = F.octet_length(F.col(payload_col)).cast("bigint")
    return (
        df.select(F.col(id_col), n.alias("n_bytes"))
        .select(
            id_col,
            "n_bytes",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            (F.col("frame_idx") * F.col("n_bytes") / k).cast("bigint").alias("frame_offset"),
        )
    )


def frame_sample(df: DataFrame, k: int = 4, frame_bytes: int = 16,
                 payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Extract k fixed-size byte windows per payload (the video
    frame-sampling shape: seek + decode per sampled timestamp) via
    Arrow-batched mapInPandas. The 'decode' is a byte slice — a real
    impl calls the codec at each offset with identical plumbing."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(k):
                    off = i * len(b) // k
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(b[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return src.mapInPandas(
        sample, "doc_id long, frame_idx int, frame_offset long, frame binary"
    )


def extract_features(df: DataFrame, dim: int = FEATURE_DIM,
                     payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction plumbing (stub embedding): a deterministic
    dim-float vector per payload — byte histogram moments where a real
    impl runs the vision/audio model over the decoded media. Output
    schema matches the embeddings table (array<float>), so downstream
    ANN/dedup operators compose directly."""
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                if a.size == 0:
                    vecs.append([0.0] * dim)
                    continue
                chunks = np.array_split(a.astype(np.float32), dim)
                vecs.append([float(c.mean()) if c.size else 0.0 for c in chunks])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": vecs})

    return src.mapInPandas(feats, "doc_id long, features array<float>")


def resize_stub(df: DataFrame, width: int, height: int,
                payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Image-resize plumbing: schema/batching identical to a real
    resize; the pixel op is stubbed (no PIL) as a deterministic
    truncate-or-pad to width*height bytes."""
    import pandas as pd

    target = width * height
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = [bytes(p)[:target].ljust(target, b"\0") for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": out,
                "width": width,
                "height": height,
            })

    return src.mapInPandas(
        resize, "doc_id long, payload binary, width int, height int"
    )
