"""Multimodal operator plumbing: Arrow-batched mapInPandas stages with
stable schemas, stubbed codecs (no PIL/ffmpeg in the container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kudu_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(256)) * (i + 1)) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_stub(b"\x89PNG")


def test_binary_stats(media):
    got = {r.doc_id: (r.n_bytes, r.est_frames) for r in MM.binary_stats(media).collect()}
    assert got[0] == (256, 256 % 7 + 1)
    assert got[9] == (2560, 2560 % 7 + 1)


def test_frame_sample_bytes_match_python(media):
    out = MM.frame_sample(media, k=4, frame_bytes=16).collect()
    assert len(out) == 40
    by_key = {(r.doc_id, r.frame_idx): r for r in out}
    payload = bytes(range(256)) * 3  # doc_id 2
    for i in range(4):
        r = by_key[(2, i)]
        off = i * len(payload) // 4
        assert r.frame_offset == off
        assert bytes(r.frame) == payload[off : off + 16]


def test_extract_features_schema_and_determinism(media):
    df = MM.extract_features(media)
    assert dict(df.dtypes) == {"doc_id": "bigint", "features": "array<float>"}
    a = {r.doc_id: r.features for r in df.collect()}
    b = {r.doc_id: r.features for r in df.collect()}
    assert a == b
    assert len(a[0]) == MM.FEATURE_DIM
    # doc 0 = bytes 0..255 -> 8 chunks of 32 with means 15.5, 47.5, ...
    assert a[0] == [15.5 + 32 * i for i in range(MM.FEATURE_DIM)]


def test_features_compose_with_ann(media, spark):
    """Stub features feed the similarity operators unchanged — the
    multimodal pipeline composes with ANN search end-to-end."""
    from kudu_spark.operators import similarity as SIM

    emb = MM.extract_features(media).select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = SIM.brute_force_topk(emb, query_ids=[0], k=3).collect()
    assert len(top) == 3
    assert all(r.query_id == 0 and r.neighbor_id != 0 for r in top)


def test_resize_stub(media):
    out = {r.doc_id: r for r in MM.resize_stub(media, 16, 8).collect()}
    assert all(len(bytes(r.payload)) == 128 for r in out.values())
    assert out[0].width == 16 and out[0].height == 8