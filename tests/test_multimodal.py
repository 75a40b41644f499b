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

def test_image_header_parser_units():
    """Header parser against hand-built container bytes (no codec)."""
    import struct

    from kudu_spark.operators.multimodal import _parse_image_header as p

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 123, 456) + b"\x08\x02\x00\x00\x00")
    assert p(png) == ("png", 123, 456, True)
    assert p(b"GIF87a" + struct.pack("<HH", 320, 200) + b"\0\0\0") == \
        ("gif", 320, 200, True)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 4
    assert p(bmp) == ("bmp", 640, 480, True)  # negative height = top-down
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof2 = (b"\xff\xc2" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9)
    assert p(b"\xff\xd8" + app0 + sof2) == ("jpeg", 640, 480, True)
    # corrupt / truncated payloads never raise
    assert p(b"") == ("unknown", None, None, False)
    assert p(b"\x89PNG\r\n\x1a")[3] is False
    assert p(b"\xff\xd8\xff\xe0\x00\x01") == ("jpeg", None, None, False)
    assert p(b"\xff\xd8" + app0) == ("jpeg", None, None, False)  # no SOF


def test_image_header_info_end_to_end(spark):
    """Synthesized payloads round-trip through the Arrow-batched
    parser; dimensions match the doc_id arithmetic the oracle uses,
    and corrupt rows surface as parse_ok=false instead of failing."""
    from kudu_spark.operators import multimodal as MM

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    out = MM.image_header_info(MM.synth_image_payloads(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 200
    for i, r in rows.items():
        if i % 37 == 0:
            assert (r.format, r.width, r.height, r.parse_ok) == \
                ("unknown", None, None, False)
        else:
            want = ["png", "gif", "jpeg"][i % 3]
            assert r.format == want, (i, r)
            assert (r.width, r.height) == (i % 640 + 16, i % 480 + 16)
            assert r.parse_ok


def test_audio_header_parser_units():
    import struct

    from kudu_spark.operators.multimodal import _parse_audio_header as p

    ch, rate, bits, frames = 2, 16000, 16, 25
    block = ch * bits // 8
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits))
    data = b"data" + struct.pack("<I", frames * block) + b"\x00" * (frames * block)
    body = b"WAVE" + b"LIST" + struct.pack("<I", 4) + b"INFO" + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert p(wav) == ("wav", 2, 16000, 16, 25, 1, True)
    assert p(b"RIFX\x00") == ("unknown", None, None, None, None, None, False)
    assert p(b"RIFF\x00\x00\x00\x00WAVE")[7 - 1] is False  # no chunks
    # odd-sized chunk: word alignment must not derail the walk
    odd = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    body2 = b"WAVE" + odd + fmt + data
    assert p(b"RIFF" + struct.pack("<I", len(body2)) + body2)[0] == "wav"


def test_audio_header_info_end_to_end(spark):
    from kudu_spark.operators import multimodal as MM

    docs = spark.range(120).select(F.col("id").alias("doc_id"))
    rows = {r.doc_id: r
            for r in MM.audio_header_info(MM.synth_audio_payloads(docs)).collect()}
    assert len(rows) == 120
    for i, r in rows.items():
        if i % 41 == 0:
            assert (r.format, r.parse_ok) == ("unknown", False)
        else:
            assert (r.format, r.channels, r.sample_rate, r.bits) == \
                ("wav", 1 + i % 2, 8000 << (i % 3), 16)
            assert r.n_frames == i % 50 + 1
            assert r.duration_ms == (i % 50 + 1) * 1000 // (8000 << (i % 3))
            assert r.parse_ok


def test_video_header_parser_edges():
    """ISO-BMFF parser edge cases beyond the oracle's synthetic
    corpus: 64-bit largesize boxes, size==0 (to end-of-file), moov
    without mvhd (track count but ok=False), truncated boxes, and
    raw garbage — parse to unknown/partials, never raise."""
    import struct

    from kudu_spark.operators.multimodal import _parse_video_header as p

    def box(t, b):
        return struct.pack(">I", 8 + len(b)) + t + b

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = box(b"mvhd", bytes([0, 0, 0, 0])
               + struct.pack(">IIII", 0, 0, 600, 3000))
    trak = box(b"trak", b"")

    assert p(ftyp + box(b"moov", mvhd + trak)) == (
        "mp4", "isom", 600, 5000, 1, True)
    # largesize moov
    body = mvhd + trak + trak
    big = (struct.pack(">I", 1) + b"moov"
           + struct.pack(">Q", 16 + len(body)) + body)
    assert p(ftyp + big) == ("mp4", "isom", 600, 5000, 2, True)
    # size==0: box runs to end of file
    zeroed = struct.pack(">I", 0) + b"moov" + mvhd + trak
    assert p(ftyp + zeroed) == ("mp4", "isom", 600, 5000, 1, True)
    # moov without mvhd: tracks counted, not ok (no timescale)
    fmt, brand, ts, dur, trk, ok = p(ftyp + box(b"moov", trak + trak))
    assert (fmt, brand, trk, ok) == ("mp4", "isom", 2, False)
    # truncated mid-box and garbage
    assert p((ftyp + box(b"moov", mvhd))[:20])[5] is False
    assert p(b"\x00\x01\x02") == ("unknown", None, None, None, None, False)
    assert p(b"") == ("unknown", None, None, None, None, False)
