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


# ---------------------------------------------------------------------------
# Container-header parsing (REAL, no codec needed)
# ---------------------------------------------------------------------------

IMAGE_HEADER_DDL = ("doc_id long, format string, width int, height int, "
                    "parse_ok boolean")


def _parse_image_header(b: bytes):
    """(format, width, height, ok) from container magic + header bytes
    — pure byte arithmetic, the part of image metadata that needs no
    pixel codec. Formats: PNG (IHDR), GIF (logical screen descriptor),
    BMP (DIB), JPEG (marker walk to SOFn). Truncated or unrecognized
    payloads parse to ('unknown', None, None, False) instead of
    raising: corpus sweeps must survive corrupt media rows."""
    try:
        if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return ("png", w, h, True)
        if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            return ("gif", w, h, True)
        if len(b) >= 26 and b[:2] == b"BM":
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return ("bmp", abs(w), abs(h), True)
        if len(b) >= 4 and b[:2] == b"\xff\xd8":
            # JPEG: walk marker segments to the first SOFn frame header
            sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in sof:
                    if i + 9 <= len(b):
                        h = int.from_bytes(b[i + 5:i + 7], "big")
                        w = int.from_bytes(b[i + 7:i + 9], "big")
                        return ("jpeg", w, h, True)
                    break
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seg = int.from_bytes(b[i + 2:i + 4], "big")
                if seg < 2:
                    break
                i += 2 + seg
            return ("jpeg", None, None, False)
    except Exception:
        pass
    return ("unknown", None, None, False)


def image_header_info(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide image metadata WITHOUT decoding a pixel: sniff the
    container magic and parse dimensions straight from the header
    bytes (PNG IHDR, GIF screen descriptor, BMP DIB, JPEG SOFn marker
    walk). This is the production pre-filter for a multimodal training
    pipeline — bucket/filter by (format, width, height) BEFORE paying
    any codec cost, so the expensive decode stage (stubbed here, see
    decode_stub) runs only on rows that survive.

    Arrow-batched mapInPandas: only (id, payload) cross the Python
    boundary, output schema is explicit so Catalyst prunes around the
    stage, and per-row work is O(header bytes) regardless of payload
    size."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            fmts, ws, hs, oks = [], [], [], []
            for payload in pdf["payload"]:
                fmt, w, h, ok = _parse_image_header(
                    bytes(payload) if payload is not None else b"")
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                oks.append(ok)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "format": fmts,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "parse_ok": oks,
            })

    return src.mapInPandas(parse, IMAGE_HEADER_DDL)


def synth_image_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake image payloads for tests/oracles: doc_id
    picks the container (png/gif/jpeg round-robin; every 37th row is
    garbage) and the dimensions (width = id % 640 + 16, height =
    id % 480 + 16), so an independent oracle can derive what the
    header PARSER must return from doc_id arithmetic alone. Headers
    are structurally valid for their formats — the JPEG variant
    includes an APP0 segment before SOF0 so the marker walk is
    actually exercised."""
    import struct

    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"))

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 640 + 16, i % 480 + 16
                if i % 37 == 0:
                    payloads.append(b"\x00\x01\x02\x03")
                elif i % 3 == 0:
                    payloads.append(
                        b"\x89PNG\r\n\x1a\n"
                        + struct.pack(">I", 13) + b"IHDR"
                        + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
                    )
                elif i % 3 == 1:
                    payloads.append(
                        b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"
                    )
                else:
                    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
                    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                            + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9)
                    payloads.append(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return src.mapInPandas(synth, "doc_id long, payload binary")


AUDIO_HEADER_DDL = ("doc_id long, format string, channels int, "
                    "sample_rate int, bits int, n_frames bigint, "
                    "duration_ms bigint, parse_ok boolean")


def _parse_audio_header(b: bytes):
    """(format, channels, sample_rate, bits, n_frames, duration_ms, ok)
    from a RIFF/WAVE container: walk the chunk list to 'fmt ' (PCM
    layout) and 'data' (payload size -> frame count -> duration). Pure
    byte arithmetic — no audio codec involved; corrupt input parses to
    unknown/ok=False, never raises."""
    try:
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return ("unknown", None, None, None, None, None, False)
        ch = rate = bits = block = None
        data_size = None
        i = 12
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            size = int.from_bytes(b[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                ch = int.from_bytes(b[i + 10:i + 12], "little")
                rate = int.from_bytes(b[i + 12:i + 16], "little")
                block = int.from_bytes(b[i + 20:i + 22], "little")
                if i + 24 <= len(b):
                    bits = int.from_bytes(b[i + 22:i + 24], "little")
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if ch and rate and block and data_size is not None:
            frames = data_size // block
            return ("wav", ch, rate, bits, frames,
                    frames * 1000 // rate, True)
        return ("wav", ch, rate, bits, None, None, False)
    except Exception:
        return ("unknown", None, None, None, None, None, False)


def audio_header_info(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide audio metadata without decoding a sample: channel
    count, sample rate, bit depth and duration parsed from the
    RIFF/WAVE chunk list — the pre-filter for duration/sample-rate
    bucketing before any resample/feature stage runs. Same Arrow-
    batched mapInPandas shape as image_header_info."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            cols = {k: [] for k in ("format", "channels", "sample_rate",
                                    "bits", "n_frames", "duration_ms",
                                    "parse_ok")}
            for payload in pdf["payload"]:
                fmt, ch, rate, bits, fr, dur, ok = _parse_audio_header(
                    bytes(payload) if payload is not None else b"")
                cols["format"].append(fmt)
                cols["channels"].append(ch)
                cols["sample_rate"].append(rate)
                cols["bits"].append(bits)
                cols["n_frames"].append(fr)
                cols["duration_ms"].append(dur)
                cols["parse_ok"].append(ok)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "format": cols["format"],
                "channels": pd.array(cols["channels"], dtype="Int32"),
                "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                "bits": pd.array(cols["bits"], dtype="Int32"),
                "n_frames": pd.array(cols["n_frames"], dtype="Int64"),
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                "parse_ok": cols["parse_ok"],
            })

    return src.mapInPandas(parse, AUDIO_HEADER_DDL)


def synth_audio_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake WAV payloads: doc_id picks channels
    (1 + id % 2), sample rate (8000 << (id % 3)), 16-bit PCM, and a
    data chunk of (id % 50 + 1) frames; every 41st row is garbage —
    so an oracle can derive the expected parse from doc_id arithmetic
    alone. Headers are structurally valid RIFF/WAVE with fmt+data
    chunks (and a junk LIST chunk first, so the chunk walk is
    exercised)."""
    import struct

    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"))

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 41 == 0:
                    payloads.append(b"RIFX\x00\x00")
                    continue
                ch = 1 + i % 2
                rate = 8000 << (i % 3)
                bits = 16
                block = ch * bits // 8
                frames = i % 50 + 1
                lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
                fmt = (b"fmt " + struct.pack("<I", 16)
                       + struct.pack("<HHIIHH", 1, ch, rate,
                                     rate * block, block, bits))
                data = b"data" + struct.pack("<I", frames * block) \
                    + b"\x00" * (frames * block)
                body = b"WAVE" + lst + fmt + data
                payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return src.mapInPandas(synth, "doc_id long, payload binary")


VIDEO_HEADER_DDL = ("doc_id long, format string, brand string, "
                    "timescale int, duration_ms bigint, n_tracks int, "
                    "parse_ok boolean")


def _parse_video_header(b: bytes):
    """(format, brand, timescale, duration_ms, n_tracks, ok) from an
    ISO-BMFF (MP4/MOV) container: walk the top-level box list to
    `ftyp` (major brand) and `moov`, then walk moov's children to
    `mvhd` (version 0 and 1 layouts both supported — timescale +
    duration at different offsets/widths) and count `trak` boxes.
    Pure byte arithmetic — no video codec involved; corrupt input
    parses to unknown/ok=False, never raises. Handles the 64-bit
    `largesize` box encoding (size==1)."""
    def boxes(buf, i, end):
        while i + 8 <= end:
            size = int.from_bytes(buf[i:i + 4], "big")
            btype = buf[i + 4:i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return
                size = int.from_bytes(buf[i + 8:i + 16], "big")
                hdr = 16
            elif size == 0:  # box extends to end of file
                size = end - i
            if size < hdr or i + size > end:
                return
            yield btype, i + hdr, i + size
            i += size

    try:
        brand = None
        timescale = duration = None
        n_tracks = 0
        saw_moov = False
        for btype, body, bend in boxes(b, 0, len(b)):
            if btype == b"ftyp" and body + 4 <= bend:
                brand = b[body:body + 4].decode("ascii", "replace").strip()
            elif btype == b"moov":
                saw_moov = True
                for ctype, cbody, cend in boxes(b, body, bend):
                    if ctype == b"mvhd" and cbody + 4 <= cend:
                        ver = b[cbody]
                        if ver == 1 and cbody + 32 <= cend:
                            timescale = int.from_bytes(
                                b[cbody + 20:cbody + 24], "big")
                            duration = int.from_bytes(
                                b[cbody + 24:cbody + 32], "big")
                        elif ver == 0 and cbody + 20 <= cend:
                            timescale = int.from_bytes(
                                b[cbody + 12:cbody + 16], "big")
                            duration = int.from_bytes(
                                b[cbody + 16:cbody + 20], "big")
                    elif ctype == b"trak":
                        n_tracks += 1
        if brand is None and not saw_moov:
            return ("unknown", None, None, None, None, False)
        dur_ms = (duration * 1000 // timescale
                  if timescale and duration is not None else None)
        ok = brand is not None and timescale is not None
        return ("mp4", brand, timescale, dur_ms,
                n_tracks if saw_moov else None, ok)
    except Exception:
        return ("unknown", None, None, None, None, False)


def video_header_info(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide video metadata without decoding a frame: container
    brand, movie timescale/duration and track count parsed from the
    ISO-BMFF box tree — the pre-filter for duration bucketing and
    frame-sample planning before any decode stage runs. Same Arrow-
    batched mapInPandas shape as image/audio_header_info."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            cols = {k: [] for k in ("format", "brand", "timescale",
                                    "duration_ms", "n_tracks", "parse_ok")}
            for payload in pdf["payload"]:
                fmt, brand, ts, dur, trk, ok = _parse_video_header(
                    bytes(payload) if payload is not None else b"")
                cols["format"].append(fmt)
                cols["brand"].append(brand)
                cols["timescale"].append(ts)
                cols["duration_ms"].append(dur)
                cols["n_tracks"].append(trk)
                cols["parse_ok"].append(ok)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "format": cols["format"],
                "brand": cols["brand"],
                "timescale": pd.array(cols["timescale"], dtype="Int32"),
                "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                "n_tracks": pd.array(cols["n_tracks"], dtype="Int32"),
                "parse_ok": cols["parse_ok"],
            })

    return src.mapInPandas(parse, VIDEO_HEADER_DDL)


def synth_video_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake MP4 payloads: doc_id picks the major brand
    (isom/mp42 by id % 2 — which also picks the mvhd VERSION, 0 or 1,
    so both layouts are exercised), timescale (600 or 1000), a
    duration of exactly (id % 60 + 1) seconds in movie units, and
    1 + id % 3 empty trak boxes; every 43rd row is garbage. An oracle
    derives the expected parse from doc_id arithmetic alone."""
    import struct

    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"))

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 43 == 0:
                    payloads.append(b"\x00\x00\x00\x08free")
                    continue
                ver = i % 2
                brand = b"isom" if ver == 0 else b"mp42"
                ts = 600 if ver == 0 else 1000
                dur = (i % 60 + 1) * ts  # exactly (i % 60 + 1) seconds
                ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
                if ver == 0:
                    mvhd = box(b"mvhd", bytes([0, 0, 0, 0])
                               + struct.pack(">IIII", 0, 0, ts, dur))
                else:
                    mvhd = box(b"mvhd", bytes([1, 0, 0, 0])
                               + struct.pack(">QQIQ", 0, 0, ts, dur))
                traks = b"".join(box(b"trak", b"") for _ in range(1 + i % 3))
                payloads.append(ftyp + box(b"moov", mvhd + traks))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return src.mapInPandas(synth, "doc_id long, payload binary")
