"""Multimodal column plumbing (Tier B, SURVEY.md §2.2).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched kernels over ``mapInPandas`` so each task streams
record batches without materializing the whole partition.

PNG and GIF header decode (``parse_image_header``) and PCM WAV header
decode (``parse_wav_header``) are REAL — pure-byte parsing, no codec
library needed. Pixel/sample decode for everything else is STUBBED
(this container has no image/audio codecs): ``decode_stub`` produces
a deterministic fake feature vector derived from the bytes.
The Spark-side plumbing — schema, batch iteration, partition behavior,
UDF signatures — is real and tested; swapping the stub for PIL/libav
is a one-function change on the executor side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata accompanying every blob
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-shape helper: wrap a text column as a binary blob + typed
    metadata (the shape a real image/audio table would have)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
    )
    return df.withColumn("blob", blob).withColumn("meta", meta)


def decode_stub(blob: bytes) -> list[float]:
    """Deterministic fake 'decode + feature extraction'.

    Real deployment: replace with PIL/torchvision/librosa decode.
    Raises NotImplementedError for mime types a real decoder would
    reject — the error path is part of the contract.
    """
    if blob is None:
        raise NotImplementedError("real media decode not available in this container")
    # bytes -> FEATURE_DIM bucketed byte-mean features (deterministic)
    n = len(blob)
    if n == 0:
        return [0.0] * FEATURE_DIM
    step = max(1, n // FEATURE_DIM)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = blob[i * step : (i + 1) * step] or blob[-step:]
        feats.append(round(sum(chunk) / len(chunk), 6))
    return feats


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


#: JPEG start-of-frame markers carrying the image dimensions: SOF0-SOF15
#: minus DHT (0xC4), JPG-reserved (0xC8) and DAC (0xCC), per ITU T.81
#: Table B.1.  Baseline (C0) and progressive (C2) are the ones real
#: encoders emit; the rest are parsed for completeness.
_JPEG_SOF_MARKERS = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _parse_jpeg_sof(blob: bytes) -> tuple[str, int, int] | None:
    """Walk the JPEG marker-segment stream (ITU T.81 §B.1): each
    segment is 0xFF <marker> <u16be length includes itself>.  The
    frame header (SOFn) carries precision u8, height u16be, width
    u16be.  Stops at SOS/EOI — dimensions after the entropy-coded data
    starts would require decoding, and a SOF-less stream is corrupt."""
    if blob[:2] != b"\xff\xd8":  # SOI
        return None
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None  # corrupt marker stream
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2  # standalone markers: TEM, RSTn, SOI — no length
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            return None
        seg_len = int.from_bytes(blob[pos + 2 : pos + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF_MARKERS:
            body = blob[pos + 4 : pos + 2 + seg_len]
            if len(body) < 5:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            # height 0 means DNL-deferred (T.81 §B.2.2) — without the
            # DNL marker the real height is unknowable from the header
            if w == 0 or h == 0:
                return None
            return ("image/jpeg", w, h)
        pos += 2 + seg_len
    return None


def parse_image_header(blob: bytes) -> tuple[str, int, int] | None:
    """REAL (non-stub) image codec for the three formats whose headers
    are parseable with zero dependencies: PNG (IHDR width/height,
    big-endian u32 at bytes 16..24 — PNG spec §11.2.2), GIF
    (logical-screen width/height, little-endian u16 at bytes 6..10 —
    GIF89a spec §18) and JPEG (SOFn frame-header scan over the marker
    stream — ITU T.81 §B.2.2, baseline and progressive).  Returns
    (mime, width, height), or None for anything else (the stub seam
    keeps handling those).

    These are the decode paths exercised for real in this container;
    pixel decode / audio / video stay behind ``decode_stub``.
    """
    if blob is None or len(blob) < 10:
        return None
    if blob[:2] == b"\xff\xd8":
        return _parse_jpeg_sof(blob)
    if (
        len(blob) >= 24
        and blob[:8] == PNG_SIGNATURE
        and blob[12:16] == b"IHDR"
    ):
        w = int.from_bytes(blob[16:20], "big")
        h = int.from_bytes(blob[20:24], "big")
        # PNG spec §11.2.2: dimensions are 1..2^31-1; zero and raw-u32
        # values above 2^31-1 are corrupt headers, not images (and the
        # latter would overflow the Int32 meta columns downstream)
        if not (1 <= w <= 0x7FFFFFFF and 1 <= h <= 0x7FFFFFFF):
            return None
        return ("image/png", w, h)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(blob[6:8], "little")
        h = int.from_bytes(blob[8:10], "little")
        if w == 0 or h == 0:  # zero screen dims: corrupt, not an image
            return None
        return ("image/gif", w, h)
    return None


def synth_png(width: int, height: int, n_filler: int = 0) -> bytes:
    """Minimal spec-valid PNG prefix: signature + IHDR chunk (33 bytes)
    + ``n_filler`` zero bytes. Deterministic, for tests/oracles."""
    import struct
    import zlib

    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    ihdr = (
        struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_data
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
    )
    return PNG_SIGNATURE + ihdr + bytes(n_filler)


def synth_gif(width: int, height: int, n_filler: int = 0) -> bytes:
    """Minimal GIF89a prefix: header + logical screen descriptor (13
    bytes) + ``n_filler`` zero bytes. Deterministic, for tests/oracles."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + bytes(3) + bytes(n_filler)


def synth_jpeg(
    width: int, height: int, n_filler: int = 0, progressive: bool = False
) -> bytes:
    """Minimal spec-valid JPEG prefix: SOI + JFIF APP0 (18 bytes) +
    SOF0/SOF2 frame header for a 3-component 8-bit image (19 bytes) +
    ``n_filler`` zero bytes — 39 + n_filler total. Deterministic, for
    tests/oracles."""
    import struct

    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    sof_data = struct.pack(">BHHB", 8, height, width, 3)
    sof_data += b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"  # Y/Cb/Cr sampling
    sof = (
        (b"\xff\xc2" if progressive else b"\xff\xc0")
        + struct.pack(">H", 2 + len(sof_data))
        + sof_data
    )
    return b"\xff\xd8" + app0 + sof + bytes(n_filler)


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """mapInPandas image-header audit using the REAL PNG/GIF codec:
    binary blobs in, (mime, width, height, n_bytes) out.  Unknown
    formats yield mime='unknown' with NULL dims rather than erroring —
    an audit must classify, not crash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, ws, hs, sizes = [], [], [], [], []
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                # NULL binary columns arrive as None — classify, don't crash
                blob = b"" if b is None else bytes(b)
                parsed = parse_image_header(blob)
                ids.append(did)
                sizes.append(len(blob))
                if parsed is None:
                    mimes.append("unknown")
                    ws.append(None)
                    hs.append(None)
                else:
                    mimes.append(parsed[0])
                    ws.append(parsed[1])
                    hs.append(parsed[2])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_bytes": sizes,
                }
            )

    return df.mapInPandas(batches, IMAGE_META_SCHEMA)


def _wav_pcm_chunks(blob: bytes) -> tuple[int, int, int, bytes] | None:
    """The shared RIFF/WAVE chunk walk: returns (sample_rate,
    n_channels, bits, data_bytes) for a well-formed integer-PCM WAV,
    else None.  data_bytes is clamped to the bytes actually present —
    a truncated blob must not report content its data chunk doesn't
    carry.  parse_wav_header derives the frame count from this;
    audio_pcm_stats reads the samples themselves."""
    if blob is None or len(blob) < 44:
        return None
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, fmt, fmt_body, data = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        csize = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = blob[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt_body = body
            fmt = (
                int.from_bytes(body[0:2], "little"),  # audio format tag
                int.from_bytes(body[2:4], "little"),  # channels
                int.from_bytes(body[4:8], "little"),  # sample rate
                int.from_bytes(body[14:16], "little"),  # bits/sample
            )
        elif cid == b"data":
            # the slice is already clamped to available bytes
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    format_tag, n_channels, sample_rate, bits = fmt
    # integer PCM only: tag 1, or WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    # whose SubFormat GUID wraps PCM — real encoders emit >16-bit PCM
    # under the extensible tag, and the frame math is exact for those.
    # Float (3), mu-law (7), compressed formats: the math would lie.
    if format_tag == 0xFFFE:
        if fmt_body is None or len(fmt_body) < 26 or fmt_body[24:26] != b"\x01\x00":
            return None
    elif format_tag != 1:
        return None
    if n_channels == 0 or sample_rate == 0 or bits not in (8, 16, 24, 32):
        return None
    return (sample_rate, n_channels, bits, bytes(data))


def parse_wav_header(blob: bytes) -> tuple[int, int, int, int] | None:
    """REAL (non-stub) audio codec for the one container whose header
    is parseable with zero dependencies: RIFF/WAVE PCM (RIFF spec /
    WAVE fmt chunk: channels u16le @22, sample rate u32le @24, bits
    u16le @34 for a canonical fmt-first layout; the data chunk is
    located by walking the chunk list, not assumed at a fixed offset).
    Returns (sample_rate, n_channels, bits_per_sample, n_frames), or
    None for anything that is not a well-formed PCM WAV."""
    parsed = _wav_pcm_chunks(blob)
    if parsed is None:
        return None
    sample_rate, n_channels, bits, data = parsed
    frame_bytes = n_channels * (bits // 8)
    return (sample_rate, n_channels, bits, len(data) // frame_bytes)


def synth_wav(
    sample_rate: int,
    n_channels: int,
    bits: int,
    n_frames: int,
    amps: tuple[int, ...] | None = None,
) -> bytes:
    """Minimal spec-valid PCM WAV: RIFF header + fmt chunk + data chunk.
    With ``amps`` None the data is ``n_frames`` zero frames; with a
    per-channel amplitude tuple (16-bit only) each channel carries the
    square wave +amp, −amp, +amp, … — closed-form RMS/peak/clipping so
    oracles can predict audio_pcm_stats arithmetically while the reader
    still has to get interleave, sample width and sign right.
    Deterministic, for tests/oracles."""
    import struct

    frame_bytes = n_channels * (bits // 8)
    if amps is None:
        data = bytes(n_frames * frame_bytes)
    else:
        if bits != 16 or len(amps) != n_channels:
            raise ValueError("waveform synth is 16-bit, one amp per channel")
        import numpy as np

        sgn = np.where(np.arange(n_frames) % 2 == 0, 1, -1)
        frames = np.outer(sgn, np.asarray(amps, dtype=np.int64))
        data = frames.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * frame_bytes,
        frame_bytes,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        # LongType: the RIFF fmt sample rate is UNSIGNED u32 — values
        # >= 2^31 are wire-legal in an untrusted blob and overflowed
        # an Int32 column (same class as the mvhd-timescale and
        # PCM-peak widenings); classify-don't-crash demands the column
        # hold anything the parser accepts
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
    ]
)


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """mapInPandas audio-header audit using the REAL WAV codec: binary
    blobs in, (mime, sample_rate, channels, bits, frames, duration)
    out.  Non-WAV blobs classify as mime='unknown' with NULL fields —
    same classify-don't-crash contract as decode_image_meta."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, srs, chs, bts, frs, durs = [], [], [], [], [], [], []
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b"" if b is None else bytes(b)
                parsed = parse_wav_header(blob)
                ids.append(did)
                if parsed is None:
                    mimes.append("unknown")
                    srs.append(None)
                    chs.append(None)
                    bts.append(None)
                    frs.append(None)
                    durs.append(None)
                else:
                    sr, ch, bits, n_frames = parsed
                    mimes.append("audio/wav")
                    srs.append(sr)
                    chs.append(ch)
                    bts.append(bits)
                    frs.append(n_frames)
                    durs.append(round(n_frames * 1000.0 / sr, 6))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mime": mimes,
                    "sample_rate": pd.array(srs, dtype="Int64"),
                    "n_channels": pd.array(chs, dtype="Int32"),
                    "bits": pd.array(bts, dtype="Int32"),
                    "n_frames": pd.array(frs, dtype="Int64"),
                    "duration_ms": durs,
                }
            )

    return df.mapInPandas(batches, AUDIO_META_SCHEMA)


PCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        # LongType: a 32-bit PCM sample at the NEGATIVE rail has
        # |s| = 2^31, one past Int32 max — an Int32 peak column made
        # the Arrow batch build raise on a legal full-scale sample
        T.StructField("peak", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("clip_rate", T.DoubleType()),
        T.StructField("duration_ms", T.DoubleType()),
    ]
)


def pcm_frame_stats(
    blob: bytes,
) -> tuple[int, int, float, float, float] | None:
    """RMS / peak / clipping rate / duration from RAW PCM bytes — no
    codec library, same pure-byte discipline as the header parsers
    (8-bit unsigned, 16/32-bit signed LE, 24-bit via 3-byte assembly).
    Only COMPLETE frames count: a data chunk truncated mid-frame drops
    the partial tail (fuzz-pinned).  Returns (n_samples, peak_raw,
    rms_norm, clip_rate, duration_ms) with rms normalized to full
    scale 2^(bits−1) and a sample clipped iff it sits at either rail.
    None for anything that is not integer-PCM WAV."""
    import numpy as np

    parsed = _wav_pcm_chunks(blob)
    if parsed is None:
        return None
    sample_rate, n_channels, bits, data = parsed
    frame_bytes = n_channels * (bits // 8)
    n_frames = len(data) // frame_bytes
    data = data[: n_frames * frame_bytes]
    if bits == 8:
        s = np.frombuffer(data, "<u1").astype(np.int64) - 128
        hi, lo = 127, -128
    elif bits == 16:
        s = np.frombuffer(data, "<i2").astype(np.int64)
        hi, lo = 32767, -32768
    elif bits == 32:
        s = np.frombuffer(data, "<i4").astype(np.int64)
        hi, lo = 2**31 - 1, -(2**31)
    else:  # 24-bit: assemble 3 LE bytes, sign-extend
        a = np.frombuffer(data, "<u1").reshape(-1, 3).astype(np.int64)
        s = a[:, 0] | (a[:, 1] << 8) | (a[:, 2] << 16)
        s = np.where(s >= 1 << 23, s - (1 << 24), s)
        hi, lo = (1 << 23) - 1, -(1 << 23)
    dur = round(n_frames * 1000.0 / sample_rate, 6)
    n = int(s.size)
    if n == 0:
        return (0, 0, 0.0, 0.0, dur)
    full = float(hi + 1)
    rms = round(float(np.sqrt(np.mean((s / full) ** 2))), 6)
    clip = round(float(np.mean((s >= hi) | (s <= lo))), 6)
    return (n, int(np.max(np.abs(s))), rms, clip, dur)


def audio_pcm_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """mapInPandas PCM frame-statistics audit: binary blobs in,
    (mime, n_samples, peak, rms, clip_rate, duration_ms) out.  The
    loudness/clipping screen an audio ingest pipeline runs before
    feature extraction; non-WAV blobs classify as mime='unknown' with
    NULL stats — the classify-don't-crash contract of
    decode_audio_meta, one level deeper into the bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, ns, pk, rm, cl, du = [], [], [], [], [], [], []
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b"" if b is None else bytes(b)
                stats = pcm_frame_stats(blob)
                ids.append(did)
                if stats is None:
                    mimes.append("unknown")
                    ns.append(None)
                    pk.append(None)
                    rm.append(None)
                    cl.append(None)
                    du.append(None)
                else:
                    n, peak, rms, clip, dur = stats
                    mimes.append("audio/wav")
                    ns.append(n)
                    pk.append(peak)
                    rm.append(rms)
                    cl.append(clip)
                    du.append(dur)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mime": mimes,
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "peak": pd.array(pk, dtype="Int64"),
                    "rms": rm,
                    "clip_rate": cl,
                    "duration_ms": du,
                }
            )

    return df.mapInPandas(batches, PCM_STATS_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", include_features: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over (blob, meta) — Arrow record
    batches in, typed rows out; no driver involvement, no collect.

    ``include_features=False`` is the metadata-only path for consumers
    that discard the feature vector (the byte-accounting audit needs
    only mime/n_bytes): mapInPandas is opaque to Catalyst, so an unused
    ``features`` output can neither be pruned nor its decode skipped by
    the optimizer — and the heavy input column must be dropped BEFORE
    the boundary or every blob byte still crosses JVM->Arrow->Python
    just to be ignored.  The skip projects ``blob`` away pre-boundary
    and emits ``features`` as NULL; doc_id/mime/n_bytes are
    batch-for-batch identical to the full path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": (
                        [decode_stub(bytes(b)) for b in pdf["blob"]]
                        if include_features
                        else [None] * len(pdf)
                    ),
                }
            )
            yield out

    # pass ONLY the columns the kernel reads across the Python
    # boundary (guide §4.1): mapInPandas ships every input column, and
    # Catalyst cannot prune through the opaque function — a caller
    # handing over full attach_media output would otherwise ship the
    # text column (as large as the blob itself) into Python unread
    df = df.select(id_col, "blob", "meta") if include_features else (
        df.select(id_col, "meta")
    )
    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_stub(blob: bytes, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'resize': byte-subsample to width*height bytes.

    Real deployment: PIL ``Image.resize``. The Spark-side contract —
    binary in, fixed-size binary out, metadata carried — is what's
    exercised here.
    """
    if blob is None:
        raise NotImplementedError("real media decode not available in this container")
    n = width * height
    if len(blob) == 0:
        return bytes(n)
    step = max(1, len(blob) // n)
    out = bytes(blob[min(i * step, len(blob) - 1)] for i in range(n))
    return out


def frame_sample_stub(blob: bytes, n_frames: int = 4) -> list[bytes]:
    """Deterministic fake 'video frame sampling': split the blob into
    n_frames equal chunks (real deployment: libav keyframe extraction)."""
    if blob is None:
        raise NotImplementedError("real media decode not available in this container")
    if len(blob) == 0:
        return [b""] * n_frames
    step = max(1, len(blob) // n_frames)
    return [bytes(blob[i * step : (i + 1) * step] or blob[-step:]) for i in range(n_frames)]


def resize_media(df: DataFrame, id_col: str = "doc_id", width: int = 8, height: int = 8) -> DataFrame:
    """mapInPandas resize over (blob, meta) -> fixed-size thumbnails."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "thumb": [resize_stub(bytes(b), width, height) for b in pdf["blob"]],
                }
            )

    # only (id, blob) cross the boundary — the kernel reads nothing else
    return df.select(id_col, "blob").mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampling: one output row per (media, frame)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for did, b in zip(pdf[id_col], pdf["blob"]):
                for i, fr in enumerate(frame_sample_stub(bytes(b), n_frames)):
                    ids.append(did)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    # only (id, blob) cross the boundary — the kernel reads nothing else
    return df.select(id_col, "blob").mapInPandas(batches, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Video: ISO-BMFF (MP4) container metadata — REAL byte-level box walk
# ---------------------------------------------------------------------------


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4_mvhd(timescale: int, duration: int) -> bytes:
    import struct

    return _mp4_box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + bytes(10)  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + bytes(24)  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )


def _mp4_track_header(
    width: int,
    height: int,
    timescale: int,
    duration: int,
    media_timescale: int = 0,
) -> tuple[bytes, bytes, bytes]:
    """(tkhd, mdhd, hdlr-vide) shared by the progressive and
    fragmented synthesizers.  ``media_timescale`` (0 = same as the
    movie timescale) sets the mdhd's own timebase — real encoders
    almost always use a finer media timebase (e.g. 90 kHz) than the
    movie's — with the mdhd duration rescaled exactly."""
    import struct

    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track_ID
        + bytes(4)  # reserved
        + struct.pack(">I", duration)
        + bytes(8)  # reserved
        + struct.pack(">hhh", 0, 0, 0)  # layer, group, volume
        + bytes(2)  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mt = media_timescale or timescale
    mdur = duration * mt // timescale if timescale else duration
    mdhd = _mp4_box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", mt, mdur)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', pre_defined
    )
    hdlr = _mp4_box(
        b"hdlr", struct.pack(">B3x", 0) + bytes(4) + b"vide" + bytes(12) + b"\x00"
    )
    return tkhd, mdhd, hdlr


def synth_mp4(
    width: int,
    height: int,
    timescale: int,
    n_frames: int,
    frame_delta: int,
    n_filler: int = 0,
    sample_size: int = 0,
    sample_sizes: "list[int] | None" = None,
    chunks_of: int = 0,
    media_timescale: int = 0,
    payload_pattern: bool = False,
) -> bytes:
    """Minimal spec-valid ISO-BMFF (ISO/IEC 14496-12) MP4: ftyp +
    moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl(...))))) +
    mdat.  Movie duration is exactly ``n_frames * frame_delta``
    in ``timescale`` units and the single stts entry carries
    (n_frames, frame_delta), so every metadata field an oracle needs is
    closed-form from the arguments.  Deterministic, for tests/oracles.

    ``sample_size > 0`` additionally writes the sample tables a
    byte-range planner needs — stsz (uniform size, n_frames samples) +
    stsc (one run: every sample in chunk 1) + stco (one chunk whose
    offset is the REAL mdat payload position) — and sizes the mdat
    payload as ``n_frames * sample_size + n_filler``, so every planned
    (byte_offset, byte_len) range lands inside the container.
    ``sample_sizes`` (mutually exclusive) writes the variable-size
    stsz table path instead, with a matching mdat payload.
    ``chunks_of > 0`` splits the samples into chunks of that many
    samples (last chunk smaller when it does not divide): the stsc
    carries the real run table and the stco one REAL offset per
    chunk — the general layout the byte indexer must walk.
    ``payload_pattern`` fills the mdat payload with the
    position-dependent byte sequence i % 251 (i from payload start)
    instead of zeros, so a checksum over any fetched byte range
    proves the ABSOLUTE offset the range was read from — the
    fetch-verify loop needs content that zeros cannot witness."""
    import struct

    box = _mp4_box
    duration = n_frames * frame_delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp41")
    mvhd = _mp4_mvhd(timescale, duration)
    tkhd, mdhd, hdlr = _mp4_track_header(
        width, height, timescale, duration, media_timescale
    )
    stts = box(
        b"stts",
        struct.pack(">B3x", 0)
        + struct.pack(">I", 1)  # entry_count
        + struct.pack(">II", n_frames, frame_delta),
    )

    media = 0
    stsz = stsc = b""
    sizes: "list[int] | None" = None
    if sample_sizes is not None:
        sizes = list(sample_sizes)
        stsz = box(
            b"stsz",
            struct.pack(">B3x", 0)
            + struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        media = sum(sizes)
    elif sample_size > 0:
        sizes = [sample_size] * n_frames
        stsz = box(
            b"stsz",
            struct.pack(">B3x", 0) + struct.pack(">II", sample_size, n_frames),
        )
        media = n_frames * sample_size
    chunk_sizes: list[int] = []  # samples per chunk
    if stsz:
        n_samples = len(sizes)
        per = chunks_of if chunks_of > 0 else n_samples
        chunk_sizes = [
            min(per, n_samples - c * per)
            for c in range((n_samples + per - 1) // per)
        ] or [0]
        # stsc runs: (first_chunk, samples_per_chunk, desc_idx); the
        # last chunk gets its own run only when it is short
        runs = [(1, per, 1)]
        if len(chunk_sizes) > 1 and chunk_sizes[-1] != per:
            runs.append((len(chunk_sizes), chunk_sizes[-1], 1))
        if len(chunk_sizes) == 1:
            runs = [(1, chunk_sizes[0], 1)]
        stsc = box(
            b"stsc",
            struct.pack(">B3x", 0)
            + struct.pack(">I", len(runs))
            + b"".join(struct.pack(">III", *r) for r in runs),
        )

    def assemble(first_offset: int) -> bytes:
        stco = b""
        if stsz:
            offsets, acc, s0 = [], first_offset, 0
            for csz in chunk_sizes:
                offsets.append(acc)
                acc += sum(sizes[s0 : s0 + csz])
                s0 += csz
            stco = box(
                b"stco",
                struct.pack(">B3x", 0)
                + struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">I", o) for o in offsets),
            )
        stbl = box(b"stbl", stts + stsz + stsc + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        return ftyp + moov

    # two-pass: box sizes don't depend on the offset VALUES, so the
    # second assembly (with the real mdat payload position) is
    # byte-length-identical to the first
    header = assemble(0)
    header = assemble(len(header) + 8)
    payload = (
        bytes(i % 251 for i in range(media + n_filler))
        if payload_pattern
        else bytes(media + n_filler)
    )
    mdat = box(b"mdat", payload)
    return header + mdat


def synth_fmp4(
    width: int,
    height: int,
    timescale: int,
    frag_sample_counts: "list[int]",
    frame_delta: int,
    n_filler: int = 0,
) -> bytes:
    """Minimal fragmented ISO-BMFF (CMAF/DASH-style fMP4): ftyp(iso5)
    + moov(mvhd(duration 0, as encoders author it) + mvex(mehd with
    the REAL fragment_duration + trex) + trak(empty stbl)) then one
    moof(mfhd + traf(tfhd + trun(sample_count))) + mdat pair per
    fragment.  Total frames = sum(frag_sample_counts); movie duration
    lives ONLY in mehd — the parser must use the mehd fallback.
    Deterministic, for tests/oracles."""
    import struct

    box = _mp4_box
    total = sum(frag_sample_counts)
    duration = total * frame_delta
    ftyp = box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5dash")
    mvhd = _mp4_mvhd(timescale, 0)
    tkhd, mdhd, hdlr = _mp4_track_header(width, height, timescale, 0)
    stts = box(b"stts", struct.pack(">B3x", 0) + struct.pack(">I", 0))
    stbl = box(b"stbl", stts)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    mehd = box(b"mehd", struct.pack(">B3x", 0) + struct.pack(">I", duration))
    trex = box(
        b"trex",
        struct.pack(">B3x", 0) + struct.pack(">5I", 1, 1, frame_delta, 0, 0),
    )
    mvex = box(b"mvex", mehd + trex)
    moov = box(b"moov", mvhd + mvex + trak)
    out = [ftyp, moov]
    for seq, count in enumerate(frag_sample_counts, start=1):
        mfhd = box(b"mfhd", struct.pack(">B3x", 0) + struct.pack(">I", seq))
        tfhd = box(b"tfhd", struct.pack(">B3x", 0) + struct.pack(">I", 1))
        trun = box(b"trun", struct.pack(">B3x", 0) + struct.pack(">I", count))
        traf = box(b"traf", tfhd + trun)
        out.append(box(b"moof", mfhd + traf))
        filler = n_filler if seq == len(frag_sample_counts) else 0
        out.append(box(b"mdat", bytes(filler)))
    return b"".join(out)


#: containers whose payload is itself a box sequence
_MP4_CONTAINERS = frozenset(
    {
        b"moov",
        b"trak",
        b"mdia",
        b"minf",
        b"stbl",
        b"edts",
        b"udta",
        b"mvex",
        b"moof",
        b"traf",
    }
)

#: deepest container nesting the walk descends into; deeper subtrees
#: are SKIPPED (classify-don't-crash: an adversarial blob of nested
#: container headers must not exhaust the interpreter stack inside a
#: Spark task — the walk is an explicit stack, but the cap also bounds
#: pathological frame counts)
_MP4_MAX_DEPTH = 32

#: largest value representable in the output schema's signed-64 columns;
#: u64 fields (v1 duration, co64 offsets) at or beyond this classify as
#: None rather than crash the Arrow column build
_I64_MAX = 1 << 63


def parse_mp4_header(blob: bytes) -> dict | None:
    """Walk the ISO-BMFF box tree (size u32be + fourcc, size==1 →
    u64 largesize, size==0 → to EOF) and return a metadata dict, or
    None when the blob is not a parseable MP4 (no ftyp, truncated box,
    no moov/mvhd).

    Keys: ``brand`` (ftyp major brand), ``container`` ('progressive'
    or 'fragmented' — moof/mvex present), ``timescale``/``duration``
    (mvhd v0/v1; a zero mvhd duration falls back to mvex/mehd
    fragment_duration, the layout CMAF/DASH encoders author),
    ``width``/``height`` (the VIDEO track's 16.16-fixed tkhd dims),
    ``n_frames`` (the video track's stts total, or its trun totals
    for fMP4), ``n_fragments`` (moof count), ``sample_size`` (uniform
    stsz size, None when variable/absent), ``sample_count`` (stsz),
    ``chunk_offset`` (first stco/co64 entry), ``n_chunks``.

    Track attribution is real: each trak subtree collects its own
    tkhd/hdlr/stbl fields and the VIDEO track — first trak whose hdlr
    handler_type is 'vide', else first trak with nonzero tkhd dims,
    else the first trak — supplies the per-track outputs, so a
    video+audio file no longer inflates n_frames with audio sample
    counts.  fMP4 trun totals attribute per tfhd track_ID the same
    way.  The walk is an EXPLICIT stack over (start, end) ranges (no
    recursion to exhaust, no payload copies for containers) with a
    depth cap, and u64 fields that exceed the signed-64 output schema
    classify as None — classify-don't-crash for untrusted blobs, the
    same contract as the image and WAV parsers."""
    walked = _walk_mp4(blob)
    if walked is None:
        return None
    brand, movie, tracks, frag_samples, n_moof, has_mvex, truncated = walked
    if truncated or "timescale" not in movie:
        return None

    vid = _select_video_track(tracks)

    duration = movie.get("duration")
    if duration == 0 and movie.get("frag_duration") is not None:
        duration = movie["frag_duration"]

    n_frames = vid.get("n_frames", 0)
    if not n_frames and frag_samples:
        tid = vid.get("track_id")
        if tid in frag_samples:
            n_frames = frag_samples[tid]
        elif tid is None and len(frag_samples) == 1:
            # the selected trak never declared a track_id (missing or
            # short tkhd) but only one track carries trun samples, so
            # attribution is still unambiguous
            n_frames = next(iter(frag_samples.values()))
        # else: either several fragmented tracks with no way to
        # attribute, or the video trak DID declare a track_id that no
        # tfhd references (the lone trun belongs to a DIFFERENT track,
        # e.g. audio) — summing or borrowing would reintroduce the
        # cross-track inflation the per-track fix removed, so classify
        # to 0 (ADVICE r10)

    return {
        "brand": brand,
        "container": "fragmented" if (n_moof or has_mvex) else "progressive",
        "timescale": movie["timescale"],
        "duration": duration,
        "width": vid.get("width", 0),
        "height": vid.get("height", 0),
        "n_frames": n_frames,
        "n_fragments": n_moof,
        "media_timescale": vid.get("media_timescale"),
        "media_duration": vid.get("media_duration"),
        "sample_size": vid.get("sample_size"),
        "sample_count": vid.get("sample_count"),
        "chunk_offset": vid.get("chunk_offset"),
        "n_chunks": vid.get("n_chunks", 0),
    }


def _select_video_track(tracks: "list[dict]") -> dict:
    """First trak whose hdlr says 'vide', else first trak with nonzero
    tkhd dims, else the first trak (else empty)."""
    for t in tracks:
        if t.get("handler") == b"vide":
            return t
    for t in tracks:
        if t.get("width"):
            return t
    return tracks[0] if tracks else {}


def _walk_mp4(blob: bytes, want_tables: bool = False):
    """Shared explicit-stack ISO-BMFF walk.  Returns (brand, movie,
    tracks, frag_samples, n_moof, has_mvex, truncated) or None when
    the blob has no leading ftyp.  With ``want_tables`` each trak also
    collects its FULL sample tables — stsz size list, stsc
    (first_chunk, samples_per_chunk) runs, all stco/co64 chunk
    offsets — for the byte indexer."""
    import struct

    n = len(blob)
    if n < 12 or blob[4:8] != b"ftyp":
        return None
    brand = blob[8:12].decode("ascii", errors="replace")

    movie: dict = {}
    tracks: list[dict] = []
    frag_samples: dict = {}  # tfhd track_ID -> total trun samples
    n_moof = 0
    has_mvex = False
    truncated = False

    # each frame is a box-sequence cursor: (pos, end, depth, trak ctx,
    # traf ctx); one box is consumed per iteration, with the sibling
    # remainder and (for containers) the child range pushed back
    stack: list[tuple] = [(0, n, 0, None, None)]
    while stack:
        pos, end, depth, trak, traf = stack.pop()
        if pos + 8 > end:
            continue
        size = struct.unpack_from(">I", blob, pos)[0]
        typ = blob[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                truncated = True
                continue
            size = struct.unpack_from(">Q", blob, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            truncated = True
            continue
        p0, p1 = pos + hdr, pos + size
        stack.append((p1, end, depth, trak, traf))  # siblings
        if typ in _MP4_CONTAINERS:
            if depth < _MP4_MAX_DEPTH:
                ctrak, ctraf = trak, traf
                if typ == b"trak":
                    ctrak = {}
                    tracks.append(ctrak)
                elif typ == b"traf":
                    ctraf = {}
                elif typ == b"moof":
                    n_moof += 1
                elif typ == b"mvex":
                    has_mvex = True
                stack.append((p0, p1, depth + 1, ctrak, ctraf))
            # deeper: skip the subtree, keep classifying siblings
            continue
        payload = blob[p0:p1]
        plen = p1 - p0
        if typ == b"mvhd" and plen >= 20 and "timescale" not in movie:
            ver = payload[0]
            # v1 layout: ver/flags 4 + created u64 + modified u64 →
            # timescale u32 @20, duration u64 @24..32 — the guard must
            # cover the FULL u64 read (a 28..31-byte truncated v1 box
            # crashed the walk; found by tools/fuzz_parsers.py)
            if ver == 1 and plen >= 32:
                movie["timescale"] = struct.unpack_from(">I", payload, 20)[0]
                dur = struct.unpack_from(">Q", payload, 24)[0]
                movie["duration"] = dur if dur < _I64_MAX else None
            elif ver == 0:
                movie["timescale"] = struct.unpack_from(">I", payload, 12)[0]
                movie["duration"] = struct.unpack_from(">I", payload, 16)[0]
        elif typ == b"mehd" and plen >= 8 and "frag_duration" not in movie:
            ver = payload[0]
            if ver == 1 and plen >= 12:
                dur = struct.unpack_from(">Q", payload, 4)[0]
                movie["frag_duration"] = dur if dur < _I64_MAX else None
            elif ver == 0:
                movie["frag_duration"] = struct.unpack_from(">I", payload, 4)[0]
        elif typ == b"tkhd" and trak is not None and "width" not in trak:
            ver = payload[0] if plen else 0
            # v0 layout: width/height are the LAST 8 payload bytes
            if plen >= (92 if ver == 1 else 84):
                trak["track_id"] = struct.unpack_from(
                    ">I", payload, 20 if ver == 1 else 12
                )[0]
                w, h = struct.unpack_from(">II", payload, plen - 8)
                trak["width"] = w >> 16
                trak["height"] = h >> 16
        elif typ == b"mdhd" and trak is not None and plen >= 20:
            ver = payload[0]
            # same v1 layout as mvhd: the u64 duration read ends at
            # byte 32, so plen >= 28 under-guarded by 4 (fuzz find)
            if ver == 1 and plen >= 32:
                trak["media_timescale"] = struct.unpack_from(
                    ">I", payload, 20
                )[0]
                mdur = struct.unpack_from(">Q", payload, 24)[0]
                trak["media_duration"] = mdur if mdur < _I64_MAX else None
            elif ver == 0:
                trak["media_timescale"] = struct.unpack_from(
                    ">I", payload, 12
                )[0]
                trak["media_duration"] = struct.unpack_from(
                    ">I", payload, 16
                )[0]
        elif typ == b"hdlr" and trak is not None and plen >= 12:
            trak.setdefault("handler", payload[8:12])
        elif typ == b"stts" and trak is not None and plen >= 8:
            n_entries = struct.unpack_from(">I", payload, 4)[0]
            total = 0
            for i in range(n_entries):
                off = 8 + i * 8
                if off + 8 > plen:
                    break
                total += struct.unpack_from(">I", payload, off)[0]
            trak["n_frames"] = trak.get("n_frames", 0) + total
        elif typ == b"stsz" and trak is not None and plen >= 12:
            ssz = struct.unpack_from(">I", payload, 4)[0]
            trak["sample_size"] = ssz if ssz > 0 else None
            trak["sample_count"] = struct.unpack_from(">I", payload, 8)[0]
            if want_tables and ssz == 0:
                count = min(trak["sample_count"], (plen - 12) // 4)
                trak["sizes"] = list(
                    struct.unpack_from(f">{count}I", payload, 12)
                )
        elif typ == b"stsc" and trak is not None and plen >= 8 and want_tables:
            n_entries = min(
                struct.unpack_from(">I", payload, 4)[0], (plen - 8) // 12
            )
            trak["stsc_runs"] = [
                struct.unpack_from(">II", payload, 8 + i * 12)
                for i in range(n_entries)
            ]  # (first_chunk 1-based, samples_per_chunk)
        elif typ == b"stco" and trak is not None and plen >= 8:
            trak["n_chunks"] = struct.unpack_from(">I", payload, 4)[0]
            if trak["n_chunks"] >= 1 and plen >= 12:
                trak["chunk_offset"] = struct.unpack_from(">I", payload, 8)[0]
            if want_tables:
                count = min(trak["n_chunks"], (plen - 8) // 4)
                trak["chunk_offsets"] = list(
                    struct.unpack_from(f">{count}I", payload, 8)
                )
        elif typ == b"co64" and trak is not None and plen >= 8:
            trak["n_chunks"] = struct.unpack_from(">I", payload, 4)[0]
            if trak["n_chunks"] >= 1 and plen >= 16:
                off64 = struct.unpack_from(">Q", payload, 8)[0]
                trak["chunk_offset"] = off64 if off64 < _I64_MAX else None
            if want_tables:
                count = min(trak["n_chunks"], (plen - 8) // 8)
                trak["chunk_offsets"] = [
                    o if o < _I64_MAX else None
                    for o in struct.unpack_from(f">{count}Q", payload, 8)
                ]
        elif typ == b"tfhd" and traf is not None and plen >= 8:
            traf["track_id"] = struct.unpack_from(">I", payload, 4)[0]
        elif typ == b"trun" and traf is not None and plen >= 8:
            count = struct.unpack_from(">I", payload, 4)[0]
            tid = traf.get("track_id")
            frag_samples[tid] = frag_samples.get(tid, 0) + count

    return brand, movie, tracks, frag_samples, n_moof, has_mvex, truncated


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # LongType: mvhd timescale is UNSIGNED u32 — values >= 2^31
        # are spec-legal and overflowed an Int32 column (ADVICE r8)
        T.StructField("timescale", T.LongType()),
        T.StructField("duration", T.LongType()),
        # the media (mdhd) timebase — real encoders use a finer track
        # timebase than the movie's; decoders seek in THIS one
        T.StructField("media_timescale", T.LongType()),
        T.StructField("media_duration", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_fragments", T.IntegerType()),
        T.StructField("sample_size", T.LongType()),
        # stsz's declared sample count — may legitimately differ from
        # the stts n_frames in a malformed file, and the byte planner
        # must see BOTH to refuse ranges past the declared samples
        T.StructField("sample_count", T.LongType()),
        T.StructField("chunk_offset", T.LongType()),
        # LongType: the stco entry count is raw UNSIGNED u32 wire data
        # (reported as declared, even when the table is short — the
        # audit wants to see the lie); >= 2^31 overflowed an Int32
        T.StructField("n_chunks", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def decode_video_meta(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """mapInPandas video-container audit using the REAL ISO-BMFF box
    walk: binary blobs in, (mime, container, brand, width, height,
    timescale, duration, n_frames, n_fragments, sample_size,
    chunk_offset, n_chunks, duration_ms, n_bytes) out.  Progressive
    AND fragmented (CMAF/DASH moof) layouts classify; non-MP4 blobs
    classify as mime='unknown' with NULL fields — the same
    classify-don't-crash contract as the image/WAV parsers.
    Pixel/frame decode stays behind ``decode_stub``; this surfaces
    exactly the metadata a frame-sampling planner needs — including
    the stsz/stco fields that locate each sample's bytes —
    Arrow-batched and map-only."""

    fields = (
        "mime container brand width height timescale duration "
        "media_timescale media_duration n_frames n_fragments "
        "sample_size sample_count chunk_offset n_chunks duration_ms"
    ).split()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {
                k: [] for k in ["doc_id", *fields, "n_bytes"]
            }
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b"" if b is None else bytes(b)
                parsed = parse_mp4_header(blob)
                cols["doc_id"].append(did)
                cols["n_bytes"].append(len(blob))
                if parsed is None:
                    cols["mime"].append("unknown")
                    for k in fields[1:]:
                        cols[k].append(None)
                    continue
                ts, dur = parsed["timescale"], parsed["duration"]
                cols["mime"].append("video/mp4")
                cols["container"].append(parsed["container"])
                cols["brand"].append(parsed["brand"])
                cols["width"].append(parsed["width"])
                cols["height"].append(parsed["height"])
                cols["timescale"].append(ts)
                cols["duration"].append(dur)
                cols["media_timescale"].append(parsed["media_timescale"])
                cols["media_duration"].append(parsed["media_duration"])
                cols["n_frames"].append(parsed["n_frames"])
                cols["n_fragments"].append(parsed["n_fragments"])
                cols["sample_size"].append(parsed["sample_size"])
                cols["sample_count"].append(parsed["sample_count"])
                cols["chunk_offset"].append(parsed["chunk_offset"])
                cols["n_chunks"].append(parsed["n_chunks"])
                cols["duration_ms"].append(
                    round(dur * 1000.0 / ts, 6)
                    if ts and dur is not None
                    else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": cols["doc_id"],
                    "mime": cols["mime"],
                    "container": cols["container"],
                    "brand": cols["brand"],
                    "width": pd.array(cols["width"], dtype="Int32"),
                    "height": pd.array(cols["height"], dtype="Int32"),
                    "timescale": pd.array(cols["timescale"], dtype="Int64"),
                    "duration": pd.array(cols["duration"], dtype="Int64"),
                    "media_timescale": pd.array(
                        cols["media_timescale"], dtype="Int64"
                    ),
                    "media_duration": pd.array(
                        cols["media_duration"], dtype="Int64"
                    ),
                    "n_frames": pd.array(cols["n_frames"], dtype="Int64"),
                    "n_fragments": pd.array(
                        cols["n_fragments"], dtype="Int32"
                    ),
                    "sample_size": pd.array(
                        cols["sample_size"], dtype="Int64"
                    ),
                    "sample_count": pd.array(
                        cols["sample_count"], dtype="Int64"
                    ),
                    "chunk_offset": pd.array(
                        cols["chunk_offset"], dtype="Int64"
                    ),
                    "n_chunks": pd.array(cols["n_chunks"], dtype="Int64"),
                    "duration_ms": cols["duration_ms"],
                    "n_bytes": cols["n_bytes"],
                }
            )

    return df.mapInPandas(batches, VIDEO_META_SCHEMA)


def plan_frame_samples(meta: DataFrame, k: int = 4) -> DataFrame:
    """Uniform frame-sample PLAN over parsed video metadata: for every
    decodable video, ``k`` sample slots j = 0..k-1 map to frame index
    floor(j * n_frames / k) with its presentation tick — the
    deterministic (doc, frame_idx, pts_units, timescale) worklist a
    downstream frame decoder consumes.  Timestamps stay in EXACT
    integer timescale units (pts_units = frame_idx * duration //
    n_frames — a float ms column here would be a cross-engine rounding
    hazard AND a lossy handoff; decoders seek by ticks).

    When the container's sample tables locate the frame bytes — a
    single-chunk stco with a uniform stsz size, the layout flat MP4
    writers produce — the plan also emits (byte_offset, byte_len):
    chunk_offset + frame_idx * sample_size, the EXACT byte range a
    100 TB executor fetches per sampled frame (S3 ranged GET grain) —
    no full-file read, no decode.  Variable-size or multi-chunk
    layouts (and fMP4, whose samples live in per-fragment mdats) get
    NULL byte columns: placing those needs the full stsc/stsz table
    walk, which belongs in the Arrow kernel, not a per-row metadata
    column.  Pure Catalyst (sequence + one posexplode + integer
    `div`), map-only, whole-stage-codegen — the EXPENSIVE part (pixel
    decode) is exactly what this plans and defers."""
    valid = meta.filter(
        (F.col("mime") == "video/mp4") & (F.col("n_frames") > 0)
    )
    slots = F.sequence(F.lit(0), F.lit(k - 1))
    exploded = valid.select(
        "doc_id",
        "n_frames",
        "duration",
        "timescale",
        "sample_size",
        "sample_count",
        "chunk_offset",
        "n_chunks",
        F.posexplode(slots).alias("sample_rank", "j"),
    ).withColumn(
        "frame_idx",
        F.expr("(j * n_frames) div " + str(int(k))).cast("long"),
    )
    # sample_count >= n_frames: a malformed single-chunk file whose
    # stsc/stsz declare FEWER samples than the stts frame count would
    # otherwise plan ranges past the real chunk (ADVICE r9) — the
    # byte arithmetic is only valid for frames the tables declare
    byte_addressable = (
        F.col("sample_size").isNotNull()
        & F.col("chunk_offset").isNotNull()
        & (F.col("n_chunks") == 1)
        & (F.col("sample_count") >= F.col("n_frames"))
    )
    return exploded.select(
        "doc_id",
        F.col("sample_rank").cast("int").alias("sample_rank"),
        "frame_idx",
        F.expr("(frame_idx * duration) div n_frames")
        .cast("long")
        .alias("pts_units"),
        "timescale",
        F.when(
            byte_addressable,
            F.col("chunk_offset") + F.col("frame_idx") * F.col("sample_size"),
        )
        .cast("long")
        .alias("byte_offset"),
        F.when(byte_addressable, F.col("sample_size"))
        .cast("long")
        .alias("byte_len"),
    )


def parse_mp4_sample_tables(blob: bytes) -> dict | None:
    """Full sample-table extraction for a PROGRESSIVE MP4's video
    track: the stsz sizes (uniform or per-sample table), the stsc
    (first_chunk, samples_per_chunk) runs and every stco/co64 chunk
    offset — everything needed to place ANY sample's bytes, including
    the variable-size multi-chunk layouts ``plan_frame_samples``
    correctly declines.  Returns None when the blob is not a
    parseable progressive MP4 with complete tables (fragmented files
    keep their samples in per-fragment mdats; corrupt blobs
    classify).  Same walk, same classify-don't-crash contract as
    ``parse_mp4_header``."""
    walked = _walk_mp4(blob, want_tables=True)
    if walked is None:
        return None
    _, movie, tracks, _, n_moof, has_mvex, truncated = walked
    if truncated or "timescale" not in movie or n_moof or has_mvex:
        return None
    vid = _select_video_track(tracks)
    count = vid.get("sample_count")
    offsets = vid.get("chunk_offsets")
    if not count or not offsets:
        return None
    uniform = vid.get("sample_size")
    sizes = vid.get("sizes")
    if uniform is None and (sizes is None or len(sizes) < count):
        return None
    stsc_runs = vid.get("stsc_runs")
    if stsc_runs is not None and not stsc_runs:
        # a PRESENT stsc whose entry table is empty is an incomplete
        # table, not a single-chunk declaration — defaulting it to
        # [(1, count)] would silently place every sample at the first
        # stco offset even when several chunk offsets exist (ADVICE r9)
        return None
    return {
        "n_frames": count,
        "sample_size": uniform,
        "sizes": None if uniform is not None else sizes,
        # MISSING stsc (flat writers omit it): all samples in chunk 1
        "stsc_runs": stsc_runs or [(1, count)],
        "chunk_offsets": offsets,
    }


def _sample_locations(tables: dict, frame_idxs: "list[int]"):
    """Resolve each frame index to (byte_offset, byte_len) through the
    REAL chunk structure: expand the stsc runs over the stco chunk
    list to find the frame's chunk, then add the sizes of the earlier
    samples in that chunk to the chunk's offset.  Unresolvable frames
    (index beyond the declared samples, chunk capacity short, co64
    offset out of signed range) yield (None, None) — malformed tables
    classify, never raise."""
    import bisect

    offsets = tables["chunk_offsets"]
    runs = sorted(tables["stsc_runs"])
    count = tables["n_frames"]
    uniform = tables["sample_size"]
    sizes = tables["sizes"]

    # first-sample index and samples-per-chunk for every chunk
    starts: list[int] = []
    spc: list[int] = []
    ri, cur = 0, 0
    for c in range(len(offsets)):
        while ri + 1 < len(runs) and runs[ri + 1][0] <= c + 1:
            ri += 1
        per = runs[ri][1] if runs else 0
        starts.append(cur)
        spc.append(per)
        cur += per

    if uniform is None:
        pre = [0]
        for s in sizes:
            pre.append(pre[-1] + s)

    out = []
    for fi in frame_idxs:
        if fi >= min(count, cur) or (uniform is None and fi >= len(sizes)):
            out.append((None, None))
            continue
        c = bisect.bisect_right(starts, fi) - 1
        if c < 0 or fi >= starts[c] + spc[c] or offsets[c] is None:
            out.append((None, None))
            continue
        if uniform is not None:
            out.append((offsets[c] + (fi - starts[c]) * uniform, uniform))
        else:
            out.append((offsets[c] + pre[fi] - pre[starts[c]], sizes[fi]))
    return out


FRAME_BYTES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rank", T.IntegerType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("byte_len", T.LongType()),
    ]
)


def index_frame_bytes(
    df: DataFrame, k: int = 4, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """GENERAL frame-byte indexer: the Arrow kernel that places k
    uniform sample slots per video through the container's FULL
    stsz/stsc/stco tables — variable sample sizes and multi-chunk
    layouts included, exactly the cases where ``plan_frame_samples``'s
    Catalyst arithmetic correctly emits NULL.  One row per resolvable
    video per slot: (doc_id, sample_rank, frame_idx, byte_offset,
    byte_len), the ranged-GET worklist.  Blobs that are not
    progressive MP4s with complete tables emit no rows; frames the
    tables cannot place get NULL byte columns.  Scale shape: map-only
    Arrow batches, the per-blob table walk is O(tables + k log
    chunks) — the explode happens INSIDE the kernel, so no metadata
    row ever carries a per-sample array through a shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ranks, fidx, offs, lens = [], [], [], [], []
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b"" if b is None else bytes(b)
                tables = parse_mp4_sample_tables(blob)
                if tables is None:
                    continue
                nf = tables["n_frames"]
                frames = [(j * nf) // k for j in range(k)]
                for j, (fi, (off, ln)) in enumerate(
                    zip(frames, _sample_locations(tables, frames))
                ):
                    ids.append(did)
                    ranks.append(j)
                    fidx.append(fi)
                    offs.append(off)
                    lens.append(ln)
            yield pd.DataFrame(
                {
                    # explicit dtype: a batch with ONLY unresolvable
                    # blobs yields empty lists, and a bare [] infers
                    # float64 — wrong for the long schema column
                    "doc_id": pd.array(ids, dtype="Int64"),
                    "sample_rank": pd.array(ranks, dtype="Int32"),
                    "frame_idx": pd.array(fidx, dtype="Int64"),
                    "byte_offset": pd.array(offs, dtype="Int64"),
                    "byte_len": pd.array(lens, dtype="Int64"),
                }
            )

    return df.mapInPandas(batches, FRAME_BYTES_SCHEMA)


FRAME_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rank", T.IntegerType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def fetch_frame_bytes(
    df: DataFrame, k: int = 4, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """EXECUTE the frame-byte plan: plan k sample slots per video
    through the full sample tables (same walk as
    ``index_frame_bytes``), then actually READ each planned
    (byte_offset, byte_len) slice out of the blob and summarize the
    fetched content — ``first_byte`` (the slice's leading byte value)
    and ``byte_sum`` (sum of all byte values in the slice).  This is
    the last hop of the byte-range loop: an oracle that predicts the
    checksums from the container's synthesis arithmetic proves
    plan -> I/O -> CONTENT end to end, not just that offsets look
    plausible.  A planned range that cannot be fetched — unresolvable
    frame, or a range ending past the blob — keeps its plan columns
    but reports NULL for BOTH checksums, the fetch-failure signal a
    100 TB executor logs instead of crashing.  A legal ZERO-LENGTH
    sample (stsz size 0) is a SUCCESSFUL empty fetch, distinct from
    failure by convention (ADVICE r10): ``byte_sum`` 0 with
    ``first_byte`` NULL (no leading byte exists in an empty slice) —
    so ``byte_sum IS NULL`` alone is the failure predicate.  Scale
    shape: map-only Arrow
    batches; at scale the slice is an S3 ranged GET against the
    object the plan row points at, and the checksum is the integrity
    receipt the audit stores per fetched frame."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {
                f: []
                for f in (
                    "doc_id sample_rank frame_idx byte_offset byte_len "
                    "first_byte byte_sum"
                ).split()
            }
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b"" if b is None else bytes(b)
                tables = parse_mp4_sample_tables(blob)
                if tables is None:
                    continue
                nf = tables["n_frames"]
                frames = [(j * nf) // k for j in range(k)]
                for j, (fi, (off, ln)) in enumerate(
                    zip(frames, _sample_locations(tables, frames))
                ):
                    cols["doc_id"].append(did)
                    cols["sample_rank"].append(j)
                    cols["frame_idx"].append(fi)
                    cols["byte_offset"].append(off)
                    cols["byte_len"].append(ln)
                    if off is None or ln is None or off + ln > len(blob):
                        cols["first_byte"].append(None)
                        cols["byte_sum"].append(None)
                        continue
                    sl = blob[off : off + ln]
                    cols["first_byte"].append(sl[0] if ln else None)
                    cols["byte_sum"].append(sum(sl))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(cols["doc_id"], dtype="Int64"),
                    "sample_rank": pd.array(
                        cols["sample_rank"], dtype="Int32"
                    ),
                    "frame_idx": pd.array(cols["frame_idx"], dtype="Int64"),
                    "byte_offset": pd.array(
                        cols["byte_offset"], dtype="Int64"
                    ),
                    "byte_len": pd.array(cols["byte_len"], dtype="Int64"),
                    "first_byte": pd.array(
                        cols["first_byte"], dtype="Int32"
                    ),
                    "byte_sum": pd.array(cols["byte_sum"], dtype="Int64"),
                }
            )

    return df.mapInPandas(batches, FRAME_FETCH_SCHEMA)
