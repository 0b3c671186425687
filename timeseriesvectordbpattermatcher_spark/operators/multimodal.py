"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``modality`` tag and a metadata struct; the decode / feature-extract /
resize / frame-sample kernels run as ``mapInPandas`` batch UDFs.

Decode support (all pure stdlib/numpy — no external media libraries):

- **WAV** (RIFF/WAVE, 8/16-bit PCM) via stdlib :mod:`wave` — real audio
  features: duration, rms, zero-crossing rate, 8-band FFT log energies.
- **PPM** (binary P6, 8-bit) and **BMP** (24bpp BI_RGB) via pure numpy —
  real image features: dims, per-channel moments, luma quantiles,
  gradient energies.
- **Compressed formats** (JPEG/PNG/MP3/MP4/…) need Pillow/ffmpeg, which
  are not present in this container: those payloads raise
  ``NotImplementedError`` unless ``fake=True``, in which case a
  deterministic fake decoder (seeded by the payload digest) produces
  stable pseudo-features so the Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — stays testable for
  them too. Swapping in Pillow/ffmpeg on a real cluster only adds
  branches to ``_decode_one``; every decoded row carries a ``decoder``
  tag so fake and real features can never be confused downstream.

A corrupt payload of a *recognized* format (truncated PPM, 8bpp BMP, …)
never kills the job: the kernel records ``decode_ok=false, decoder='error'``
and moves on — at 100 TB a handful of corrupt blobs per billion is the
norm, and one of them must not fail a 6-hour stage.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id string, modality string, feat array<float>, "
    "decode_ok boolean, decoder string"
)


def synth_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata typed."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m{i:05d}",
                modality,
                bytearray(payload),
                64 + (i % 4) * 32 if modality != "audio" else None,
                64 + (i % 3) * 32 if modality != "audio" else None,
                (i % 30) + 1 if modality == "video" else None,
                16000 if modality == "audio" else None,
            )
        )
    # few synthetic rows: cap partitions so we don't spin up one Python
    # worker per core for a handful of payloads (real tables keep their
    # native partitioning)
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def encode_bmp(img: np.ndarray) -> bytes:
    """Write an (h, w, 3) uint8 RGB array as an uncompressed 24bpp BI_RGB
    BMP (bottom-up rows, BGR on disk, stride padded to 4 bytes)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = b"".join(row.tobytes() + pad for row in img[::-1, :, ::-1])
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def synth_real_media(spark, n_rows: int = 24, seed: int = 7) -> DataFrame:
    """Deterministic media table whose payloads are VALID uncompressed
    WAV / PPM / BMP bytes, so ``extract_media_features(fake=False)``
    exercises the real stdlib decoders end-to-end. One generator pass,
    fixed rng consumption order — reproducible for the engine-free oracle
    (which re-decodes the same bytes independently)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ("wav", "ppm", "bmp")[i % 3]
        if kind == "wav":
            rate = 8000
            n = 400 + 40 * (i % 5)
            t = np.arange(n) / rate
            freq = 200.0 + 50.0 * (i % 7)
            x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
            pcm16 = (np.clip(x, -1.0, 1.0) * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(pcm16.tobytes())
            rows.append((f"r{i:05d}", "audio", bytearray(buf.getvalue()),
                         None, None, None, rate))
        elif kind == "ppm":
            w_, h_ = 16 + 4 * (i % 4), 12 + 4 * (i % 3)
            img = rng.integers(0, 256, size=(h_, w_, 3), dtype=np.uint8)
            img[..., 0] = np.linspace(0, 255, w_).astype(np.uint8)[None, :]
            payload = b"P6\n%d %d\n255\n" % (w_, h_) + img.tobytes()
            rows.append((f"r{i:05d}", "image", bytearray(payload),
                         w_, h_, None, None))
        else:
            # odd widths exercise the 4-byte row-stride padding path
            w_, h_ = 15 + (i % 4), 10 + (i % 3)
            img = rng.integers(0, 256, size=(h_, w_, 3), dtype=np.uint8)
            rows.append((f"r{i:05d}", "image", bytearray(encode_bmp(img)),
                         w_, h_, None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(2)


# --------------------------------------------------------------------------
# real decoders (stdlib + numpy only)
# --------------------------------------------------------------------------


def _sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniff for the formats the stdlib can decode. BMP's 'BM'
    magic is weak (2 bytes), so a parse failure after a positive sniff is
    still handled as a decode *error*, never a crash."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"P6" and len(payload) > 2 and payload[2:3] in b" \t\n\r\x0b\x0c#":
        return "ppm"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    return None


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed PCM WAV -> (mono float64 samples in [-1, 1], rate).

    8-bit PCM is unsigned (offset 128), 16-bit signed little-endian;
    multi-channel is averaged to mono. Compressed WAV (wFormatTag != PCM)
    raises ``wave.Error`` from the stdlib parser."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw} (only 8/16-bit PCM)")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    if len(x) == 0:
        raise ValueError("WAV contains no samples")
    return x, rate


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> (h, w, 3) uint8 RGB. Header ints
    may be separated by any whitespace and '#' comment lines per the spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if not (0 < maxval < 256 and w > 0 and h > 0):
        raise ValueError(f"unsupported PPM geometry w={w} h={h} maxval={maxval}")
    pos += 1  # exactly one whitespace byte after maxval per spec
    need = w * h * 3
    data = payload[pos : pos + need]
    if len(data) < need:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24bpp BI_RGB BMP -> (h, w, 3) uint8 RGB. Handles the
    4-byte row stride padding, bottom-up (h > 0) and top-down (h < 0) rows,
    and the on-disk BGR channel order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", payload, 10)
    (hsz,) = struct.unpack_from("<I", payload, 14)
    if hsz < 40:
        raise ValueError("BMP header too old (need BITMAPINFOHEADER)")
    w, h = struct.unpack_from("<ii", payload, 18)
    _, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up, h = h > 0, abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP geometry w={w} h={h}")
    stride = (w * 3 + 3) & ~3
    need = stride * h
    data = payload[off : off + need]
    if len(data) < need:
        raise ValueError("truncated BMP payload")
    arr = np.frombuffer(data, np.uint8).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[..., ::-1]  # BGR -> RGB


def audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """16-dim audio feature spec (documented so the engine-free oracle can
    re-derive it): [n_samples, rate, mean, std, rms, peak, zcr, crest,
    log10 power of 8 equal rfft bands]. All math in float64, cast float32."""
    n = len(x)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = (
        float(np.count_nonzero(np.diff(np.signbit(x)))) / (n - 1) if n > 1 else 0.0
    )
    power = np.abs(np.fft.rfft(x)) ** 2
    bands = [float(np.log10(b.sum() + 1e-12)) for b in np.array_split(power, 8)]
    f = np.array(
        [n, rate, float(np.mean(x)), float(np.std(x)), rms, peak, zcr,
         peak / rms if rms > 0 else 0.0, *bands],
        dtype=np.float64,
    )
    return f.astype(np.float32)


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim image feature spec: [w, h, w/h, mean RGB (3), std RGB (3),
    luma mean, luma std, luma quartiles (3), mean |horizontal luma diff|,
    mean |vertical luma diff|]. Luma = 0.299R + 0.587G + 0.114B; quantiles
    use numpy's default linear interpolation; float64 math, float32 out."""
    h, w = img.shape[:2]
    ch = img.reshape(-1, 3).astype(np.float64)
    luma = ch @ np.array([0.299, 0.587, 0.114])
    luma2d = luma.reshape(h, w)
    q25, q50, q75 = np.quantile(luma, [0.25, 0.5, 0.75])
    gx = float(np.mean(np.abs(np.diff(luma2d, axis=1)))) if w > 1 else 0.0
    gy = float(np.mean(np.abs(np.diff(luma2d, axis=0)))) if h > 1 else 0.0
    f = np.array(
        [w, h, w / h, *ch.mean(axis=0), *ch.std(axis=0),
         float(luma.mean()), float(luma.std()), q25, q50, q75, gx, gy],
        dtype=np.float64,
    )
    return f.astype(np.float32)


def _decode_one(payload: bytes, modality: str, fake: bool) -> tuple[np.ndarray, str]:
    """Returns (16-dim float32 features, decoder tag). Real stdlib decode
    for WAV/PPM/BMP; unrecognized formats fall back to the digest-seeded
    fake decoder when ``fake=True``, else raise (compressed formats need
    Pillow/ffmpeg — not present in this container)."""
    fmt = _sniff_format(payload)
    if fmt == "wav":
        x, rate = decode_wav(payload)
        return audio_features(x, rate), "wav"
    if fmt == "ppm":
        return image_features(decode_ppm(payload)), "ppm"
    if fmt == "bmp":
        return image_features(decode_bmp(payload)), "bmp"
    if not fake:
        raise NotImplementedError(
            "payload is not an uncompressed WAV/PPM/BMP; compressed formats "
            "require image/audio libraries not present in this environment — "
            "run with fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(digest[:8], dtype=np.uint64)[0])
    return rng.normal(size=16).astype(np.float32), "fake"


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """decode -> 16-dim feature per media row, Arrow-batched.

    At 100 TB this is the canonical mapInPandas shape: payloads stay inside
    their input partition (no shuffle), one Python worker per core decodes
    an Arrow batch at a time; ``spark.sql.execution.arrow.maxRecordsPerBatch``
    bounds peak memory (payloads can be MBs each).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, decs = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                try:
                    f, dec = _decode_one(bytes(payload), modality, fake)
                    feats.append(f)
                    oks.append(True)
                    decs.append(dec)
                except NotImplementedError:
                    # unsupported format with fake=False: plumbing-only row
                    feats.append(np.zeros(16, dtype=np.float32))
                    oks.append(False)
                    decs.append("unsupported")
                except Exception:
                    # corrupt payload of a recognized format: record and move
                    # on — one bad blob must not kill a 100 TB stage
                    feats.append(np.zeros(16, dtype=np.float32))
                    oks.append(False)
                    decs.append("error")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feat": feats,
                    "decode_ok": oks,
                    "decoder": decs,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index —
    pure Spark exprs (sequence + explode); the decode of each frame is the
    stubbed kernel above."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
