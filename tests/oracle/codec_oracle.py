"""Pure-python oracle for the Gorilla codec contract query — re-derived
from the published algorithm (Pelkonen et al., VLDB'15) and the layout
contract in ``functions/codecs.py``'s module docstring, NOT from the engine
code: different bit-packing mechanism (bit list + ``np.packbits`` here vs
the engine's streaming byte-flush accumulator), different reader (unpacked
bit array + cursor vs byte refill), independent codec walk.

Layout contract being re-implemented:

- XOR floats: varint count, first value raw 64 bits, then per value
  '0' (identical), '10' + meaningful bits in the previous (lead, len)
  window, or '11' + 5-bit lead (capped 31) + 6-bit meaningful length
  (64 encodes as 0) + meaningful bits; the window is reused when the
  current XOR's leading zeros >= previous lead and its trailing zeros
  cover the previous window's tail.
- DoD ints: varint count, first ts raw 64 bits, first delta raw 64 bits,
  then per delta-of-delta D: '0' (D==0), '10'+7b, '110'+9b, '1110'+12b
  (two's-complement ranges [-64,63] / [-256,255] / [-2048,2047]),
  '1111'+64b otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes) -> tuple[int, int]:
    out = shift = pos = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7


class _BitSink:
    """MSB-first bit collector packed once at the end via np.packbits."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, nbits: int) -> None:
        self.bits.extend((value >> (nbits - 1 - i)) & 1 for i in range(nbits))

    def tobytes(self) -> bytes:
        if not self.bits:
            return b""
        return np.packbits(np.asarray(self.bits, dtype=np.uint8)).tobytes()


class _BitCursor:
    """MSB-first reader over an unpacked bit array."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.i = 0

    def take(self, nbits: int) -> int:
        out = 0
        for b in self.bits[self.i : self.i + nbits]:
            out = (out << 1) | int(b)
        self.i += nbits
        return out


def encode_xor_floats_pure(values) -> bytes:
    v = [int(x) for x in np.asarray(values, dtype=np.float64).view(np.uint64)]
    head = _varint(len(v))
    if not v:
        return head
    w = _BitSink()
    w.put(v[0], 64)
    prev_lead = prev_len = -1
    for a, b in zip(v, v[1:]):
        x = a ^ b
        if x == 0:
            w.put(0, 1)
            continue
        lead = min(64 - x.bit_length(), 31)
        trail = (x & -x).bit_length() - 1
        mlen = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and (64 - prev_lead - prev_len) <= trail:
            w.put(0b10, 2)
            w.put(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            w.put(0b11, 2)
            w.put(lead, 5)
            w.put(mlen & 0x3F, 6)
            w.put(x >> trail, mlen)
            prev_lead, prev_len = lead, mlen
    return head + w.tobytes()


def decode_xor_floats_pure(data: bytes) -> np.ndarray:
    n, pos = _read_varint(data)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitCursor(data[pos:])
    cur = r.take(64)
    out[0] = cur
    lead = length = 0
    for i in range(1, n):
        if r.take(1) == 0:
            out[i] = cur
            continue
        if r.take(1) == 1:
            lead = r.take(5)
            length = r.take(6) or 64
        cur ^= r.take(length) << (64 - lead - length)
        out[i] = cur
    return out.view(np.float64)


_DOD = ((0b10, 2, 7, -64, 63), (0b110, 3, 9, -256, 255), (0b1110, 4, 12, -2048, 2047))


def encode_dod_ints_pure(ts) -> bytes:
    t = [int(x) for x in np.asarray(ts, dtype=np.int64)]
    head = _varint(len(t))
    if not t:
        return head
    w = _BitSink()
    w.put(t[0] & ((1 << 64) - 1), 64)
    if len(t) > 1:
        deltas = [b - a for a, b in zip(t, t[1:])]
        w.put(deltas[0] & ((1 << 64) - 1), 64)
        for prev_d, d in zip(deltas, deltas[1:]):
            dd = d - prev_d
            if dd == 0:
                w.put(0, 1)
                continue
            for code, cbits, vbits, lo, hi in _DOD:
                if lo <= dd <= hi:
                    w.put(code, cbits)
                    w.put(dd & ((1 << vbits) - 1), vbits)
                    break
            else:
                w.put(0b1111, 4)
                w.put(dd & ((1 << 64) - 1), 64)
    return head + w.tobytes()


def decode_dod_ints_pure(data: bytes) -> np.ndarray:
    n, pos = _read_varint(data)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    mask = (1 << 64) - 1

    def sext(v: int, bits: int) -> int:
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    r = _BitCursor(data[pos:])
    cur = r.take(64)
    out[0] = sext(cur, 64)
    if n > 1:
        delta = r.take(64)
        cur = (cur + delta) & mask
        out[1] = sext(cur, 64)
        for i in range(2, n):
            if r.take(1):
                if not r.take(1):
                    delta = (delta + sext(r.take(7), 7)) & mask
                elif not r.take(1):
                    delta = (delta + sext(r.take(9), 9)) & mask
                elif not r.take(1):
                    delta = (delta + sext(r.take(12), 12)) & mask
                else:
                    delta = (delta + r.take(64)) & mask
            cur = (cur + delta) & mask
            out[i] = sext(cur, 64)
    return out


def oracle_codec_roundtrip(
    r1m: pd.DataFrame, chunk_secs: int = 86400
) -> pd.DataFrame:
    """(source, bucket_ts, avg_value) 1m rollup rows -> the contract query's
    per-source frame: points are chunked into epoch-aligned windows, each
    chunk encoded (DoD timestamps + XOR values), decoded back, and the
    roundtrip + size stats aggregated per source."""
    df = r1m.copy()
    # epoch seconds; toPandas under an UTC session yields tz-naive UTC
    ts = pd.to_datetime(df["bucket_ts"])
    if getattr(ts.dt, "tz", None) is not None:
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    df["ts_s"] = ts.astype("datetime64[s]").astype("int64")
    df["chunk"] = df["ts_s"] // chunk_secs

    rows = []
    for source, g in df.groupby("source", sort=True):
        comp_bytes = 0
        back_vals: list[np.ndarray] = []
        back_n = 0
        for _, seg in g.groupby("chunk", sort=True):
            seg = seg.sort_values(["ts_s", "avg_value"])
            ts_arr = seg["ts_s"].to_numpy(dtype=np.int64)
            v_arr = seg["avg_value"].to_numpy(dtype=np.float64)
            ts_c = encode_dod_ints_pure(ts_arr)
            v_c = encode_xor_floats_pure(v_arr)
            comp_bytes += len(ts_c) + len(v_c)
            ts_back = decode_dod_ints_pure(ts_c)
            v_back = decode_xor_floats_pure(v_c)
            assert np.array_equal(ts_back, ts_arr)
            back_n += len(ts_back)
            back_vals.append(v_back)
        n_orig = len(g)
        raw_bytes = n_orig * 16
        # floor(v*1e6+0.5)-quantized integer sums — exact and
        # order-independent, mirroring the contract query (the roundtrip is
        # bit-exact, so the multisets are equal and the sums match exactly)
        q6 = lambda a: np.floor(a * 1e6 + 0.5).astype(np.int64)  # noqa: E731
        sum_back = int(q6(np.concatenate(back_vals)).sum())
        sum_orig = int(q6(g["avg_value"].to_numpy(dtype=np.float64)).sum())
        rows.append(
            (
                source,
                back_n,
                back_n == n_orig,
                sum_back == sum_orig,
                comp_bytes,
                raw_bytes,
                # tie-free double quantization, matching the engine's floor
                float(np.floor(raw_bytes / comp_bytes * 100 + 0.5) / 100),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "source", "n_points", "count_ok", "sum_ok",
            "compressed_bytes", "raw_bytes", "compression_ratio",
        ],
    )
