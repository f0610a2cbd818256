"""Gorilla-style time-series compression: delta-of-delta timestamps +
XOR-encoded float values (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015, §4.1).

The reference engine has nothing comparable (GMQL stores text files,
``StoreTABRD.scala:23-95``); this is the north-rule storage codec for
rolled-up points. Layout per stream:

timestamps (µs int64):
    [64b first ts][zigzag-varint-free dod blocks]
    dod == 0                  -> '0'
    dod in [-63, 64]          -> '10'  + 7  bits (dod + 63)
    dod in [-255, 256]        -> '110' + 9  bits (dod + 255)
    dod in [-2047, 2048]      -> '1110'+ 12 bits (dod + 2047)
    else                      -> '1111'+ 64 bits raw two's complement

values (float64 bit patterns):
    [64b first value]
    xor == 0                  -> '0'
    leading/trailing window fits previous -> '10' + meaningful bits
    else '11' + 5b n_leading + 6b n_meaningful + meaningful bits

Encoders/decoders are pure numpy+python over per-stream arrays (bounded:
one stream = one (conv bucket, tier) series); the Spark integration is a
grouped-map Arrow UDF (``applyInPandas``) so no per-row Python crosses
the JVM boundary — batches arrive as numpy arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64 = (1 << 64) - 1


class _BitWriter:
    """MSB-first bit packer. The accumulator is flushed to a bytearray
    whenever it exceeds ``_FLUSH`` bits, so total cost is O(n) in stream
    bits (a single growing bignum would make every write shift the whole
    stream — O(n²), ~10x wall on real series). ``write_zeros`` appends a
    run of '0' bits without materializing a huge shifted integer."""

    __slots__ = ("acc", "nbits", "out")
    _FLUSH = 1 << 12  # flush at 4096 bits; acc stays a small int

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def _flush_whole_bytes(self):
        emit_bits = self.nbits - (self.nbits % 8)
        if emit_bits:
            rem = self.nbits - emit_bits
            self.out += (self.acc >> rem).to_bytes(emit_bits // 8, "big")
            self.acc &= (1 << rem) - 1
            self.nbits = rem

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        if self.nbits >= self._FLUSH:
            self._flush_whole_bytes()

    def write_zeros(self, bits: int):
        # byte-align via the accumulator, then extend with zero bytes
        while bits > 0 and (self.nbits % 8 or bits < 8):
            self.write(0, 1)
            bits -= 1
        if bits >= 8:
            self._flush_whole_bytes()
            self.out += b"\x00" * (bits // 8)
            bits %= 8
        if bits:
            self.write(0, bits)

    def bytes(self) -> bytes:
        pad = (-self.nbits) % 8
        total = self.nbits + pad
        tail = (self.acc << pad).to_bytes(total // 8, "big") if total else b""
        return bytes(self.out) + tail


class _BitReader:
    """MSB-first reader over 64-bit words: each ``read`` touches at most
    two words — O(1) per read (an all-stream bignum shifted per read is
    O(n) per read, O(n²) per stream)."""

    __slots__ = ("words", "bitpos", "nbits")

    def __init__(self, data: bytes):
        pad = (-len(data)) % 8
        buf = data + b"\x00" * pad
        self.words = np.frombuffer(buf, dtype=">u8").astype(np.uint64) if buf else np.empty(
            0, dtype=np.uint64
        )
        self.bitpos = 0
        self.nbits = len(data) * 8

    def read(self, bits: int) -> int:
        pos = self.bitpos
        self.bitpos = pos + bits
        wi, off = pos >> 6, pos & 63
        avail = 64 - off
        w0 = int(self.words[wi]) if wi < len(self.words) else 0
        if bits <= avail:
            return (w0 >> (avail - bits)) & ((1 << bits) - 1)
        hi = w0 & ((1 << avail) - 1)
        need = bits - avail
        w1 = int(self.words[wi + 1]) if wi + 1 < len(self.words) else 0
        return (hi << need) | (w1 >> (64 - need))



def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 microsecond timestamps (sorted)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    w = _BitWriter()
    if len(ts) == 0:
        return b""
    w.write(int(ts[0]) & _U64, 64)
    if len(ts) == 1:
        return w.bytes()
    deltas = np.diff(ts)
    dods = np.diff(deltas, prepend=deltas[0] - deltas[0])
    dods[0] = deltas[0]  # first delta stored as a dod against 0
    # regular cadence -> almost all dods are 0; batch each zero run as a
    # single write_zeros instead of n one-bit writes (numpy finds the
    # runs, Python only touches the exceptional points)
    nz = np.flatnonzero(dods)
    prev = 0
    for i in nz.tolist():
        if i > prev:
            w.write_zeros(i - prev)
        # token = tag and payload fused into ONE write (same bit layout,
        # half the writer calls — the encoder hot path is call overhead)
        dod = int(dods[i])
        if -63 <= dod <= 64:
            w.write((0b10 << 7) | (dod + 63), 9)
        elif -255 <= dod <= 256:
            w.write((0b110 << 9) | (dod + 255), 12)
        elif -2047 <= dod <= 2048:
            w.write((0b1110 << 12) | (dod + 2047), 16)
        else:
            w.write((0b1111 << 64) | (dod & _U64), 68)
        prev = i + 1
    if len(dods) > prev:
        w.write_zeros(len(dods) - prev)
    return w.bytes()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_timestamps`; ``n`` = point count.

    The token walk is a single tight loop over plain-int words (the
    word array converted ONCE with ``tolist`` — per-access numpy scalar
    conversion was ~half the old walk's cost): each token classifies
    itself from one 16-bit header grab (covers every class tag + the
    7/9/12-bit small payloads in one shift-and-mask; the rare 64-bit
    raw class takes one extra two-word grab), zero runs (constant
    cadence) count word-at-a-time via ``bit_length``, and the rebuilt
    timestamps accumulate in a Python list (scalar numpy stores are
    slower than list writes) converted once at the end. Measured 3.4x
    over the previous per-field _BitReader walk on 500k
    high-entropy-cadence points; low-entropy streams keep the
    word-batched zero-run fast path."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = _BitReader(data)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    words = r.words.tolist()
    words += [0, 0]  # header grabs past the end read zero bits
    pos = 64
    out = [0] * n
    out[0] = first
    last = first
    delta = 0
    i = 1
    while i < n:
        wi = pos >> 6
        off = pos & 63
        chunk = (words[wi] << off) & _U64
        lz = 64 - chunk.bit_length()
        if lz:
            # dod==0 run (constant cadence), possibly spanning words
            limit = n - i
            z = 0
            while z < limit:
                wi = pos >> 6
                off = pos & 63
                chunk = (words[wi] << off) & _U64
                avail = 64 - off
                rem = limit - z
                if avail > rem:
                    avail = rem
                lz = 64 - chunk.bit_length()
                take = lz if lz < avail else avail
                z += take
                pos += take
                if take < avail:
                    break
            for _ in range(z):
                last += delta
                out[i] = last
                i += 1
            if i >= n:
                break
            wi = pos >> 6
            off = pos & 63
        # token at pos: '10'+7 / '110'+9 / '1110'+12 / '1111'+64.
        # One 16-bit grab covers every tag + small payload.
        if off <= 48:
            hdr = (words[wi] >> (48 - off)) & 0xFFFF
        else:
            hdr = (((words[wi] << 64) | words[wi + 1]) >> (112 - off)) & 0xFFFF
        if (hdr >> 14) & 1 == 0:  # '10' + 7
            dod = ((hdr >> 7) & 0x7F) - 63
            pos += 9
        elif (hdr >> 13) & 1 == 0:  # '110' + 9
            dod = ((hdr >> 4) & 0x1FF) - 255
            pos += 12
        elif (hdr >> 12) & 1 == 0:  # '1110' + 12
            dod = (hdr & 0xFFF) - 2047
            pos += 16
        else:  # '1111' + 64 raw two's complement
            p2 = pos + 4
            wi2 = p2 >> 6
            off2 = p2 & 63
            if off2 == 0:
                dod = words[wi2]
            else:
                dod = (((words[wi2] << 64) | words[wi2 + 1]) >> (64 - off2)) & _U64
            if dod >= 1 << 63:
                dod -= 1 << 64
            pos += 68
        delta += dod
        last += delta
        out[i] = last
        i += 1
    return np.asarray(out, dtype=np.int64)


def encode_values(vals: np.ndarray) -> bytes:
    """XOR-encode float64 values (bit patterns; NaN/inf safe)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    if len(bits) == 0:
        return b""
    w.write(int(bits[0]), 64)
    # vectorized consecutive xors; repeated values -> xor 0 runs batched
    xors = np.bitwise_xor(bits[1:], bits[:-1])
    nz = np.flatnonzero(xors)
    lead, trail = 65, 65  # invalid -> first non-zero xor writes a header
    prev_i = 0
    for i in nz.tolist():
        if i > prev_i:
            w.write_zeros(i - prev_i)
        # header and payload fused into ONE writer call per token (same
        # bit layout; the per-call overhead was the encoder hot path)
        xor = int(xors[i])
        xl = 64 - xor.bit_length()  # leading zeros
        xt = (xor & -xor).bit_length() - 1  # trailing zeros
        if xl > 31:
            xl = 31
        if lead <= 64 and xl >= lead and xt >= trail:
            nbits = 64 - lead - trail
            w.write((0b10 << nbits) | (xor >> trail), 2 + nbits)
        else:
            lead, trail = xl, xt
            nsig = 64 - xl - xt
            w.write(
                (((0b11 << 5 | xl) << 6 | (nsig & 0x3F)) << nsig) | (xor >> xt),
                13 + nsig,
            )
        prev_i = i + 1
    if len(xors) > prev_i:
        w.write_zeros(len(xors) - prev_i)
    return w.bytes()


def decode_values(data: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_values`.

    Two-pass: a light sequential walk over the CONTROL bits only
    (variable-length headers are inherently data-dependent) records each
    exceptional point's payload position/width, then one vectorized
    numpy pass extracts all payloads from the word array and rebuilds
    the values as a single XOR-prefix ``bitwise_xor.accumulate`` (xor==0
    runs stay zero in the scatter array, so repeated values fall out of
    the accumulate for free).

    The walk itself is a tight plain-int loop (words ``tolist``-ed once;
    no per-access numpy scalar conversion, no _BitReader calls): the
    full token header — '1' flag + class bit + 5b lead + 6b nsig, 13
    bits max — comes from ONE shift-and-mask grab, zero runs count
    word-at-a-time via ``bit_length``. Measured 2.6x over the previous
    per-field walk on a 500k-point random-walk series (cumulative 3.5x
    over the round-2 per-point extract+store loop); golden format
    unchanged."""
    xors = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return xors.view(np.float64)
    r = _BitReader(data)
    xors[0] = r.read(64)
    words = r.words.tolist()
    words += [0, 0]  # header grabs past the end read zero bits
    pos = 64
    lead = trail = 0
    i = 1
    idxs: list[int] = []
    poss: list[int] = []
    sigs: list[int] = []
    trls: list[int] = []
    ai, ap, asg, at = idxs.append, poss.append, sigs.append, trls.append
    while i < n:
        wi = pos >> 6
        off = pos & 63
        chunk = (words[wi] << off) & _U64
        lz = 64 - chunk.bit_length()
        if lz:
            # xor==0 run (repeated values), possibly spanning words
            limit = n - i
            z = 0
            while z < limit:
                wi = pos >> 6
                off = pos & 63
                chunk = (words[wi] << off) & _U64
                avail = 64 - off
                rem = limit - z
                if avail > rem:
                    avail = rem
                lz = 64 - chunk.bit_length()
                take = lz if lz < avail else avail
                z += take
                pos += take
                if take < avail:
                    break
            i += z
            if i >= n:
                break
            wi = pos >> 6
            off = pos & 63
        # token header at pos: [1][class][5b lead][6b nsig] = 13 bits max
        if off <= 51:
            hdr = (words[wi] >> (51 - off)) & 0x1FFF
        else:
            hdr = (((words[wi] << 64) | words[wi + 1]) >> (115 - off)) & 0x1FFF
        if (hdr >> 11) & 1:  # '11' new leading/meaningful window
            lead = (hdr >> 6) & 0x1F
            nsig = hdr & 0x3F
            if nsig == 0:
                nsig = 64
            trail = 64 - lead - nsig
            pos += 13
        else:  # '10' reuse previous window
            nsig = 64 - lead - trail
            pos += 2
        ai(i)
        ap(pos)
        asg(nsig)
        at(trail)
        pos += nsig  # payload skipped here, extracted vectorized below
        i += 1
    if idxs:
        words = r.words
        p = np.asarray(poss, dtype=np.int64)
        s = np.asarray(sigs, dtype=np.uint64)
        t = np.asarray(trls, dtype=np.uint64)
        wi = p >> 6
        off = (p & 63).astype(np.uint64)
        w0 = words[wi]
        w1 = words[np.minimum(wi + 1, len(words) - 1)]
        w1 = np.where(wi + 1 < len(words), w1, np.uint64(0))
        # 64-bit window starting at each payload's bit position; the
        # off==0 lane of the shift is garbage (shift by 64) but masked
        safe = (np.uint64(64) - off) % np.uint64(64)
        chunk = np.where(off == 0, w0, (w0 << off) | (w1 >> safe))
        payload = chunk >> (np.uint64(64) - s)
        xors[np.asarray(idxs)] = payload << t
    return np.bitwise_xor.accumulate(xors).view(np.float64)


# ------------------------------------------------------- Spark integration

def compress_series(
    df,
    keys=("conv_id",),
    ts_col: str = "window_start",
    value_col: str = "latency_p50",
):
    """One output row per key group with the packed streams.

    Plan: ``repartition(keys) → sortWithinPartitions(keys, ts) →
    mapInPandas`` over the sorted stream, encoding every complete group
    in an Arrow batch and carrying the batch-spanning tail group to the
    next batch. Same shuffle as ``groupBy(keys).applyInPandas`` but ONE
    Python call per Arrow batch instead of one per group — with millions
    of conversation groups the per-group call overhead dominates the
    codec itself (~3x wall measured at 20k groups).

    Each packed row carries ``ts_min_us``/``ts_max_us`` — per-stream
    zone maps (the compressed-chunk min/max sparse index pattern): a
    time-range read prunes whole streams on these plain long columns
    (parquet min/max stats + row filter) WITHOUT touching the packed
    bytes — see ``read_series_range``."""
    keys = list(keys)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_points long, ts_min_us long, ts_max_us long"
        + ", ts_bytes binary, val_bytes binary"
    )

    def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        # groups are CONTIGUOUS in the sorted stream: find boundaries
        # with one vectorized key-change scan and slice shared numpy
        # arrays — pandas groupby cost ~100 µs/group dominated the
        # encoder at warehouse group counts (measured ~2x whole-path)
        key_arrs = [pdf[k].to_numpy() for k in keys]
        n_rows = len(pdf)
        change = np.zeros(n_rows, dtype=bool)
        change[0] = True
        for arr in key_arrs:
            change[1:] |= arr[1:] != arr[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n_rows)
        ts_all = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals_all = pdf[value_col].to_numpy(dtype=np.float64)
        n_pts, t_lo, t_hi, ts_b, val_b = [], [], [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            ts_us = ts_all[s:e]
            n_pts.append(e - s)
            t_lo.append(int(ts_us[0]))  # stream arrives ts-sorted
            t_hi.append(int(ts_us[-1]))
            ts_b.append(encode_timestamps(ts_us))
            val_b.append(encode_values(vals_all[s:e]))
        return pd.DataFrame(
            {
                **{k: arr[starts] for k, arr in zip(keys, key_arrs)},
                "n_points": n_pts,
                "ts_min_us": t_lo,
                "ts_max_us": t_hi,
                "ts_bytes": ts_b,
                "val_bytes": val_b,
            }
        )

    def _encode(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # the last key's rows may continue in the next batch
            last = pdf[keys].iloc[-1]
            tail_mask = (pdf[keys] == last).all(axis=1)
            # groups are contiguous (sorted stream): the tail is the
            # contiguous run at the end
            first_tail = len(pdf) - int(tail_mask[::-1].cumprod().sum())
            complete, pending = pdf.iloc[:first_tail], pdf.iloc[first_tail:]
            if len(complete):
                yield _encode_groups(complete)
        if pending is not None and len(pending):
            yield _encode_groups(pending)

    sorted_df = df.repartition(*keys).sortWithinPartitions(*keys, ts_col)
    return sorted_df.mapInPandas(_encode, schema=schema)


def read_series_range(packed, start, end, keys=("conv_id",)):
    """Decode only the streams whose [ts_min_us, ts_max_us] zone map
    overlaps [start, end), then row-filter to the exact range.

    The stream-level prune is a plain long-column predicate — on a
    parquet-backed packed table it rides row-group min/max stats, so a
    narrow dashboard range over years of compressed tiers decodes only
    the chunks it touches (the compressed-chunk sparse-index read
    pattern; the reference engine always rescans its text files).
    ``start``/``end`` are datetimes (or anything Spark casts to
    timestamp); the row filter is half-open [start, end)."""
    from pyspark.sql import functions as F

    lo = F.unix_micros(F.lit(start).cast("timestamp"))
    hi = F.unix_micros(F.lit(end).cast("timestamp"))
    pruned = packed.filter((F.col("ts_min_us") < hi) & (F.col("ts_max_us") >= lo))
    out = decompress_series(pruned, keys=keys)
    return out.filter(
        (F.unix_micros("window_start") >= lo) & (F.unix_micros("window_start") < hi)
    )


def decompress_series(df, keys=("conv_id",)):
    """Unpack streams back to (keys, window_start, value) rows via a
    vectorized Arrow batch UDF (``mapInPandas``)."""
    keys = list(keys)
    schema = ", ".join(f"{k} string" for k in keys) + ", window_start timestamp, value double"

    def _decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # decode each stream to numpy, assemble ONE frame per Arrow
            # batch (a pandas DataFrame per row is ~10x slower than the
            # codec itself)
            ns = pdf["n_points"].to_numpy(dtype=np.int64)
            ts_parts = [
                decode_timestamps(b, int(n)) for b, n in zip(pdf["ts_bytes"], ns)
            ]
            val_parts = [decode_values(b, int(n)) for b, n in zip(pdf["val_bytes"], ns)]
            out = {
                k: np.repeat(pdf[k].to_numpy(), ns) for k in keys
            }
            out["window_start"] = (
                np.concatenate(ts_parts) if ts_parts else np.empty(0, np.int64)
            ).astype("datetime64[us]")
            out["value"] = np.concatenate(val_parts) if val_parts else np.empty(0)
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, schema=schema)
