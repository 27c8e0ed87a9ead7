"""Gorilla-style compression of per-period value series.

Implements the two encodings of the public Gorilla paper (Pelkonen et
al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
VLDB 2015) — delta-of-delta for period ids, XOR for float64 values —
as vectorized numpy bit-packing inside Arrow-batched pandas UDFs.
Nothing here is per-row Python at the Spark layer: compression is one
``applyInPandas`` over (group) and decompression one ``mapInPandas``
over blocks.

Block layout (little-endian header, MSB-first bitstream):

    u32 n_points | i64 first_period | u64 first_value_bits
    | ceil(n/8) null bitmap bytes | bitstream

Timestamp (period) deltas-of-deltas per point i>=1 (i==1 uses dod
relative to an implied previous delta of 0):
    dod == 0                  -> '0'
    dod in [-63, 64]          -> '10'   + 7 bits (zigzag offset +63)
    dod in [-255, 256]        -> '110'  + 9 bits (+255)
    dod in [-2047, 2048]      -> '1110' + 12 bits (+2047)
    else                      -> '1111' + 64 bits raw
Value XOR per point i>=1:
    xor == 0                  -> '0'
    reuse previous window     -> '10' + meaningful bits
    new window                -> '11' + 6b leading + 6b (length-1) + bits

NULL values are carried in the bitmap and encoded as a repeat of the
previous value (xor=0), so a long gap costs 1 bit/point. Exact
round-trip is asserted per series (FIXTURES.md F13 invariant); Spark
NULL and NaN both map to NULL on decode (R NA/NaN ≡ Spark NULL parity,
SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd

#: xor entries per fixed-window segment in the vectorized value encoder
_SEG = 512

# ---------------------------------------------------------------- bits


def _pack_chunks(bits: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack (value, bit-length) chunks MSB-first into bytes, fully
    vectorized (grouped-arange scatter, no Python loop)."""
    bits = bits.astype(np.uint64)
    lens = lens.astype(np.int64)
    keep = lens > 0
    bits, lens = bits[keep], lens[keep]
    total = int(lens.sum())
    if total == 0:
        return b""
    offsets = np.cumsum(lens) - lens
    idx = np.arange(total, dtype=np.int64) - np.repeat(offsets, lens)
    shifts = (np.repeat(lens, lens) - 1 - idx).astype(np.uint64)
    bitvals = ((np.repeat(bits, lens) >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bitvals).tobytes()


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (vectorized; 64 for x == 0)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[x > 0] += 1  # bl = bit_length
    return 64 - bl


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (vectorized; 64 for x == 0)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    lowbit = x[nz] & (~x[nz] + np.uint64(1))
    out[nz] = 63 - _clz64(lowbit)[...]
    return out


# ------------------------------------------------------------- encode


def gorilla_encode(periods: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one series (sorted int64 periods, float64 values with
    NaN = NULL) into a Gorilla block. Vectorized except the final
    value-window scan, which is inherently sequential (each point's
    window depends on the previous point's); that scan is still numpy
    array ops per step, not Python object code."""
    periods = np.asarray(periods, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = len(periods)
    if n == 0:
        return np.uint32(0).tobytes()
    null_mask = np.isnan(values)
    # nulls repeat the previous value → xor 0
    vals = values.copy()
    if null_mask[0]:
        vals[0] = 0.0
    filled = pd.Series(vals).ffill().to_numpy()
    vbits = filled.view(np.uint64)

    header = (
        np.uint32(n).tobytes()
        + np.int64(periods[0]).tobytes()
        + vbits[0:1].tobytes()
        + np.packbits(null_mask.astype(np.uint8)).tobytes()
    )
    if n == 1:
        return header

    # --- timestamps: delta of delta, fully vectorized chunking ---
    deltas = np.diff(periods)
    dod = np.diff(np.concatenate([[0], deltas]))
    tb = np.zeros(n - 1, dtype=np.uint64)
    tl = np.zeros(n - 1, dtype=np.int64)
    z = dod == 0
    tb[z], tl[z] = 0, 1
    b1 = ~z & (dod >= -63) & (dod <= 64)
    tb[b1] = (np.uint64(0b10) << np.uint64(7)) | (dod[b1] + 63).astype(np.uint64)
    tl[b1] = 9
    b2 = ~z & ~b1 & (dod >= -255) & (dod <= 256)
    tb[b2] = (np.uint64(0b110) << np.uint64(9)) | (dod[b2] + 255).astype(np.uint64)
    tl[b2] = 12
    b3 = ~z & ~b1 & ~b2 & (dod >= -2047) & (dod <= 2048)
    tb[b3] = (np.uint64(0b1110) << np.uint64(12)) | (dod[b3] + 2047).astype(np.uint64)
    tl[b3] = 16
    b4 = ~z & ~b1 & ~b2 & ~b3
    # '1111' control chunk + 64-bit raw payload chunk
    t_ctrl_b = np.where(b4, np.uint64(0b1111), tb)
    t_ctrl_l = np.where(b4, 4, tl)
    t_pay_b = np.where(b4, dod.view(np.uint64), np.uint64(0))
    t_pay_l = np.where(b4, 64, 0)

    # --- values: XOR with per-segment fixed windows, fully vectorized.
    # The paper's adaptive window-reuse decision is a sequential chain
    # (each point's window depends on the previous point's), which
    # forced a per-point Python loop (~20k points/s). Instead, the
    # series is cut into fixed segments; each segment uses ONE window
    # covering every nonzero xor in it (lead = min leading zeros,
    # trail = min trailing zeros). The segment's first nonzero xor
    # emits a '11' new-window token, all later nonzero xors emit '10'
    # reuse tokens — by construction every xor fits the window, and the
    # DECODER IS UNCHANGED (same token grammar). Cost vs adaptive:
    # one window per segment instead of per regime shift, bounded by
    # 12 bits / _SEG points; gain: pure numpy array passes.
    xors = vbits[1:] ^ vbits[:-1]
    m = n - 1
    lz = _clz64(xors)
    tz = _ctz64(xors)
    nz = xors != np.uint64(0)
    starts = np.arange(0, m, _SEG)
    seg_len = np.minimum(_SEG, m - starts)
    lead = np.repeat(np.minimum.reduceat(np.where(nz, lz, 64), starts), seg_len)
    tzm = np.repeat(np.minimum.reduceat(np.where(nz, tz, 64), starts), seg_len)
    mlen = 64 - lead - tzm  # >= 1 wherever the segment has a nonzero xor
    cs_excl = np.cumsum(nz) - nz
    first_nz = nz & ((cs_excl - np.repeat(cs_excl[starts], seg_len)) == 0)
    reuse = nz & ~first_nz

    v_ctrl_b = np.zeros(m, dtype=np.uint64)
    v_ctrl_l = np.ones(m, dtype=np.int64)  # default: '0' (xor == 0)
    v_pay_b = np.zeros(m, dtype=np.uint64)
    v_pay_l = np.zeros(m, dtype=np.int64)
    v_ctrl_b[first_nz] = (
        (0b11 << 12) | (lead[first_nz] << 6) | (mlen[first_nz] - 1)
    ).astype(np.uint64)
    v_ctrl_l[first_nz] = 14
    v_ctrl_b[reuse] = np.uint64(0b10)
    v_ctrl_l[reuse] = 2
    v_pay_b[nz] = xors[nz] >> tzm[nz].astype(np.uint64)
    v_pay_l[nz] = mlen[nz]

    # interleave: per point, ts-ctrl, ts-pay, v-ctrl, v-pay
    m = n - 1
    bits = np.empty(4 * m, dtype=np.uint64)
    lens = np.empty(4 * m, dtype=np.int64)
    bits[0::4], lens[0::4] = t_ctrl_b, t_ctrl_l
    bits[1::4], lens[1::4] = t_pay_b, t_pay_l
    bits[2::4], lens[2::4] = v_ctrl_b, v_ctrl_l
    bits[3::4], lens[3::4] = v_pay_b, v_pay_l
    return header + _pack_chunks(bits, lens)


# ------------------------------------------------------------- decode


def _word_table(bu: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-BYTE big-endian 64-bit window table: ``W[k]`` holds bytes
    ``bu[k:k+8]`` as one MSB-first word. Built once per block with 8
    shifted ORs over the whole buffer, it turns every later bit-field
    gather into a single element fetch instead of a 9-byte gather + 8
    column shifts (the old per-call shape was ~55% of decode wall)."""
    pb = bu.astype(np.uint64)
    m = len(pb) - 8
    W = np.zeros(m, dtype=np.uint64)
    for j in range(8):
        W |= pb[j : j + m] << np.uint64(56 - 8 * j)
    return W, pb


def _gather_bits(
    words: tuple[np.ndarray, np.ndarray], q: np.ndarray, width: int
) -> np.ndarray:
    """Vectorized extraction of ``width`` (1..64) MSB-first bits at
    arbitrary bit offsets ``q``, using the per-byte word table (buffer
    zero-padded >= 9 bytes past the stream end)."""
    W, pb = words
    byte_idx = (q >> 3).astype(np.int64)
    off = (q & 7).astype(np.uint64)
    # 72-bit window: the aligned-at-byte word plus the following byte
    word = (W[byte_idx] << off) | (
        pb[byte_idx + 8].astype(np.uint64) >> (np.uint64(8) - off)
    )
    return word >> np.uint64(64 - width)


def gorilla_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block → (periods int64, values float64 with NaN for
    encoded NULLs).

    Two passes. Pass 1 is a POSITION scan: it walks the prefix code
    recording, per point, only where each payload lives (bit position,
    width, shift) — never materializing a timestamp or value. The two
    dominant token shapes are probed as fixed-stride runs with one
    numpy mask (run A ``'0' '0'``: 2 bits/point; run B ``'0' '10'+w``:
    ``3+w`` bits/point); a matching run advances the cursor with at
    most three slice fills, and run A writes NOTHING (the deferred
    streams are prefilled with its contribution). Everything else —
    window changes, irregular deltas — steps point-by-point over a
    bytes twin of the bit array (Python-int indexing, no numpy scalar
    overhead), recording positions.

    Pass 2 reconstructs in O(distinct widths) vector ops: timestamp
    payloads gather per width class and integrate with two cumsums
    (delta-of-delta); value payloads gather per window width, shift
    elementwise, and chain with one ``np.bitwise_xor.accumulate`` —
    an xor of 0 (run A, NULL repeats) is the scan's identity, so
    deferral needs no run bookkeeping at all."""
    n = int(np.frombuffer(blob[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    first_p = int(np.frombuffer(blob[4:12], dtype=np.int64)[0])
    first_v = np.frombuffer(blob[12:20], dtype=np.uint64)[0]
    nbytes = (n + 7) // 8
    null_mask = np.unpackbits(
        np.frombuffer(blob[20 : 20 + nbytes], dtype=np.uint8)
    )[:n].astype(bool)

    if n == 1:
        p_arr = np.array([first_p], dtype=np.int64)
        v_arr = np.array([first_v], dtype=np.uint64)
        values = v_arr.view(np.float64)
        values[null_mask] = np.nan
        return p_arr, values

    stream = blob[20 + nbytes :]
    total_bits = 8 * len(stream)
    bits = np.zeros(total_bits + 80, dtype=np.uint8)
    if stream:
        bits[:total_bits] = np.unpackbits(np.frombuffer(stream, dtype=np.uint8))
    bitsb = bits.tobytes()  # Python-int indexing for the scalar walk
    padded = stream + b"\x00" * 17
    bu = np.frombuffer(padded, dtype=np.uint8)
    words = _word_table(bu)

    # deferred per-point payload streams (index 0 = the header point,
    # which contributes nothing)
    tpos = np.full(n, -1, dtype=np.int64)
    twidth = np.zeros(n, dtype=np.int8)
    vpos = np.full(n, -1, dtype=np.int64)
    vwidth = np.zeros(n, dtype=np.int8)
    vshift = np.zeros(n, dtype=np.int8)

    prev_len, shift = -1, 0
    pos = 0
    i = 1
    cooloff = 0
    #: below this run length the probe's numpy dispatch loses to the
    #: scalar walk; after such a run, stay scalar for a while
    min_run = 4
    while i < n:
        if cooloff == 0 and pos < total_bits and bits[pos] == 0:
            rem = n - i
            if bits[pos + 1] == 0:
                # candidate run A: regular period, repeated value.
                # Cap the probe window: the mask is O(kmax) work even
                # when the run ends early, and a capped run re-enters
                # the fast path on the next iteration at zero cost.
                kmax = min(rem, (total_bits - pos + 1) // 2, 4096)
                p = pos + 2 * np.arange(kmax, dtype=np.int64)
                ok = (bits[p] == 0) & (bits[p + 1] == 0)
                k = int(np.argmin(ok)) if not ok.all() else kmax
                if k > 0:
                    # dod 0 and xor 0 are the prefilled defaults:
                    # nothing to record
                    pos += 2 * k
                    i += k
                    cooloff = 0 if k >= min_run else 12
                    continue
            elif prev_len > 0 and bits[pos + 2] == 0:
                # candidate run B: regular period, xor in the current
                # w-bit window — stride 3 + prev_len
                s = 3 + prev_len
                kmax = min(rem, (total_bits - pos + s - 1) // s, 4096)
                if kmax > 0:
                    p = pos + s * np.arange(kmax, dtype=np.int64)
                    ok = (bits[p] == 0) & (bits[p + 1] == 1) & (
                        bits[p + 2] == 0
                    )
                    k = int(np.argmin(ok)) if not ok.all() else kmax
                    if k > 0:
                        vpos[i : i + k] = p[:k] + 3
                        vwidth[i : i + k] = prev_len
                        vshift[i : i + k] = shift
                        pos += s * k
                        i += k
                        cooloff = 0 if k >= min_run else 12
                        continue
        if cooloff:
            cooloff -= 1
        # ---- scalar step: record one point's payload positions -----
        # timestamp: '0' | '10'+7 | '110'+9 | '1110'+12 | '1111'+64
        if bitsb[pos] == 0:
            pos += 1
        elif bitsb[pos + 1] == 0:
            tpos[i] = pos + 2
            twidth[i] = 7
            pos += 9
        elif bitsb[pos + 2] == 0:
            tpos[i] = pos + 3
            twidth[i] = 9
            pos += 12
        elif bitsb[pos + 3] == 0:
            tpos[i] = pos + 4
            twidth[i] = 12
            pos += 16
        else:
            tpos[i] = pos + 4
            twidth[i] = 64
            pos += 68
        # value: '0' | '10'+len bits | '11'+6b lead+6b (len-1)+bits
        if bitsb[pos] == 0:
            pos += 1  # xor == 0: value repeats
        else:
            if bitsb[pos + 1] == 0:  # reuse window
                pos += 2
            else:  # new window: lead/len must resolve NOW (they
                # determine every later '10' width in this regime) —
                # one 12-bit field read over the PACKED stream
                fpos = pos + 2
                fend = fpos + 12
                b0, b1 = fpos >> 3, (fend + 7) >> 3
                word = (
                    int.from_bytes(padded[b0:b1], "big")
                    >> ((b1 << 3) - fend)
                ) & 0xFFF
                lead, prev_len = word >> 6, (word & 63) + 1
                shift = 64 - lead - prev_len
                pos = fend
            vpos[i] = pos
            vwidth[i] = prev_len
            vshift[i] = shift
            pos += prev_len
        i += 1

    # ---- pass 2: vectorized reconstruction --------------------------
    # timestamps: gather dods per width class, then two prefix sums
    dod = np.zeros(n, dtype=np.int64)
    tm = tpos >= 0
    if tm.any():
        for w, bias in ((7, 63), (9, 255), (12, 2047), (64, 0)):
            sel = tm & (twidth == w)
            if sel.any():
                raw = _gather_bits(words, tpos[sel], w)
                # width-64 payloads are raw two's-complement int64;
                # narrower ones carry a bias
                dod[sel] = raw.astype(np.int64) - bias
    p_arr = first_p + np.cumsum(np.cumsum(dod))

    # values: gather xor payloads per window width, shift elementwise,
    # one xor prefix scan (zero-xor points contribute the identity)
    contrib = np.zeros(n, dtype=np.uint64)
    vm = vpos >= 0
    if vm.any():
        for w in np.unique(vwidth[vm]):
            sel = vm & (vwidth == w)
            contrib[sel] = _gather_bits(words, vpos[sel], int(w)) << vshift[
                sel
            ].astype(np.uint64)
    v_arr = first_v ^ np.bitwise_xor.accumulate(contrib)

    values = v_arr.view(np.float64)
    values[null_mask] = np.nan
    return p_arr, values


# -------------------------------------------------------- spark layer


def compress_series(
    df,
    group_vars: Sequence[str],
    period_col: str = "period",
    value_col: str = "value",
    block_size: Optional[int] = 4096,
):
    """Gorilla blocks bounded to ``block_size`` period units each:
    (group_vars…, block, n_points, first_period, last_period,
    raw_bytes, blob). Block key is ``floor(period / block_size)`` — a
    pure function of the row, so blocks are deterministic, decode is
    embarrassingly parallel per block, and a group of any length never
    has to fit in one executor's pandas frame (the Gorilla paper's
    2-hour block discipline, Pelkonen VLDB'15 §4.1). Points per block
    is bounded by block_size because periods are integer grid units.
    ``block_size=None`` keeps the legacy one-block-per-group layout
    (only safe for small bounded series). Uses applyInPandas — one
    Arrow batch per (group, block), numpy inside."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    gv = list(group_vars)
    gfields = [f for f in df.schema.fields if f.name in gv]
    schema = T.StructType(
        gfields
        + [
            T.StructField("block", T.LongType()),
            T.StructField("n_points", T.IntegerType()),
            T.StructField("first_period", T.LongType()),
            T.StructField("last_period", T.LongType()),
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(period_col)
        p = pdf[period_col].to_numpy(dtype=np.int64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        blob = gorilla_encode(p, v)
        out = {g: [pdf[g].iloc[0]] for g in gv}
        out["block"] = [int(pdf["__block"].iloc[0])]
        out["n_points"] = [len(p)]
        out["first_period"] = [int(p[0]) if len(p) else 0]
        out["last_period"] = [int(p[-1]) if len(p) else 0]
        out["raw_bytes"] = [len(p) * 16]
        out["blob"] = [blob]
        return pd.DataFrame(out)

    if block_size is None:
        block_expr = F.lit(0).cast("long")
    else:
        # floor division that is correct for negative periods too
        block_expr = F.floor(F.col(period_col).cast("long") / F.lit(int(block_size)))
    keyed = df.select(*gv, period_col, value_col).withColumn("__block", block_expr)
    return (
        keyed.groupBy(*gv, "__block")
        .applyInPandas(encode, schema)
    )


def decompress_series(
    compressed,
    group_vars: Sequence[str],
    period_col: str = "period",
    value_col: str = "value",
):
    """Explode Gorilla blocks back to (group_vars…, period, value) with
    mapInPandas (streaming over blocks; no per-row Python at the Spark
    layer — each iteration handles a whole block)."""
    import pyspark.sql.types as T

    gv = list(group_vars)
    gfields = [f for f in compressed.schema.fields if f.name in gv]
    schema = T.StructType(
        gfields
        + [
            T.StructField(period_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per batch: decode every blob into numpy, then assemble ONE
        # frame with np.concatenate + np.repeat — per-block pandas
        # frames and pd.concat cost more than the codec itself on
        # 4096-point blocks
        for pdf in batches:
            ps: list[np.ndarray] = []
            vs: list[np.ndarray] = []
            reps: list[int] = []
            for blob in pdf["blob"]:
                p, v = gorilla_decode(bytes(blob))
                ps.append(p)
                vs.append(v)
                reps.append(len(p))
            if not ps:
                continue
            out = pd.DataFrame(
                {
                    period_col: np.concatenate(ps),
                    value_col: np.concatenate(vs),
                }
            )
            for g in gv:
                col = pdf[g]
                if col.dtype == object or str(col.dtype) == "string":
                    # dictionary-encode: np.repeat runs over small int
                    # CODES instead of an object array of Python
                    # strings. NOTE (ADVICE r6, verified against
                    # pyspark 4.1.2): the Arrow serializer casts a
                    # Categorical back to the categories' dtype before
                    # conversion (_create_array: astype(categories.
                    # dtype)), so NO DictionaryArray ships on the wire
                    # — the win is the cheap int-code repeat in this
                    # hot loop, not dictionary transfer.
                    codes, cats = pd.factorize(col)
                    out[g] = pd.Categorical.from_codes(
                        np.repeat(codes, reps), categories=cats
                    )
                else:
                    out[g] = np.repeat(col.to_numpy(), reps)
            yield out[gv + [period_col, value_col]]

    return compressed.mapInPandas(decode, schema)
