"""Sequential + progressive JPEG codec — stdlib + numpy only, no codec
library.  The format is public: ITU-T T.81 / ISO 10918-1 (Annex K for
the example quantization and Huffman tables the encoder uses; the
decoder always reads tables from the stream's DQT/DHT segments; Annex G
for the progressive mode).

Scope (the overwhelmingly common crawl shapes):

- decode: baseline DCT (SOF0; SOF1 extended-sequential Huffman also
  accepted — same scan structure) AND progressive (SOF2: spectral
  selection + successive approximation, DC/AC first and refinement
  scans, EOB runs — coefficients accumulate across scans and
  reconstruct at EOI), 8-bit samples everywhere plus 12-bit on SOF1
  (T.81 Table B.2: level shift 2048, 16-bit DQT, output scaled to the
  8-bit contract by dropping the low 4 bits), grayscale or YCbCr, any
  h/v sampling factors 1-2 (covers 4:4:4, 4:2:2, 4:2:0), restart
  markers (DRI/RSTn), APPn/COM skipped; arithmetic-coded sequential
  (SOF9 + DAC conditioning, Annex D QM-coder + the F.2.4 statistical
  models), and 12-bit on SOF2 (the coefficient accumulators and the
  shared reconstruction are precision-aware).  Arithmetic progressive
  (SOF10), 12-bit arithmetic, restarts-with-arithmetic, and
  hierarchical modes raise ``NotImplementedError``.
- encode (fixture/test helper, the ``encode_png`` pattern): baseline or
  progressive (``progressive=True``: interleaved DC first/refine at
  Al=1->0, per-component AC spectral bands at Al=1, AC refinement —
  exercising every Annex G decode path incl. EOB runs and per-scan
  restarts), quality-scaled Annex K quantization tables, Annex K
  Huffman tables (+ a flat custom AC table for the progressive EOBn
  symbols), grayscale or 4:4:4 / 4:2:2 / 4:2:0 YCbCr — so the decode
  path can be driven with REAL entropy-coded streams and the
  progressive==baseline pixel-identity property test (both encoders
  carry the same quantized coefficients); ``encode_jpeg12`` writes
  the 12-bit extended-sequential grayscale profile with flat custom
  Huffman tables (the Annex K tables stop at the 8-bit categories).

Determinism: all DCT math is float64 with fixed operation order
(matrix IDCT, batched per component), so decoded pixels are
bit-reproducible across runs/hosts — required for the value-oracled
``image_stats`` registry entry.  Performance note: entropy decoding is
an inherently sequential bit stream and runs as a Python loop (the
PNG Average/Paeth caveat) — fine for thumbnails/fixtures; a production
hot path swaps in a C codec behind the same ``decode_image`` seam.
"""

from __future__ import annotations

import functools as _functools
import os
import struct

import numpy as np


_ARITH_CAP_WARNED = False


def _arith_pixel_cap() -> int:
    """Pixel budget for the pure-Python arithmetic decoder, from
    SPARK_GRAFT_ARITH_JPEG_MAX_PIXELS (default 1<<20).  Parsed with a
    warn-once-and-default fallback: a malformed value used to raise
    ValueError at decode time, which the multimodal degrade lane
    swallowed — silently degrading every arithmetic JPEG instead of
    surfacing the config error (ADVICE r11).  Re-read per call (cheap)
    so tests and callers can retune at runtime.  NOTE for cluster
    deployments: the decode runs executor-side, so the variable must be
    set in the EXECUTOR environment (spark.executorEnv.*) — a
    driver-only export does not reach mapInPandas workers."""
    raw = os.environ.get("SPARK_GRAFT_ARITH_JPEG_MAX_PIXELS")
    if raw is None:
        return 1 << 20
    try:
        return int(raw)
    except (TypeError, ValueError):
        global _ARITH_CAP_WARNED
        if not _ARITH_CAP_WARNED:
            _ARITH_CAP_WARNED = True
            import warnings

            warnings.warn(
                "SPARK_GRAFT_ARITH_JPEG_MAX_PIXELS=%r is not an int; "
                "using the 1<<20 default" % (raw,),
                stacklevel=2,
            )
        return 1 << 20


def _zigzag_order() -> list[int]:
    """k-th entry = linear (row*8+col) position of the k-th coefficient
    in zigzag scan order (T.81 Figure 5) — generated, not typed."""
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


_ZZ = np.array(_zigzag_order())

# 8x8 DCT-II basis: _C[u, x] = alpha(u) / 2 * cos((2x+1) u pi / 16);
# forward: F = C @ (f - 128) @ C.T, inverse: f = C.T @ F @ C + 128
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical Huffman table from a DHT (bits[16], values) spec,
    compiled to a 16-bit prefix LUT: ``lut[next16bits] = (symbol << 5)
    | code_length``, -1 for invalid prefixes — one array lookup per
    symbol instead of a bit-at-a-time tree walk (the classic fast-path
    of every production JPEG decoder; still stdlib+numpy)."""

    def __init__(self, bits: list[int], values: bytes):
        self.lut = np.full(1 << 16, -1, np.int32)
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                base = code << (16 - ln)
                self.lut[base : base + (1 << (16 - ln))] = (
                    values[k] << 5
                ) | ln
                code += 1
                k += 1
            code <<= 1


@_functools.lru_cache(maxsize=64)
def _huff_cached(bits: tuple, values: bytes) -> _Huff:
    """LUT construction is ~100us; images in a corpus overwhelmingly
    share the same (often Annex K) tables, so cache by content."""
    return _Huff(list(bits), values)


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes (stuffing already
    removed): byte-fed accumulator, 1-padded past the end (T.81
    F.1.2.3)."""

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0  # next byte
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < self.n:
                b = self.data[self.pos]
            else:
                # T.81 pads the final byte with 1-bits; a decoder that
                # still wants data several bytes past the end is reading
                # a TRUNCATED stream — fail instead of spinning the MCU
                # loop on synthetic 1s (the image_stats degrade contract)
                if self.pos > self.n + 4:
                    raise ValueError("truncated JPEG entropy stream")
                b = 0xFF
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode(self, table: _Huff) -> int:
        self._fill(16)
        v = int(table.lut[(self.acc >> (self.nbits - 16)) & 0xFFFF])
        if v < 0:
            raise ValueError("invalid JPEG Huffman code")
        self.nbits -= v & 0x1F
        return v >> 5


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map the n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(blob: bytes):
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array (grayscale
    replicates to 3 channels — the ``decode_png`` contract)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    dac = {"dc": {}, "ac": {}}  # arithmetic conditioning (DAC marker)
    frame = None
    restart_interval = 0
    i = 2
    while i + 2 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i + 1 < len(blob) and blob[i + 1] == 0xFF:
            i += 1
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn:
            i += 2  # standalone markers carry no length field
            continue
        if i + 4 > len(blob):
            break
        (seglen,) = struct.unpack_from(">H", blob, i + 2)
        seg = blob[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(
                        np.int32
                    )
                    p += 64
                else:  # 16-bit precision
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                z = np.zeros(64, np.int32)
                z[_ZZ] = tbl
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = tuple(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated JPEG DHT segment")
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_cached(
                    bits, bytes(vals)
                )
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0/1 Huffman sequential, SOF2 progressive, SOF9
            # arithmetic-coded extended sequential (T.81 Annex D)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            # T.81 Table B.2: baseline (SOF0) is 8-bit only; extended
            # sequential (SOF1) and progressive (SOF2) add 12-bit —
            # the coefficient accumulators and the shared
            # reconstruction are precision-aware, so both Huffman
            # modes decode 12-bit.  12-bit arithmetic stays gated.
            if not (prec == 8
                    or (prec == 12 and marker in (0xC1, 0xC2))):
                raise NotImplementedError(
                    f"{prec}-bit JPEG not supported (marker 0xFF{marker:02X})"
                )
            if w == 0 or h == 0 or w * h > (1 << 26):
                # corrupt/crafted headers must degrade, not drive an
                # O(n_mcu) decode loop into OOM (the image_stats
                # contract); 64M pixels is far beyond this pipeline's
                # thumbnail shapes
                raise ValueError(
                    f"implausible JPEG dimensions {w}x{h}"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    # h/v = 0 is corrupt (would divide by zero in the MCU
                    # grid); 3-4 are legal JPEG but outside this decoder's
                    # documented 4:4:4/4:2:2/4:2:0 scope and would silently
                    # misdecode via integer repeat factors — both must take
                    # image_stats' degrade path, not abort the batch
                    raise ValueError(
                        f"unsupported JPEG sampling factors {ch}x{cv} "
                        "(supported: 1-2)"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "prog": marker == 0xC2, "prec": prec,
                     "arith": marker == 0xC9}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/SOF1/SOF9) and progressive "
                "(SOF2) Huffman/arithmetic JPEG are supported "
                f"library-free (marker 0xFF{marker:02X})"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                if tc == 0:
                    dac["dc"][tb] = (seg[p + 1] & 0xF, seg[p + 1] >> 4)
                else:
                    kx = seg[p + 1]
                    if not 1 <= kx <= 63:
                        raise ValueError(f"bad DAC Kx {kx}")
                    dac["ac"][tb] = kx
                p += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            data_start = i + 2 + seglen
            if frame.get("arith"):
                return _decode_arith_scan(
                    blob, data_start, frame, scan, qt, dac,
                    restart_interval,
                )
            if frame.get("prog"):
                # T.81 Annex G: accumulate coefficients across scans,
                # reconstruct at EOI
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                _prog_init(frame)
                i = _decode_prog_scan(
                    blob, data_start, frame, scan,
                    (ss, se, ahal >> 4, ahal & 0xF),
                    huff_dc, huff_ac, restart_interval,
                )
                continue
            return _decode_scan(
                blob, data_start, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        i += 2 + seglen
    if frame is not None and frame.get("prog") and frame.get("inited"):
        return _planes_to_rgb(frame, qt)
    raise ValueError("no SOS marker found")


def _split_entropy(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded segments from ``start``: byte-stuffing (FF 00)
    removed, split at RSTn markers, stopping at any other marker.
    Returns ``(segments, end_index)`` — end_index points at the 0xFF of
    the terminating marker (or len(blob)), so a multi-scan decoder can
    resume the marker walk there."""
    segs, cur = [], bytearray()
    i, n = start, len(blob)
    while i < n:
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = blob[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed literal FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, min(i, n)


def _decode_scan(blob, start, frame, scan, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(scan) != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG not supported "
            f"(frame has {len(comps)} components, scan covers {len(scan)})"
        )
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan has MCU = one data unit and
        # ignores the declared sampling factors (some encoders write 2x2
        # on grayscale SOFs)
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        c["td"], c["ta"] = td, ta
        order.append(c)
    # zigzag coefficient rows per component, scattered to block slots
    # after the scan (vectorized dezigzag + dequant, one pass per comp)
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["zzs"] = []
        c["slots"] = []

    segs, _ = _split_entropy(blob, start)
    seg_i = 0
    rd = _BitReader(segs[0])
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:  # restart: next segment, reset DC
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing JPEG restart segment")
            rd = _BitReader(segs[seg_i])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in order:
            dc_t, ac_t = huff_dc[c["td"]], huff_ac[c["ta"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = [0] * 64
                    s = rd.decode(dc_t)
                    if s > 15:
                        # T.81 F.1.2.1.2: DC SSSS beyond 15 has no
                        # meaning in any precision — a corrupt stream
                        # would otherwise drive a giant magnitude read
                        raise ValueError(f"invalid DC size category {s}")
                    diff = _extend(rd.read(s), s)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = rd.decode(ac_t)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index out of range")
                        zz[k] = _extend(rd.read(s), s)
                        k += 1
                    c["zzs"].append(zz)
                    c["slots"].append(
                        (my * c["v"] + v) * c["bx"] + mx * c["h"] + hh
                    )

    for c in comps:
        # dense zigzag coefficient grid: the shared reconstruction input
        # int64: a corrupt stream's DC predictor can accumulate past
        # int32 across blocks (size categories are capped at 15, but
        # the running sum is not) — int64 makes the grid assignment
        # total instead of raising OverflowError mid-batch
        coef = np.zeros((c["by"] * c["bx"], 64), np.int64)
        if c["zzs"]:
            coef[np.array(c["slots"])] = np.array(c["zzs"], np.int64)
        c["coef"] = coef
    return _planes_to_rgb(frame, qt)


def _planes_to_rgb(frame, qt):
    """Shared reconstruction: per component, dequantize the dense
    zigzag coefficient grid (``c["coef"]``, shape (by*bx, 64)), batch
    the IDCT (f = C.T @ F @ C + 128), upsample by pixel replication,
    crop, and color-convert — used by both the baseline single-scan
    path and the progressive multi-scan accumulator."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # 12-bit (SOF1 extended sequential): level shift is 2^(P-1)=2048,
    # samples clip to 0..4095, then scale to the 8-bit output contract
    # by dropping the low 4 bits (the 16-bit-PNG high-byte precedent)
    prec = frame.get("prec", 8)
    mid, top = float(1 << (prec - 1)), (1 << prec) - 1
    planes = []
    for c in comps:
        D = np.zeros((c["coef"].shape[0], 64))
        D[:, _ZZ] = c["coef"].astype(np.float64)
        D *= qt[c["tq"]].reshape(-1).astype(np.float64)[None, :]
        F = D.reshape(-1, 8, 8)
        f = np.einsum("ux,nuv,vy->nxy", _C, F, _C) + mid
        f = np.clip(np.round(f), 0, top)
        if prec > 8:
            f = np.floor(f / float(1 << (prec - 8)))
        f = f.astype(np.uint8)
        plane = (
            f.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
        # upsample to full resolution by pixel replication, then crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1
        )
        planes.append(plane[:h, :w])

    if len(planes) == 1:  # grayscale -> replicate
        g = planes[0]
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(
            f"{len(planes)}-component JPEG not supported (expect Y/YCbCr)"
        )
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- progressive decode (T.81 Annex G) -------------------------------------


def _prog_init(frame) -> None:
    """One-time per-frame setup for progressive decoding: MCU grid,
    per-component dense zigzag coefficient accumulators (zeros), and the
    per-component non-interleaved block dimensions (T.81 A.1.1: the
    actual ceil(comp_size/8) grid, NOT the MCU-padded one)."""
    if frame.get("inited"):
        return
    comps = frame["comps"]
    if len(comps) == 1:
        # single-component frame: MCU = one data unit, declared sampling
        # factors ignored (the baseline A.2.2 hack, applied frame-wide)
        comps[0]["h"] = comps[0]["v"] = 1
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        # non-interleaved scan coverage: the component's real block grid
        c["nbx"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["nby"] = -(-(-(-h * c["v"] // vmax)) // 8)
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), np.int64)
        c["pred"] = 0
        c["eobrun"] = 0
    frame["inited"] = True


def _decode_prog_scan(
    blob, start, frame, scan, band, huff_dc, huff_ac, dri
) -> int:
    """Decode one progressive scan into the frame's coefficient
    accumulators; returns the blob index of the next marker.

    ``band`` = (Ss, Se, Ah, Al).  DC scans (Ss=0) may be interleaved;
    AC scans cover exactly one component (T.81 G.1.1).  First scans
    (Ah=0) establish coefficient values at ``<< Al``; refinement scans
    (Ah=Al+1) add one magnitude bit per coefficient.  Restart markers
    reset the DC predictors and the EOB run."""
    ss, se, ah, al = band
    by_id = {c["id"]: c for c in frame["comps"]}
    segs, end = _split_entropy(blob, start)
    seg_i = 0
    rd = _BitReader(segs[0])

    def next_segment():
        nonlocal seg_i, rd
        seg_i += 1
        if seg_i >= len(segs):
            raise ValueError("missing JPEG restart segment")
        rd = _BitReader(segs[seg_i])
        for cc in frame["comps"]:
            cc["pred"] = 0
            cc["eobrun"] = 0

    if ss == 0:  # DC scan (interleaved or single-component)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        scomps = []
        for cs, td, ta in scan:
            c = by_id[cs]
            c["td"] = td
            scomps.append(c)
        if len(scomps) > 1:  # interleaved: MCU order
            mcux, mcuy = frame["mcux"], frame["mcuy"]
            n_mcu = mcux * mcuy
            for m in range(n_mcu):
                if dri and m and m % dri == 0:
                    next_segment()
                my, mx = divmod(m, mcux)
                for c in scomps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            slot = (
                                (my * c["v"] + v) * c["bx"]
                                + mx * c["h"] + hh
                            )
                            _dc_unit(rd, c, slot, ah, al, huff_dc)
        else:  # single component: its real block grid, row-major
            c = scomps[0]
            nb = c["nby"] * c["nbx"]
            for b in range(nb):
                if dri and b and b % dri == 0:
                    next_segment()
                row, col = divmod(b, c["nbx"])
                _dc_unit(rd, c, row * c["bx"] + col, ah, al, huff_dc)
        return end

    # AC scan: exactly one component, non-interleaved (T.81 G.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must cover one component")
    cs, td, ta = scan[0]
    c = by_id[cs]
    c["eobrun"] = 0  # EOB runs never span scans (libjpeg zeroes per
    # scan); a stale run from a corrupt prior scan must not silently
    # skip this scan's leading blocks
    ac_t = huff_ac[ta]
    nb = c["nby"] * c["nbx"]
    for b in range(nb):
        if dri and b and b % dri == 0:
            next_segment()
        row, col = divmod(b, c["nbx"])
        zz = c["coef"][row * c["bx"] + col]
        if ah == 0:
            _ac_first_unit(rd, c, zz, ss, se, al, ac_t)
        else:
            _ac_refine_unit(rd, c, zz, ss, se, al, ac_t)
    return end


def _dc_unit(rd, c, slot, ah, al, huff_dc):
    """One block's DC contribution (G.1.2.1): first scan decodes the
    Huffman-coded diff and stores ``pred << Al``; refinement reads one
    raw bit into bit position Al."""
    if ah == 0:
        s = rd.decode(huff_dc[c["td"]])
        if s > 15:
            raise ValueError(f"invalid DC size category {s}")
        c["pred"] += _extend(rd.read(s), s)
        c["coef"][slot, 0] = c["pred"] << al
    else:
        if rd.read(1):
            c["coef"][slot, 0] |= 1 << al


def _ac_first_unit(rd, c, zz, ss, se, al, ac_t):
    """AC first-scan band decode with EOB runs (G.1.2.2)."""
    if c["eobrun"] > 0:
        c["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rd.decode(ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            # EOBn: run length 2^r - 1 + appended bits, covers this block
            c["eobrun"] = (1 << r) - 1 + (rd.read(r) if r else 0)
            return
        k += r
        if k > se:
            raise ValueError("progressive AC index out of band")
        zz[k] = _extend(rd.read(s), s) << al
        k += 1


def _ac_refine_unit(rd, c, zz, ss, se, al, ac_t):
    """AC refinement band decode (G.1.2.3): correction bits for
    already-nonzero coefficients, plus newly-significant ±1<<Al
    insertions positioned by zero-history run lengths."""
    bit = 1 << al

    def refine_nonzero(k):
        """One correction bit for a history-nonzero coefficient; the
        guard tests the coefficient's bit (two's complement, int32 —
        the libjpeg check) so a corrupt double-correction can't drift."""
        if rd.read(1) and not (int(zz[k]) & bit):
            zz[k] += bit if zz[k] > 0 else -bit

    if c["eobrun"] > 0:
        # EOB-run block: only correction bits for existing nonzeros
        for k in range(ss, se + 1):
            if zz[k] != 0:
                refine_nonzero(k)
        c["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rd.decode(ac_t)
        r, s = rs >> 4, rs & 0xF
        newval = 0
        if s == 0:
            if r != 15:
                # EOBn: refine the rest of the band, start the run
                c["eobrun"] = (1 << r) - 1 + (rd.read(r) if r else 0)
                for kk in range(k, se + 1):
                    if zz[kk] != 0:
                        refine_nonzero(kk)
                return
            # ZRL: skip 16 zero-history positions (refining en route)
        elif s == 1:
            newval = bit if rd.read(1) else -bit
        else:
            raise ValueError("invalid refinement magnitude")
        while k <= se:
            if zz[k] != 0:
                refine_nonzero(k)
            else:
                if r == 0:
                    if newval:
                        zz[k] = newval
                    k += 1
                    break
                r -= 1
            k += 1


# --- encoder (fixture/test helper) ----------------------------------------

# Annex K.1 example quantization tables (in natural row order)
_QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.int32)
_QT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.int32)

# Annex K.3 example Huffman specs: (bits[16], values)
_HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              bytes(range(12)))
_HT_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                bytes(range(12)))
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)
_HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-entry scaled table in 1..255."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:  # pad with 1-bits (T.81 F.1.2.3)
            self.write(1, 1)


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for an Annex K (bits, values) spec."""
    bits, values = spec
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    n = abs(v).bit_length()
    return n, (v if v >= 0 else v + (1 << n) - 1)


def _encode_blocks(plane: np.ndarray, q: np.ndarray, dc_c, ac_c, wr,
                   pred: int, shift: float = 128.0) -> int:
    """FDCT + quantize + entropy-code every 8x8 block of a (H, W) plane
    (H, W multiples of 8), row-major; returns the updated DC predictor.
    ``shift`` is the level shift — 128 for 8-bit, 2048 for 12-bit."""
    H, W = plane.shape
    for by in range(H // 8):
        for bx in range(W // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            Fq = _C @ (blk.astype(np.float64) - shift) @ _C.T
            coef = np.round(Fq / q).astype(np.int32).reshape(-1)[_ZZ]
            diff = int(coef[0]) - pred
            pred = int(coef[0])
            s, mag = _magnitude(diff)
            code, ln = dc_c[s]
            wr.write(code, ln)
            if s:
                wr.write(mag, s)
            run = 0
            last_nz = max(np.nonzero(coef)[0]) if coef.any() else 0
            for k in range(1, 64):
                v = int(coef[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_c[0xF0]  # ZRL
                    wr.write(code, ln)
                    run -= 16
                s, mag = _magnitude(v)
                code, ln = ac_c[(run << 4) | s]
                wr.write(code, ln)
                wr.write(mag, s)
                run = 0
            if last_nz < 63:
                code, ln = ac_c[0x00]  # EOB
                wr.write(code, ln)
    return pred


# progressive AC scans need EOBn symbols (n<<4 for n>=1) that the
# sequential Annex K AC tables do not define; one flat custom table
# (every (run, size) symbol for size 0..10 at 8 bits, 176 codes) covers
# first and refinement scans for all components
_HT_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    bytes((a << 4) | b for a in range(16) for b in range(11)),
)


def _plane_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block of a padded plane into a
    (bh, bw, 64) zigzag-order int32 grid — the same per-block float64
    expression as the sequential ``_encode_blocks`` path, so progressive
    and baseline encodes of one image carry IDENTICAL coefficients."""
    H, W = plane.shape
    bh, bw = H // 8, W // 8
    out = np.zeros((bh, bw, 64), np.int32)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            Fq = _C @ (blk.astype(np.float64) - 128.0) @ _C.T
            out[by, bx] = np.round(Fq / q).astype(np.int32).reshape(-1)[_ZZ]
    return out


class _ProgScanWriter:
    """Per-scan entropy writer with restart support: every ``restart``
    units the EOB run and buffered correction bits flush, the bit
    stream pads, and an RSTn marker lands (predictors reset by the
    caller via ``on_restart``)."""

    def __init__(self, ac_c, restart: int):
        self.ac_c = ac_c
        self.restart = restart
        self.wr = _BitWriter()
        self.parts: list[bytes] = []
        self.rst = 0
        self.eobrun = 0
        self.bits: list[int] = []

    def unit_boundary(self, m: int, on_restart) -> None:
        if self.restart and m and m % self.restart == 0:
            self.flush_eobrun()
            self.wr.flush()
            self.parts.append(bytes(self.wr.out))
            self.parts.append(bytes([0xFF, 0xD0 + (self.rst % 8)]))
            self.rst += 1
            self.wr = _BitWriter()
            on_restart()

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, ln = self.ac_c[n << 4]
            self.wr.write(code, ln)
            if n:
                self.wr.write(self.eobrun - (1 << n), n)
            for b in self.bits:
                self.wr.write(b, 1)
            self.bits = []
            self.eobrun = 0

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.wr.flush()
        self.parts.append(bytes(self.wr.out))
        return b"".join(self.parts)


def _enc_ac_first_block(sw: _ProgScanWriter, zz, ss, se, al) -> None:
    """G.1.2.2: one block's AC first-scan band (point-transformed
    coefficients, run/size symbols, EOB runs)."""
    t = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t.append(v >> al if v >= 0 else -((-v) >> al))
    if not any(t):
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    last = max(i for i, v in enumerate(t) if v)
    r = 0
    for i in range(last + 1):
        v = t[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = sw.ac_c[0xF0]
            sw.wr.write(code, ln)
            r -= 16
        s, mag = _magnitude(v)
        code, ln = sw.ac_c[(r << 4) | s]
        sw.wr.write(code, ln)
        sw.wr.write(mag, s)
        r = 0
    if last < se - ss:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _enc_ac_refine_block(sw: _ProgScanWriter, zz, ss, se, al) -> None:
    """G.1.2.3 (the libjpeg encode_mcu_AC_refine structure): correction
    bits for history-nonzero coefficients buffer until the next emitted
    symbol; newly-significant coefficients code as (run, 1) + sign."""
    t = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, a in enumerate(t):
        if a == 1:
            eob = i
    r = 0
    br: list[int] = []
    for i, a in enumerate(t):
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            sw.flush_eobrun()
            code, ln = sw.ac_c[0xF0]
            sw.wr.write(code, ln)
            r -= 16
            for b in br:
                sw.wr.write(b, 1)
            br = []
        if a > 1:
            br.append(a & 1)
            continue
        sw.flush_eobrun()
        code, ln = sw.ac_c[(r << 4) | 1]
        sw.wr.write(code, ln)
        sw.wr.write(1 if int(zz[ss + i]) > 0 else 0, 1)
        for b in br:
            sw.wr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        sw.eobrun += 1
        sw.bits.extend(br)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _emit_progressive(out, comps, restart: int) -> None:
    """Emit the progressive scan script: interleaved DC first (Al=1),
    DC refinement, then per component AC first scans over two spectral
    bands (Al=1) and an AC refinement scan (Al=0) — exercising spectral
    selection, DC and AC successive approximation, EOB runs, and
    (when ``restart`` is set) per-scan restart resync.

    ``comps`` entries: (id, coef (bh, bw, 64), nbx, nby, h, v, dc_codes,
    td, ta)."""
    import struct as _struct

    ac_c = _huff_codes(_HT_AC_PROG)
    mcuy = comps[0][1].shape[0] // comps[0][5]
    mcux = comps[0][1].shape[1] // comps[0][4]

    def sos(scan_comps, ss, se, ah, al, body: bytes):
        payload = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            payload += bytes([cid, (td << 4) | ta])
        payload += bytes([ss, se, (ah << 4) | al])
        out.extend(_struct.pack(">BBH", 0xFF, 0xDA, len(payload) + 2))
        out.extend(payload)
        out.extend(body)

    # 1) DC first, interleaved, Al=1
    sw = _ProgScanWriter(ac_c, restart)
    preds = {c[0]: 0 for c in comps}

    def reset_preds():
        for k in preds:
            preds[k] = 0

    for m in range(mcux * mcuy):
        sw.unit_boundary(m, reset_preds)
        my, mx = divmod(m, mcux)
        for cid, coef, nbx, nby, ch, cv, dc_c, td, ta in comps:
            for v in range(cv):
                for hh in range(ch):
                    dc = int(coef[my * cv + v, mx * ch + hh, 0]) >> 1
                    diff = dc - preds[cid]
                    preds[cid] = dc
                    s, mag = _magnitude(diff)
                    code, ln = dc_c[s]
                    sw.wr.write(code, ln)
                    if s:
                        sw.wr.write(mag, s)
    sos([(c[0], c[7], 0) for c in comps], 0, 0, 0, 1, sw.finish())

    # 2) DC refinement, interleaved, Ah=1 Al=0 (raw bits, no table)
    sw = _ProgScanWriter(ac_c, restart)
    for m in range(mcux * mcuy):
        sw.unit_boundary(m, lambda: None)
        my, mx = divmod(m, mcux)
        for cid, coef, nbx, nby, ch, cv, dc_c, td, ta in comps:
            for v in range(cv):
                for hh in range(ch):
                    sw.wr.write(int(coef[my * cv + v, mx * ch + hh, 0]) & 1, 1)
    sos([(c[0], c[7], 0) for c in comps], 0, 0, 1, 0, sw.finish())

    # 3) AC first scans per component, two spectral bands, Al=1
    for ss, se in ((1, 5), (6, 63)):
        for cid, coef, nbx, nby, ch, cv, dc_c, td, ta in comps:
            sw = _ProgScanWriter(ac_c, restart)
            for b in range(nby * nbx):
                sw.unit_boundary(b, lambda: None)
                row, col = divmod(b, nbx)
                _enc_ac_first_block(sw, coef[row, col], ss, se, 1)
            sos([(cid, 0, ta)], ss, se, 0, 1, sw.finish())

    # 4) AC refinement per component, Ah=1 Al=0
    for cid, coef, nbx, nby, ch, cv, dc_c, td, ta in comps:
        sw = _ProgScanWriter(ac_c, restart)
        for b in range(nby * nbx):
            sw.unit_boundary(b, lambda: None)
            row, col = divmod(b, nbx)
            _enc_ac_refine_block(sw, coef[row, col], 1, 63, 0)
        sos([(cid, 0, ta)], 1, 63, 1, 0, sw.finish())


def encode_jpeg(
    img, quality: int = 90, subsample: bool = False, restart: int = 0,
    progressive: bool = False,
) -> bytes:
    """Minimal baseline JPEG writer: grayscale ((h, w) or (h, w, 1)) or
    RGB (h, w, 3); ``subsample`` picks the chroma mode — ``"444"``
    (default, also ``False``), ``"420"`` (also ``True``), or ``"422"``
    (horizontal-only, the anisotropic-upsampling decoder path).
    Annex K tables, single interleaved scan; ``restart`` > 0 writes a
    DRI segment and RSTn markers every ``restart`` MCUs (exercises the
    decoder's restart path)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]

    def pad8(p: np.ndarray, mult=8) -> np.ndarray:
        mv, mh = mult if isinstance(mult, tuple) else (mult, mult)
        H = -(-p.shape[0] // mv) * mv
        W = -(-p.shape[1] // mh) * mh
        return np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])),
                      mode="edge")

    qlum = _scaled_qt(_QT_LUM, quality)
    qchrom = _scaled_qt(_QT_CHROM, quality)

    def chunk(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    zz_q = qlum.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
    out += chunk(0xDB, b"\x00" + zz_q)
    if not gray:
        out += chunk(
            0xDB, b"\x01" + qchrom.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
        )

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return chunk(0xC4, bytes([tc << 4 | th]) + bytes(bits) + values)

    out += dht(0, 0, _HT_DC_LUM) + dht(1, 0, _HT_AC_LUM)
    if not gray:
        out += dht(0, 1, _HT_DC_CHROM) + dht(1, 1, _HT_AC_CHROM)
    if progressive:
        # progressive AC scans need EOBn symbols the K tables lack:
        # redefine both AC table slots with the flat custom table
        out += dht(1, 0, _HT_AC_PROG) + dht(1, 1, _HT_AC_PROG)

    def emit_scan(mcus) -> bytes:
        """Entropy-code the MCU list, inserting RSTn markers / resetting
        DC predictors every ``restart`` MCUs when enabled."""
        parts, preds, rst = [], [0, 0, 0], 0
        wr = _BitWriter()
        for m, blocks in enumerate(mcus):
            if restart and m and m % restart == 0:
                wr.flush()
                parts.append(bytes(wr.out))
                parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                wr = _BitWriter()
                preds = [0, 0, 0]
            for blk, q, dc_c, ac_c, ci in blocks:
                preds[ci] = _encode_blocks(blk, q, dc_c, ac_c, wr, preds[ci])
        wr.flush()
        parts.append(bytes(wr.out))
        return b"".join(parts)

    if restart:
        out += chunk(0xDD, struct.pack(">H", restart))
    if gray:
        plane = pad8(img if img.ndim == 2 else img[:, :, 0])
        sof = 0xC2 if progressive else 0xC0
        out += chunk(sof, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        if progressive:
            coef = _plane_coefs(plane, qlum)
            bh, bw = coef.shape[:2]
            _emit_progressive(
                out,
                [(1, coef, bw, bh, 1, 1, _huff_codes(_HT_DC_LUM), 0, 0)],
                restart,
            )
            out += b"\xff\xd9"
            return bytes(out)
        out += chunk(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        dcl, acl = _huff_codes(_HT_DC_LUM), _huff_codes(_HT_AC_LUM)
        mcus = [
            [(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
              qlum, dcl, acl, 0)]
            for by in range(plane.shape[0] // 8)
            for bx in range(plane.shape[1] // 8)
        ]
        out += emit_scan(mcus)
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        mode = {True: "420", False: "444"}.get(subsample, subsample)
        if mode == "420":  # 2x2 box mean on chroma
            def down(p):
                p = pad8(p, 2)
                return np.round(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                     + p[1::2, 1::2]) / 4.0
                )

            cb, cr = down(cb), down(cr)
            sampling = b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
            yh = yv = 16
        elif mode == "422":  # horizontal-only 1x2 box mean on chroma
            def down(p):
                p = pad8(p, (1, 2))
                return np.round((p[:, 0::2] + p[:, 1::2]) / 2.0)

            cb, cr = down(cb), down(cr)
            sampling = b"\x01\x21\x00\x02\x11\x01\x03\x11\x01"
            yh, yv = 16, 8
        elif mode == "444":
            sampling = b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
            yh = yv = 8
        else:
            raise ValueError(f"unknown subsample mode {subsample!r}")
        sof = 0xC2 if progressive else 0xC0
        out += chunk(sof, struct.pack(">BHHB", 8, h, w, 3) + sampling)
        if progressive:
            yp = pad8(y, (yv, yh))
            cbp, crp = pad8(cb, 8), pad8(cr, 8)
            hmax, vmax = yh // 8, yv // 8
            dcl, dcc = _huff_codes(_HT_DC_LUM), _huff_codes(_HT_DC_CHROM)
            comps = []
            for cid, plane, q, ch, cv, dc_c, td in (
                (1, yp, qlum, hmax, vmax, dcl, 0),
                (2, cbp, qchrom, 1, 1, dcc, 1),
                (3, crp, qchrom, 1, 1, dcc, 1),
            ):
                coef = _plane_coefs(plane, q)
                nbx = -(-(-(-w * ch // hmax)) // 8)
                nby = -(-(-(-h * cv // vmax)) // 8)
                comps.append(
                    (cid, coef, nbx, nby, ch, cv, dc_c, td, td)
                )
            _emit_progressive(out, comps, restart)
            out += b"\xff\xd9"
            return bytes(out)
        out += chunk(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
        dcl, acl = _huff_codes(_HT_DC_LUM), _huff_codes(_HT_AC_LUM)
        dcc, acc = _huff_codes(_HT_DC_CHROM), _huff_codes(_HT_AC_CHROM)
        yp = pad8(y, (yv, yh))
        # chroma is one 8x8 block per MCU in every mode (full-res for
        # 4:4:4, half-width for 4:2:2, half-both for 4:2:0), so its
        # block index is always (my, mx)
        cbp, crp = pad8(cb, 8), pad8(cr, 8)
        mcus = []
        for my in range(yp.shape[0] // yv):
            for mx in range(yp.shape[1] // yh):
                blocks = []
                for v in range(yv // 8):
                    for hh in range(yh // 8):
                        blocks.append((
                            yp[
                                my * yv + v * 8 : my * yv + v * 8 + 8,
                                mx * yh + hh * 8 : mx * yh + hh * 8 + 8,
                            ],
                            qlum, dcl, acl, 0,
                        ))
                blocks.append((
                    cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                    qchrom, dcc, acc, 1,
                ))
                blocks.append((
                    crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                    qchrom, dcc, acc, 2,
                ))
                mcus.append(blocks)
        out += emit_scan(mcus)
    out += b"\xff\xd9"
    return bytes(out)


# --- 12-bit extended sequential (SOF1, T.81 Table B.2 P=12) ----------------

# The Annex K Huffman tables stop at the 8-bit categories (DC SSSS <= 11,
# AC size <= 10); 12-bit DC differences reach category 15 and AC
# magnitudes category 14, so the 12-bit writer uses flat custom tables:
# all 16 DC categories at 5 bits, and every legal AC symbol (EOB, ZRL,
# (run, size) for size 1..14) at 8 bits — 226 codes of 256, the all-ones
# codeword unused as T.81 C.2 requires.
_HT_DC_12 = (
    [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(16)),
)
_HT_AC_12 = (
    [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
    bytes([0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]),
)


def encode_jpeg12(img, quality: int = 100) -> bytes:
    """12-bit extended-sequential JPEG writer (SOF1, grayscale 4:4:4
    single scan): input is an (h, w) integer array with samples in
    0..4095.  The quantization table is written at 16-bit precision
    (DQT Pq=1) and the level shift is 2^11 = 2048 per T.81 A.3.1; at
    quality 100 the table is all ones, so 8x8-block-constant images
    decode bit-exactly (the DC-exact fixture contract).  12-bit JPEG
    is the scanned-document/medical-imagery profile; the decoder
    (:func:`decode_jpeg`) scales samples to the 8-bit output contract
    by dropping the low 4 bits."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_jpeg12 writes grayscale (h, w) only")
    if img.min() < 0 or img.max() > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    h, w = img.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(
        img.astype(np.float64), ((0, H - h), (0, W - w)), mode="edge"
    )
    q = _scaled_qt(_QT_LUM, quality).astype(np.int32)

    def chunk(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    zz_q = q.reshape(-1)[_ZZ].astype(">u2").tobytes()
    out += chunk(0xDB, b"\x10" + zz_q)  # Pq=1 (16-bit entries), Tq=0
    out += chunk(
        0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += chunk(
        0xC4, bytes([0x00]) + bytes(_HT_DC_12[0]) + _HT_DC_12[1]
    )
    out += chunk(
        0xC4, bytes([0x10]) + bytes(_HT_AC_12[0]) + _HT_AC_12[1]
    )
    out += chunk(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wr = _BitWriter()
    _encode_blocks(
        plane, q.astype(np.float64), _huff_codes(_HT_DC_12),
        _huff_codes(_HT_AC_12), wr, 0, shift=2048.0,
    )
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


# --- arithmetic coding (T.81 Annex D QM-coder + Annex F models) ------------

# T.81 Table D.3: the 113-state probability estimation table —
# (Qe, NMPS, NLPS, SWITCH) per index.  Entry 113 is the conventional
# non-adapting ~equiprobable state used for AC sign decisions (the
# libjpeg "fixed bin" convention; T.81 F.1.4.4.1.2 codes signs with a
# fixed estimate).
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5 state (never adapts)
]


class _Stats:
    """A bank of adaptive binary contexts: per bin, the estimation-table
    index and the current MPS sense (T.81 D.1.1).  One bank per
    DC/AC conditioning table; 64 DC bins / 256 AC bins, the Annex F
    statistical-model areas."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = bytearray(n)
        self.mps = bytearray(n)


class _QMDecoder:
    """T.81 Annex D arithmetic decoder (DECODE + MPS/LPS_EXCHANGE +
    RENORMD, Figures D.17-D.21 register discipline: 32-bit C, 16-bit A,
    renormalize while A < 0x8000).  Byte feed uses the 0xFF 0x00
    byte-stuffing realization (a stuffed zero byte after every 0xFF
    data byte; any other marker terminates the segment and zero bytes
    feed from then on) — the convention of the dominant public
    implementation lineage; the encoder twin below emits the same, and
    the coefficient-identity property test pins the pair."""

    __slots__ = ("data", "pos", "n", "c", "a", "ct", "_ended")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data)
        self._ended = False
        # INITDEC: the first two data bytes form the initial code value
        # in Chigh (bits 16..31); CT=0 so the first renormalization
        # iteration feeds byte 3 into bits 8..15 before shifting
        self.c = (self._byte() << 24) | (self._byte() << 16)
        self.ct = 0
        # INITENC's interval convention: the full 16-bit code space —
        # only the first subtraction ever sees A > 0xFFFF
        self.a = 0x10000

    def _byte(self) -> int:
        if self._ended or self.pos >= self.n:
            self._ended = True
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < self.n else 0xD9
            if nxt == 0x00:
                self.pos += 1  # stuffed zero byte: deliver the 0xFF
            else:  # marker: no more entropy data, feed zeros
                self._ended = True
                return 0
        return b

    def decode(self, st: _Stats, k: int) -> int:
        i = st.idx[k]
        qe, nmps, nlps, sw = _QE[i]
        mps = st.mps[k]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < self.a:
            if self.a & 0x8000:
                return mps
            # MPS_EXCHANGE
            if self.a < qe:
                d = 1 - mps
                if sw:
                    st.mps[k] = 1 - mps
                st.idx[k] = nlps
            else:
                d = mps
                st.idx[k] = nmps
        else:
            # LPS_EXCHANGE
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                st.idx[k] = nmps
            else:
                d = 1 - mps
                if sw:
                    st.mps[k] = 1 - mps
                st.idx[k] = nlps
            self.a = qe
        # RENORMD (Figure D.21): A and C shift together one bit at a
        # time; BYTEIN refills bits 8..15 whenever CT runs dry
        while True:
            if self.ct == 0:
                self.c += self._byte() << 8
                self.ct = 8
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class _QMEncoder:
    """T.81 Annex D arithmetic encoder (CODEMPS/CODELPS + RENORME +
    BYTEOUT/FLUSH): the exact interval twin of :class:`_QMDecoder` —
    MPS subinterval at the bottom, LPS (size Qe) on top, conditional
    exchange when the MPS subinterval shrinks below Qe.  Carry
    resolution uses the byte-stack realization (a pending buffer byte
    plus a run of provisional 0xFF bytes that a later carry flips to
    0x00), and every emitted 0xFF data byte is followed by a stuffed
    0x00 so no marker can appear inside the entropy segment."""

    __slots__ = ("c", "a", "ct", "buffer", "sc", "out")

    def __init__(self):
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = None  # pending byte: the carry target
        self.sc = 0  # provisional 0xFF bytes after the buffer
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # byte stuffing

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: cascades through every stacked 0xFF into the buffer
            if self.buffer is not None:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self._emit(0x00)  # 0xFF + carry wraps to 0x00
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # provisional: a later carry may flip it
        else:
            if self.buffer is not None:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def encode(self, st: _Stats, k: int, bit: int) -> None:
        i = st.idx[k]
        qe, nmps, nlps, sw = _QE[i]
        mps = st.mps[k]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                return  # no renormalization, no state change
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            st.idx[k] = nmps
        else:
            if self.a < qe:  # conditional exchange: LPS keeps the bottom
                pass
            else:
                self.c += self.a
                self.a = qe
            if sw:
                st.mps[k] = 1 - mps
            st.idx[k] = nlps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # CLEARBITS: the code point in [C, C+A) with most trailing zeros
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct  # FINALWRITES
        self._byteout()
        self.c <<= 8
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self.buffer is not None:
            self._emit(self.buffer)
        for _ in range(self.sc):
            self._emit(0xFF)
        return bytes(self.out)


def _decode_arith_scan(blob, start, frame, scan, qt, dac, dri):
    """Sequential arithmetic-coded scan (T.81 F.2.4 statistical models
    over the Annex D decoder): DC differences code through a 64-bin
    conditioning area (5 context bases from the previous diff's
    classification against the DAC L/U bounds, then sign, magnitude
    category chain, and magnitude bits), AC coefficients through 256
    bins (per-k EOB/significance pairs, a fixed ~0.5 sign state, and
    two shared high-magnitude chains split at the DAC Kx index).
    The bin layout follows the canonical software realization of
    Tables F.4/F.5 (context bases 0/4/8/12/16, X chain at 20,
    magnitude bits at +14; AC chains at 189 and 217)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if dri:
        raise NotImplementedError(
            "restart markers with arithmetic coding not supported"
        )
    arith_cap = _arith_pixel_cap()
    if w * h > arith_cap:
        # tighter work bound than the general 1<<26 pixel cap: the QM
        # coder never rejects garbage (every bit sequence decodes), so
        # a corrupt SOF near the cap buys certain Python work where a
        # corrupt Huffman stream fails fast on an invalid code.  Found
        # by the r9 mutation-fuzz soak at 1<<21; r10 measured garbage
        # decode at that cap at 7.4s — past the fuzz harness's 5s hang
        # bound — so the default cap is 1M pixels (~3.6s worst case,
        # boundary-pinned by test_codec_fuzz.py), still ~40x this
        # pipeline's thumbnail envelope.  Larger VALID images are not
        # wrong, just slow — callers whose envelope includes them can
        # raise SPARK_GRAFT_ARITH_JPEG_MAX_PIXELS rather than being
        # hard-failed by one host's fuzz timing budget (ADVICE r10).
        raise NotImplementedError(
            f"arithmetic JPEG beyond {arith_cap} pixels ({w}x{h}) is "
            "outside the pure-Python decoder's work budget (raise "
            "SPARK_GRAFT_ARITH_JPEG_MAX_PIXELS to opt in)"
        )
    if len(scan) != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan arithmetic JPEG not supported"
        )
    if len(comps) == 1:
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        c["td"], c["ta"] = td, ta
        order.append(c)
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["zzs"] = []
        c["slots"] = []

    dec = _QMDecoder(blob[start:])
    dc_stats: dict[int, _Stats] = {}
    ac_stats: dict[int, _Stats] = {}
    fixed = _Stats(1)
    fixed.idx[0] = 113  # non-adapting ~equiprobable sign state
    dc_ctx = {c["id"]: 0 for c in comps}
    pred = {c["id"]: 0 for c in comps}

    for c in order:
        # bind per-component stats/conditioning once — setdefault in
        # the MCU loop would evaluate _Stats() per MCU just to drop it
        if c["td"] not in dc_stats:
            dc_stats[c["td"]] = _Stats(64)
        if c["ta"] not in ac_stats:
            ac_stats[c["ta"]] = _Stats(256)
        c["_std"] = dc_stats[c["td"]]
        c["_sta"] = ac_stats[c["ta"]]
        c["_cond"] = dac["dc"].get(c["td"], (0, 1))
        c["_kx"] = dac["ac"].get(c["ta"], 5)
    for m_i in range(mcux * mcuy):
        my, mx = divmod(m_i, mcux)
        for c in order:
            std = c["_std"]
            sta = c["_sta"]
            cond_l, cond_u = c["_cond"]
            kx = c["_kx"]
            cid = c["id"]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = [0] * 64
                    # --- DC difference (Figure F.24 tree) ---
                    base = dc_ctx[cid]
                    if dec.decode(std, base):
                        sign = dec.decode(std, base + 1)
                        pos = base + 2 + sign
                        m = dec.decode(std, pos)
                        if m:
                            pos = 20  # X chain (Table F.4)
                            while dec.decode(std, pos):
                                m <<= 1
                                if m == 0x8000:
                                    raise ValueError(
                                        "DC magnitude overflow"
                                    )
                                pos += 1
                        if m < ((1 << cond_l) >> 1):
                            dc_ctx[cid] = 0
                        elif m > ((1 << cond_u) >> 1):
                            dc_ctx[cid] = 12 + 4 * sign
                        else:
                            dc_ctx[cid] = 4 + 4 * sign
                        val = m
                        pos += 14  # magnitude bits
                        mm = m >> 1
                        while mm:
                            if dec.decode(std, pos):
                                val |= mm
                            mm >>= 1
                        val += 1
                        pred[cid] += -val if sign else val
                    else:
                        dc_ctx[cid] = 0
                    zz[0] = pred[cid]
                    # --- AC coefficients (Figure F.20 tree) ---
                    k = 1
                    while k <= 63:
                        pos = 3 * (k - 1)
                        if dec.decode(sta, pos):
                            break  # EOB
                        while dec.decode(sta, pos + 1) == 0:
                            pos += 3
                            k += 1
                            if k > 63:
                                raise ValueError("AC run past k=63")
                        sign = dec.decode(fixed, 0)
                        pos += 2
                        m = dec.decode(sta, pos)
                        if m and dec.decode(sta, pos):
                            m <<= 1
                            pos = 189 if k <= kx else 217
                            while dec.decode(sta, pos):
                                m <<= 1
                                if m == 0x8000:
                                    raise ValueError(
                                        "AC magnitude overflow"
                                    )
                                pos += 1
                        val = m
                        pos += 14
                        mm = m >> 1
                        while mm:
                            if dec.decode(sta, pos):
                                val |= mm
                            mm >>= 1
                        val += 1
                        zz[k] = -val if sign else val
                        k += 1
                    c["zzs"].append(zz)
                    c["slots"].append(
                        (my * c["v"] + v) * c["bx"] + mx * c["h"] + hh
                    )
    for c in comps:
        coef = np.zeros((c["by"] * c["bx"], 64), np.int64)
        if c["zzs"]:
            coef[np.array(c["slots"])] = np.array(c["zzs"], np.int64)
        c["coef"] = coef
    return _planes_to_rgb(frame, qt)


def _arith_code_block(enc, zz, std, sta, fixed, pred, ctx, cond, kx):
    """Entropy-code one zigzag coefficient block through the F.2.4
    statistical model — the exact bin-walk mirror of the decode tree in
    :func:`_decode_arith_scan`.  ``pred``/``ctx`` are [value] cells
    (per-component DC predictor and conditioning context); returns
    nothing, mutates the coder and stats in place."""
    cond_l, cond_u = cond
    diff = zz[0] - pred[0]
    pred[0] = zz[0]
    base = ctx[0]
    if diff == 0:
        enc.encode(std, base, 0)
        ctx[0] = 0
    else:
        enc.encode(std, base, 1)
        sign = 1 if diff < 0 else 0
        enc.encode(std, base + 1, sign)
        sz = (-diff if sign else diff) - 1
        pos = base + 2 + sign
        if sz == 0:
            enc.encode(std, pos, 0)
            m = 0
        else:
            enc.encode(std, pos, 1)
            m = 1
            pos = 20
            while (m << 1) <= sz:
                enc.encode(std, pos, 1)
                m <<= 1
                pos += 1
            enc.encode(std, pos, 0)
        if m < ((1 << cond_l) >> 1):
            ctx[0] = 0
        elif m > ((1 << cond_u) >> 1):
            ctx[0] = 12 + 4 * sign
        else:
            ctx[0] = 4 + 4 * sign
        pos += 14
        mm = m >> 1
        while mm:
            enc.encode(std, pos, 1 if sz & mm else 0)
            mm >>= 1
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    k = 1
    while k <= 63:
        pos = 3 * (k - 1)
        if k > last_nz:
            enc.encode(sta, pos, 1)  # EOB
            break
        enc.encode(sta, pos, 0)
        while zz[k] == 0:
            enc.encode(sta, pos + 1, 0)
            pos += 3
            k += 1
        enc.encode(sta, pos + 1, 1)
        val = zz[k]
        sign = 1 if val < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = (-val if sign else val) - 1
        pos += 2
        if sz == 0:
            enc.encode(sta, pos, 0)
            m = 0
        elif sz == 1:
            enc.encode(sta, pos, 1)
            enc.encode(sta, pos, 0)
            m = 1
        else:
            enc.encode(sta, pos, 1)
            enc.encode(sta, pos, 1)
            m = 2
            pos = 189 if k <= kx else 217
            while (m << 1) <= sz:
                enc.encode(sta, pos, 1)
                m <<= 1
                pos += 1
            enc.encode(sta, pos, 0)
        pos += 14
        mm = m >> 1
        while mm:
            enc.encode(sta, pos, 1 if sz & mm else 0)
            mm >>= 1
        k += 1


def encode_jpeg_arith(img, quality: int = 90) -> bytes:
    """Sequential arithmetic-coded JPEG writer (SOF9, T.81 Annex D +
    F.2.4 models): grayscale ((h, w) / (h, w, 1)) or RGB (h, w, 3) at
    4:4:4 — one interleaved scan, default conditioning (DAC: L=0 U=1
    per DC table, Kx=5 per AC table, written explicitly), no restart
    markers.  Quantized coefficients come from the same
    ``_plane_coefs`` path as the Huffman writer, so an arithmetic and
    a Huffman encode of one image decode pixel-identically — the
    coefficient-identity property the tests pin."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]

    def pad8(p):
        H = -(-p.shape[0] // 8) * 8
        W = -(-p.shape[1] // 8) * 8
        return np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])),
                      mode="edge")

    qlum = _scaled_qt(_QT_LUM, quality)
    qchrom = _scaled_qt(_QT_CHROM, quality)

    def chunk(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += chunk(0xDB, b"\x00" + qlum.reshape(-1)[_ZZ].astype(
        np.uint8).tobytes())
    if gray:
        planes = [pad8(img.reshape(h, w, -1)[:, :, 0])]
        qts = [qlum]
        ids = [(1, 0x11, 0)]
        tsel = [(0, 0)]
    else:
        # the exact encode_jpeg conversion, so both writers quantize
        # identical coefficients (the pixel-identity test contract)
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            pad8(np.clip(np.round(p), 0, 255).astype(np.uint8))
            for p in (y, cb, cr)
        ]
        out += chunk(0xDB, b"\x01" + qchrom.reshape(-1)[_ZZ].astype(
            np.uint8).tobytes())
        qts = [qlum, qchrom, qchrom]
        ids = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
        tsel = [(0, 0), (1, 1), (1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid, hv, tq in ids:
        sof += bytes([cid, hv, tq])
    out += chunk(0xC9, sof)  # SOF9: extended sequential, arithmetic
    # DAC: default conditioning, written explicitly (Tc=0: (U<<4)|L,
    # Tc=1: Kx) for every table referenced by the scan
    dac = bytearray()
    for t in sorted({td for td, _ in tsel}):
        dac += bytes([t, (1 << 4) | 0])
    for t in sorted({ta for _, ta in tsel}):
        dac += bytes([0x10 | t, 5])
    out += chunk(0xCC, bytes(dac))
    sos = bytes([len(planes)])
    for (cid, _, _), (td, ta) in zip(ids, tsel):
        sos += bytes([cid, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    out += chunk(0xDA, sos)

    coefs = [_plane_coefs(p, q) for p, q in zip(planes, qts)]
    enc = _QMEncoder()
    dc_stats: dict[int, _Stats] = {}
    ac_stats: dict[int, _Stats] = {}
    fixed = _Stats(1)
    fixed.idx[0] = 113
    preds = [[0] for _ in planes]
    ctxs = [[0] for _ in planes]
    mcux = coefs[0].shape[1]
    mcuy = coefs[0].shape[0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, cf in enumerate(coefs):
                td, ta = tsel[ci]
                std = dc_stats.setdefault(td, _Stats(64))
                sta = ac_stats.setdefault(ta, _Stats(256))
                _arith_code_block(
                    enc, cf[my, mx].tolist(), std, sta, fixed,
                    preds[ci], ctxs[ci], (0, 1), 5,
                )
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
