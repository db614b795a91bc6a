"""JPEG codec with ONLY the stdlib + numpy (round 5 baseline,
round 6 progressive — VERDICT stretch items).

decode_jpeg: baseline sequential (SOF0/SOF1) AND progressive (SOF2)
Huffman DCT JPEGs — together the whole real-world Huffman family:
entropy decode (DHT tables from the file), dequantize (DQT),
dezigzag, 8x8 IDCT as two matrix products, per-component sampling
factors (4:4:4 / 4:2:2 / 4:2:0), restart markers, YCbCr->RGB.
Progressive adds multi-scan spectral selection + successive
approximation (T.81 Annex G): DC/AC first passes, refinement passes
with EOB runs and buffered correction bits; coefficients accumulate
across scans and the IDCT runs once, batched. Arithmetic coding and
12-bit precision raise ValueError naming the feature.

encode_jpeg / encode_jpeg_progressive: matching encoders (Annex K
quantization + Huffman tables; the progressive one emits DC Al=1 ->
refine, per-component AC Al=1 -> refine with EOB-run accumulation)
so tests can roundtrip known pixels without PIL in the container.

Reference parity: featuretools delegates image IO to PIL
(it has no codec of its own); this module exists so the multimodal
operators (ops/multimodal.py image_features) can witness real
decoded statistics for the two most common web formats (PNG r4,
JPEG r5) with no native dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block):
    # spatial = A^T . F . A
    return _A.T @ block @ _A


def _fdct2(block):
    return _A @ block @ _A.T


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte destuffing (FF 00 -> FF) and restart-marker detection."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffing marker is hit

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.d):
                # past the end: pad with zero bits (spec: decoder may
                # treat missing bits as 0 up to the final EOB)
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.bits >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def restart(self):
        """Consume a restart marker: drop partial (pad) bits, step
        past FFD0-FFD7. The marker may already have been detected by
        a _fill (self.marker set, pos still at the FF) or may be the
        next unread bytes (pos at the FF, no fill crossed it yet) —
        handle both."""
        self.bits = 0
        self.nbits = 0
        if self.marker is not None:
            if 0xD0 <= self.marker <= 0xD7:
                self.pos += 2
                self.marker = None
            return
        if (self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            self.pos += 2


class _Huff:
    """Canonical JPEG Huffman table: decode one symbol bit by bit
    using per-length min/max code windows (O(16) worst case)."""

    def __init__(self, counts, symbols):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code, k = 0, 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            if code <= self.maxcode[ln]:
                return self.symbols[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("corrupt JPEG: Huffman code longer than 16 bits")


def _extend(v: int, t: int) -> int:
    # JPEG 'receive and extend': t-bit magnitude to signed value
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG; returns the same statistics contract
    as decode_png: {width, height, channels, bit_depth, mean_px,
    std_px} with mean/std over ALL RGB (or gray) samples."""
    d = payload
    if d is None or len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt = {}           # id -> np 64 int
    huff_dc, huff_ac = {}, {}
    frame = None      # (precision, h, w, comps)
    restart_interval = 0
    scan = None
    try:
        frame, scan, restart_interval, progressive = _parse_headers(
            d, pos, qt, huff_dc, huff_ac)
    except (IndexError, struct.error) as e:
        # a lying segment length can under-fill a parsed structure;
        # the documented contract is ValueError naming the problem
        raise ValueError(f"corrupt JPEG: truncated marker segment ({e})")
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    if progressive:
        return _decode_progressive(d, frame, scan, qt, huff_dc,
                                   huff_ac, restart_interval)
    h, w, comps = frame
    scomps, data_pos = scan[:2]
    by_id = {c["id"]: c for c in comps}
    # validate table ids BEFORE entropy decode: a scan referencing an
    # undefined Huffman/quantization table must raise the documented
    # ValueError, not KeyError mid-decode
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(
                f"corrupt JPEG: missing DQT table {c['tq']}")
    for sc in scomps:
        if sc["id"] not in by_id:
            raise ValueError(
                f"corrupt JPEG: scan references undefined component "
                f"{sc['id']}")
        if sc["dc"] not in huff_dc:
            raise ValueError(
                f"corrupt JPEG: missing DC DHT table {sc['dc']}")
        if sc["ac"] not in huff_ac:
            raise ValueError(
                f"corrupt JPEG: missing AC DHT table {sc['ac']}")
    return _decode_scan(d, frame, scomps, data_pos, qt, huff_dc,
                        huff_ac, restart_interval)


def _parse_headers(d, pos, qt, huff_dc, huff_ac):
    """Walk marker segments up to the next SOS (or EOI); fills the
    table dicts in place, returns (frame, scan, restart_interval,
    progressive). scan = (scomps, data_pos, ss, se, ah, al) — the
    spectral-selection / successive-approximation fields are 0/63/0/0
    for baseline. Re-enterable: _decode_progressive calls it again
    after each scan's entropy data to pick up inter-scan DHT/DRI
    segments and the next SOS."""
    frame = None
    scan = None
    restart_interval = 0
    progressive = False
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        m = d[pos + 1]
        if m == 0xD9:          # EOI
            break
        seglen = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        seg = d[pos + 4:pos + 2 + seglen]
        if len(seg) < seglen - 2:
            raise ValueError(
                f"corrupt JPEG: truncated marker segment 0x{m:02X} "
                f"(declared {seglen - 2} bytes, {len(seg)} present)")
        if m == 0xDB:          # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization not supported")
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=i + 1
                ).astype(np.int32)
                i += 65
        elif m == 0xC4:        # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1:i + 17])
                nsym = sum(counts)
                syms = list(seg[i + 17:i + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, syms)
                i += 17 + nsym
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progr.
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
            progressive = m == 0xC2
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                f"Huffman JPEG are supported, got SOF marker 0x{m:02X} "
                "(arithmetic/lossless/hierarchical)")
        elif m == 0xDD:        # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:        # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scan = (scomps, pos + 2 + seglen, ss, se,
                    ahal >> 4, ahal & 0xF)
            break
        pos += 2 + seglen
    return frame, scan, restart_interval, progressive


def _decode_scan(d, frame, scomps, data_pos, qt, huff_dc, huff_ac,
                 restart_interval):
    """Entropy-decode the (validated) scan and compute pixel stats."""
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                          dtype=np.float64)
        for c in comps
    }
    br = _BitReader(d, data_pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                br.restart()
                pred = {c["id"]: 0 for c in comps}
            for sc in scomps:
                c = by_id[sc["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = huff_dc[sc["dc"]].decode(br)
                        diff = _extend(br.read(t), t)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = huff_ac[sc["ac"]].decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:     # ZRL
                                    k += 16
                                    continue
                                break           # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC "
                                                 "index past 63")
                            coef[k] = _extend(br.read(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef * q[np.arange(64)]
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px
            n_mcu += 1
    return _planes_to_stats(planes, comps, h, w, hmax, vmax)


def _planes_to_stats(planes, comps, h, w, hmax, vmax):
    """Upsample each component plane to frame resolution, crop,
    color-convert, and compute the stats contract — shared by the
    baseline and progressive decoders."""
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = np.clip(full[0], 0, 255)
        channels = 1
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        px = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
        channels = 3
    else:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    px = np.round(px)
    return {
        "width": int(w), "height": int(h), "channels": channels,
        "bit_depth": 8,
        "mean_px": float(px.mean()), "std_px": float(px.std()),
    }


# ---------------------------------------------------------------------
# progressive (SOF2) decoding — ITU T.81 Annex G, Huffman coding.
# Coefficients accumulate across scans in scan-order (zigzag-index)
# arrays; each scan is either a DC band (Ss=0, may be interleaved) or
# a single-component AC band (Ss>0, noninterleaved per G.1.1.1.1),
# first pass (Ah=0) or successive-approximation refinement (Ah>0).
# The IDCT runs ONCE, after all scans, batched over every block.
# ---------------------------------------------------------------------

def _next_marker(d, pos):
    """Position of the next non-stuffing, non-restart marker at or
    after pos (entropy data can only contain FF00 / FFD0-D7)."""
    while pos + 1 < len(d):
        if d[pos] == 0xFF and d[pos + 1] != 0x00:
            if 0xD0 <= d[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return len(d)


def _decode_progressive(d, frame, scan, qt, huff_dc, huff_ac,
                        restart_interval):
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"corrupt JPEG: missing DQT table {c['tq']}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs, nblk = {}, {}
    for c in comps:
        coefs[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        cw = -(-(w * c["h"]) // hmax)       # component raster dims
        ch = -(-(h * c["v"]) // vmax)
        nblk[c["id"]] = (-(-ch // 8), -(-cw // 8))
    ri = restart_interval
    while scan is not None:
        scomps, data_pos, ss, se, ah, al = scan
        for sc in scomps:
            if sc["id"] not in by_id:
                raise ValueError(
                    "corrupt JPEG: scan references undefined "
                    f"component {sc['id']}")
            if ss == 0 and ah == 0 and sc["dc"] not in huff_dc:
                raise ValueError(
                    f"corrupt JPEG: missing DC DHT table {sc['dc']}")
            if ss > 0 and sc["ac"] not in huff_ac:
                raise ValueError(
                    f"corrupt JPEG: missing AC DHT table {sc['ac']}")
        if ss > 63 or se > 63 or ss > se or ah > 13 or al > 13:
            # T.81 G.1: 0 <= Ss <= Se <= 63, Ah/Al successive-
            # approximation bit positions <= 13. Reject BEFORE
            # entropy-decoding: an out-of-band Se would index past the
            # 64-coefficient block (numpy IndexError, not the
            # ValueError the strict=False degrade-to-NULL contract in
            # multimodal.py catches).
            raise ValueError(
                "corrupt JPEG: invalid spectral selection "
                f"(Ss={ss}, Se={se}, Ah={ah}, Al={al})")
        if ss == 0 and se != 0:
            raise ValueError("corrupt JPEG: progressive DC scan with "
                             "Se != 0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("corrupt JPEG: progressive AC scan must "
                             "be single-component")
        br = _BitReader(d, data_pos)
        if ss == 0:
            _prog_dc_scan(br, scomps, by_id, coefs, nblk, mcux, mcuy,
                          huff_dc, ah, al, ri)
        else:
            _prog_ac_scan(br, by_id[scomps[0]["id"]], scomps[0], coefs,
                          nblk, huff_ac, ss, se, ah, al, ri)
        try:
            _, scan, ri2, _ = _parse_headers(
                d, _next_marker(d, br.pos), qt, huff_dc, huff_ac)
        except (IndexError, struct.error) as e:
            raise ValueError(
                f"corrupt JPEG: truncated marker segment ({e})")
        if ri2:
            ri = ri2
    # one batched dequantize + dezigzag + IDCT per component
    planes = {}
    for c in comps:
        cf = coefs[c["id"]]
        deq = cf.astype(np.float64) * qt[c["tq"]][None, None, :]
        rast = np.zeros_like(deq)
        rast[:, :, _ZIGZAG] = deq
        blocks = rast.reshape(cf.shape[0], cf.shape[1], 8, 8)
        px = np.einsum("ux,abuv,vy->abxy", _A, blocks, _A) + 128.0
        planes[c["id"]] = px.transpose(0, 2, 1, 3).reshape(
            cf.shape[0] * 8, cf.shape[1] * 8)
    return _planes_to_stats(planes, comps, h, w, hmax, vmax)


def _dc_block(br, coef, sc, pred, huff_dc, ah, al):
    if ah == 0:                       # first DC pass: DPCM of v >> Al
        t = huff_dc[sc["dc"]].decode(br)
        pred[sc["id"]] += _extend(br.read(t), t)
        coef[0] = pred[sc["id"]] << al
    elif br.read(1):                  # refinement: one bit per block
        coef[0] |= 1 << al


def _prog_dc_scan(br, scomps, by_id, coefs, nblk, mcux, mcuy, huff_dc,
                  ah, al, ri):
    pred = {sc["id"]: 0 for sc in scomps}
    n = 0
    if len(scomps) == 1:              # noninterleaved: real blocks only
        sc = scomps[0]
        c = by_id[sc["id"]]
        bh, bw_ = nblk[c["id"]]
        cf = coefs[c["id"]]
        for by in range(bh):
            for bx in range(bw_):
                if ri and n and n % ri == 0:
                    br.restart()
                    pred[sc["id"]] = 0
                _dc_block(br, cf[by, bx], sc, pred, huff_dc, ah, al)
                n += 1
        return
    for my in range(mcuy):            # interleaved: padded MCU grid
        for mx in range(mcux):
            if ri and n and n % ri == 0:
                br.restart()
                pred = {sc["id"]: 0 for sc in scomps}
            for sc in scomps:
                c = by_id[sc["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        _dc_block(
                            br,
                            coefs[c["id"]][my * c["v"] + by,
                                           mx * c["h"] + bx],
                            sc, pred, huff_dc, ah, al)
            n += 1


def _prog_ac_scan(br, c, sc, coefs, nblk, huff_ac, ss, se, ah, al, ri):
    ac = huff_ac[sc["ac"]]
    bh, bw_ = nblk[c["id"]]
    cf = coefs[c["id"]]
    eobrun = 0
    n = 0
    for by in range(bh):
        for bx in range(bw_):
            if ri and n and n % ri == 0:
                br.restart()
                eobrun = 0
            if ah == 0:
                eobrun = _ac_first_block(br, cf[by, bx], ac, ss, se,
                                         al, eobrun)
            else:
                eobrun = _ac_refine_block(br, cf[by, bx], ac, ss, se,
                                          al, eobrun)
            n += 1


def _ac_first_block(br, coef, ac, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:               # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1     # EOBn: this + next eobrun blocks
            if r:
                eobrun += br.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC index past band end")
        coef[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, coef, ac, ss, se, al, eobrun):
    """Successive-approximation AC refinement (T.81 G.2): each symbol
    either inserts a newly-significant +-2^Al coefficient after a run
    of zero-HISTORY positions, or starts an EOB run; every nonzero-
    history coefficient passed along the way carries one correction
    bit that may grow its magnitude by 2^Al."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if br.read(1) and (int(coef[k]) & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:           # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # r == 15 (ZRL): pass 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: AC refinement magnitude != 1")
                newval = p1 if br.read(1) else m1
            while k <= se:            # advance r zero-history slots,
                if coef[k] != 0:      # refining nonzero history passed
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:                    # EOB-run tail: correction bits
        while k <= se:                # for the rest of this block
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------
# encoder (tests only): baseline, 4:4:4, Annex K tables
# ---------------------------------------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K Huffman specs: (counts[16], symbols)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _encode_table(spec):
    """counts+symbols -> {symbol: (code, length)} canonical codes."""
    counts, symbols = spec
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            b = (self.acc >> (self.nacc - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)   # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)   # pad with 1s


def _magnitude(v: int):
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _prepare_planes(arr, quality_scale, subsample):
    """Shared encoder front end: color convert, optional 4:2:0
    subsample, quantization table. Returns (h, w, nc, planes, samp, q)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects gray or RGB")
    q = np.maximum(_QT_LUMA // quality_scale, 1)
    if nc == 3:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [a[..., 0].astype(np.float64)]
    if subsample and nc == 3:
        # pad to even dims, then 2x2 box-average the chroma planes
        def half(p):
            ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                        mode="edge")
            return (ph[0::2, 0::2] + ph[1::2, 0::2]
                    + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
        planes = [planes[0], half(planes[1]), half(planes[2])]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * nc
    return h, w, nc, planes, samp, q


def encode_jpeg(arr: "np.ndarray", quality_scale: int = 1,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode uint8 gray (h, w) or RGB (h, w, 3) as baseline JPEG
    (Annex K luma tables for every component — simple, valid, and
    enough for roundtrip tests). quality_scale divides the Annex K
    quantization table (1 = standard, larger = higher quality).
    subsample=True emits 4:2:0 chroma (RGB only); restart_interval>0
    emits DRI + RSTn markers every that-many MCUs — both exist so
    the DECODER's sampling-factor and restart paths are testable
    without PIL in the container."""
    h, w, nc, planes, samp, q = _prepare_planes(arr, quality_scale,
                                                subsample)
    dc_tab = _encode_table(_DC_LUMA_SPEC)
    ac_tab = _encode_table(_AC_LUMA_SPEC)

    out = bytearray(b"\xff\xd8")                       # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    # DQT payload is in ZIGZAG order: scan position i holds the
    # raster value at _ZIGZAG[i]
    seg(0xDB, bytes([0]) + bytes(int(x) for x in q[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    seg(0xC0, sof)
    dcc, dcs = _DC_LUMA_SPEC
    seg(0xC4, bytes([0x00]) + bytes(dcc) + bytes(dcs))
    acc_, acs = _AC_LUMA_SPEC
    seg(0xC4, bytes([0x10]) + bytes(acc_) + bytes(acs))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(nc)) + bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    qz = q.reshape(8, 8).astype(np.float64)
    zz = _ZIGZAG
    pred = [0] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def put_block(ci, plane, ys, xs):
        blk = np.full((8, 8), 128.0)
        sl = plane[ys:ys + 8, xs:xs + 8]
        blk[:sl.shape[0], :sl.shape[1]] = sl
        f = _fdct2(blk - 128.0)
        # raster -> scan order: scan[i] = raster[_ZIGZAG[i]]
        coef = np.round(f / qz).astype(np.int64).reshape(64)[zz]
        diff = int(coef[0]) - pred[ci]
        pred[ci] = int(coef[0])
        t, code = _magnitude(diff)
        hc, hl = dc_tab[t]
        bw.write(hc, hl)
        if t:
            bw.write(code, t)
        run = 0
        nz = np.nonzero(coef[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, 64):
            v = int(coef[k])
            if k > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_tab[0xF0]                  # ZRL
                bw.write(hc, hl)
                run -= 16
            t, code = _magnitude(v)
            hc, hl = ac_tab[(run << 4) | t]
            bw.write(hc, hl)
            bw.write(code, t)
            run = 0
        if last_nz < 63:
            hc, hl = ac_tab[0x00]                      # EOB
            bw.write(hc, hl)

    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                bw.flush()
                bw.buf.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                for i in range(nc):
                    pred[i] = 0
            for ci, plane in enumerate(planes):
                cv, chh = samp[ci][1], samp[ci][0]
                for by in range(cv):
                    for bx in range(chh):
                        put_block(ci, plane,
                                  (my * cv + by) * 8, (mx * chh + bx) * 8)
            n_mcu += 1
    bw.flush()
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")                            # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# progressive encoder (tests only): spectral selection + successive
# approximation (DC Al=1 -> refine; per-component AC 1..63 Al=1 ->
# refine), EOB-run accumulation with buffered correction bits — the
# full Annex G Huffman feature set the decoder must handle.
# ---------------------------------------------------------------------

# one flat canonical AC table covering all 256 (run<<4)|size symbols:
# 255 codes of length 9 + one of length 10 (DHT counts are bytes, so
# a single length can hold at most 255 symbols). Hugely suboptimal
# and perfectly valid — these streams exist to exercise the decoder.
_AC_FULL_SPEC = ([0] * 8 + [255, 1] + [0] * 6,
                 list(range(255)) + [255])


def _plane_coefs(plane, qz, pad_by, pad_bx):
    """Quantized DCT coefficients for the padded block grid, in scan
    (zigzag) order: (pad_by, pad_bx, 64) int64. Padding rule matches
    the baseline encoder's put_block (constant 128)."""
    padded = np.full((pad_by * 8, pad_bx * 8), 128.0)
    padded[:plane.shape[0], :plane.shape[1]] = plane
    blocks = (padded.reshape(pad_by, 8, pad_bx, 8)
              .transpose(0, 2, 1, 3) - 128.0)
    freq = np.einsum("ux,abxy,vy->abuv", _A, blocks, _A)
    coef = np.round(freq / qz).astype(np.int64)
    return coef.reshape(pad_by, pad_bx, 64)[:, :, _ZIGZAG]


class _EobRun:
    """EOB-run accumulator for progressive AC scans: counts run
    length and buffers the correction bits that belong to the run
    (refinement scans), emitted right after the EOBn symbol."""

    def __init__(self, bw, ac_tab):
        self.bw, self.ac_tab = bw, ac_tab
        self.n = 0
        self.bits = []

    def add(self, bits=()):
        self.n += 1
        self.bits.extend(bits)
        if self.n == 0x7FFF:          # EOBn caps at n=14 -> 32767
            self.flush()

    def flush(self):
        if not self.n:
            return
        nb = self.n.bit_length() - 1
        hc, hl = self.ac_tab[nb << 4]
        self.bw.write(hc, hl)
        if nb:
            self.bw.write(self.n - (1 << nb), nb)
        for b in self.bits:
            self.bw.write(b, 1)
        self.n = 0
        self.bits = []


def _enc_ac_first_block(bw, ac_tab, vq, ss, se, eob):
    """vq: point-transformed coefficients (sign * (|v| >> Al))."""
    nz = [k for k in range(ss, se + 1) if vq[k]]
    if not nz:
        eob.add()
        return
    eob.flush()
    r = 0
    for k in range(ss, nz[-1] + 1):
        v = int(vq[k])
        if v == 0:
            r += 1
            continue
        while r > 15:
            hc, hl = ac_tab[0xF0]
            bw.write(hc, hl)
            r -= 16
        t, code = _magnitude(v)
        hc, hl = ac_tab[(r << 4) | t]
        bw.write(hc, hl)
        bw.write(code, t)
        r = 0
    if nz[-1] < se:
        eob.add()


def _enc_ac_refine_block(bw, ac_tab, v, ss, se, al, eob):
    """Emit the Al-bit refinement of band coefficients (T.81 G.1.2.3):
    |v|>>Al == 0 -> zero run; == 1 -> newly significant (run-coded,
    sign bit); > 1 -> one buffered correction bit. Correction bits
    ride after the next emitted symbol (ZRL / run+1 / EOBn)."""
    temp = [abs(int(v[k])) >> al for k in range(64)]
    newsig = [k for k in range(ss, se + 1) if temp[k] == 1]
    eob_pos = newsig[-1] if newsig else ss - 1
    r = 0
    pend = []
    for k in range(ss, eob_pos + 1):
        t = temp[k]
        if t == 0:
            r += 1
            continue
        while r > 15:
            eob.flush()
            hc, hl = ac_tab[0xF0]
            bw.write(hc, hl)
            r -= 16
            for b in pend:
                bw.write(b, 1)
            pend = []
        if t > 1:                     # already significant: correction
            pend.append(t & 1)
            continue
        eob.flush()                   # newly significant
        hc, hl = ac_tab[(r << 4) | 1]
        bw.write(hc, hl)
        bw.write(1 if v[k] >= 0 else 0, 1)
        for b in pend:
            bw.write(b, 1)
        pend = []
        r = 0
    tail = [temp[k] & 1
            for k in range(eob_pos + 1, se + 1) if temp[k] > 1]
    if eob_pos < se:
        eob.add(tail)


def encode_jpeg_progressive(arr, quality_scale: int = 1,
                            subsample: bool = False) -> bytes:
    """Encode uint8 gray (h, w) or RGB (h, w, 3) as progressive JPEG
    (SOF2): interleaved DC scan at Al=1, DC refinement, then one AC
    first scan (Ss=1..63, Al=1) and one AC refinement scan per
    component. Coefficients match encode_jpeg's quantization exactly,
    so a progressive roundtrip must reproduce the baseline decode."""
    h, w, nc, planes, samp, q = _prepare_planes(arr, quality_scale,
                                                subsample)
    dc_tab = _encode_table(_DC_LUMA_SPEC)
    ac_tab = _encode_table(_AC_FULL_SPEC)
    qz = q.reshape(8, 8).astype(np.float64)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = [
        _plane_coefs(planes[i], qz, mcuy * samp[i][1], mcux * samp[i][0])
        for i in range(nc)
    ]
    # real (noninterleaved) block grid per component
    nblk = []
    for i in range(nc):
        cw = -(-(w * samp[i][0]) // hmax)
        ch = -(-(h * samp[i][1]) // vmax)
        nblk.append((-(-ch // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in q[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    seg(0xC2, sof)                                     # SOF2
    dcc, dcs = _DC_LUMA_SPEC
    seg(0xC4, bytes([0x00]) + bytes(dcc) + bytes(dcs))
    acc_, acs = _AC_FULL_SPEC
    seg(0xC4, bytes([0x10]) + bytes(acc_) + bytes(acs))

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)]) + b"".join(
            bytes([i + 1, 0x00]) for i in comp_ids
        ) + bytes([ss, se, (ah << 4) | al])
        seg(0xDA, body)

    def dc_blocks():
        """Block iterator matching the decoder's DC scan order."""
        if nc == 1:
            bh, bw_ = nblk[0]
            for by in range(bh):
                for bx in range(bw_):
                    yield 0, coefs[0][by, bx]
            return
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    chh, cv = samp[ci]
                    for by in range(cv):
                        for bx in range(chh):
                            yield ci, coefs[ci][my * cv + by,
                                                mx * chh + bx]

    # scan 1: DC first, Al=1 (DPCM over coef0 >> 1, arithmetic shift)
    sos(list(range(nc)), 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * nc
    for ci, blk in dc_blocks():
        vq = int(blk[0]) >> 1
        t, code = _magnitude(vq - pred[ci])
        pred[ci] = vq
        hc, hl = dc_tab[t]
        bw.write(hc, hl)
        if t:
            bw.write(code, t)
    bw.flush()
    out.extend(bw.buf)

    # scan 2: DC refinement, Ah=1 Al=0 (raw bit 0 of coef0 per block)
    sos(list(range(nc)), 0, 0, 1, 0)
    bw = _BitWriter()
    for ci, blk in dc_blocks():
        bw.write(int(blk[0]) & 1, 1)
    bw.flush()
    out.extend(bw.buf)

    for ci in range(nc):
        bh, bw_n = nblk[ci]
        # AC first, Al=1: sign * (|v| >> 1), truncation toward zero
        sos([ci], 1, 63, 0, 1)
        bw = _BitWriter()
        eob = _EobRun(bw, ac_tab)
        for by in range(bh):
            for bx in range(bw_n):
                v = coefs[ci][by, bx]
                vq = np.sign(v) * (np.abs(v) >> 1)
                _enc_ac_first_block(bw, ac_tab, vq, 1, 63, eob)
        eob.flush()
        bw.flush()
        out.extend(bw.buf)
        # AC refinement, Ah=1 Al=0
        sos([ci], 1, 63, 1, 0)
        bw = _BitWriter()
        eob = _EobRun(bw, ac_tab)
        for by in range(bh):
            for bx in range(bw_n):
                _enc_ac_refine_block(bw, ac_tab, coefs[ci][by, bx],
                                     1, 63, 0, eob)
        eob.flush()
        bw.flush()
        out.extend(bw.buf)

    out.extend(b"\xff\xd9")
    return bytes(out)
