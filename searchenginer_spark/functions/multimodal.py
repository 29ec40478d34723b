"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is REAL and tested — schemas, Arrow batch
shapes, mapInPandas signatures, partitioning. The ``decoder='real'``
path decodes the dependency-free formats in numpy inside the Arrow
UDFs — images: PPM (P6 binary / P3 ascii), 24-bit uncompressed BMP,
PNG at every bit depth incl. Adam7 interlace (stdlib zlib), sequential
AND progressive Huffman JPEG (:func:`decode_image`), plus
nearest-neighbor :func:`resize_image`; audio: RIFF/WAVE integer PCM
8/16/24/32, IEEE float 32/64, G.711 A-law/mu-law, IMA + MS ADPCM
(:func:`decode_wav`); video: RIFF-AVI, ISO-BMFF mp4/mov and
Matroska/WebM frame extraction (:func:`container_frames`).
NotImplementedError remains only for formats that genuinely need
external codecs (arithmetic-coded JPEG -> PIL/opencv, perceptual
audio mp3/aac -> libsndfile, FLV/MPEG-TS/Ogg -> ffmpeg), at the same
plug-in seam. ``decoder='fake'`` keeps the
deterministic byte-histogram stand-in for corpus-scale tests with
arbitrary bytes.

Media table shape:
    media(doc_id long, kind string, data binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

IMAGE_FEATURES_SCHEMA = "doc_id long, width int, height int, features array<float>"
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame binary"

N_IMAGE_FEATURES = 16
N_AUDIO_FEATURES = 8


# ------------------------------------------------------------ real decoders


def _ppm_decode(data: bytes) -> np.ndarray:
    """PPM P6 (binary) / P3 (ascii) -> (h, w, 3) uint8. Header grammar:
    magic, width, height, maxval as whitespace-separated tokens with
    ``#`` comments, one whitespace byte, then the raster."""
    magic = data[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    pos += 1  # the single whitespace byte after maxval
    if magic == b"P6":
        raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    else:  # P3: ascii sample values
        raster = np.array(data[pos:].split()[: w * h * 3], dtype=np.uint8)
    if raster.size != w * h * 3:
        raise ValueError("PPM raster truncated")
    if maxval != 255:
        # netpbm samples are fractions of maxval — rescale to 8-bit like
        # every standard decoder (otherwise maxval=15 images decode ~17x
        # too dark and the pixel features silently shift)
        raster = np.rint(raster.astype(np.float64) * (255.0 / maxval)).astype(
            np.uint8
        )
    return raster.reshape(h, w, 3)


def _bmp_decode(data: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP -> (h, w, 3) uint8 in RGB order.
    Rows are 4-byte aligned and stored bottom-up (top-down when the
    header height is negative)."""
    if len(data) < 54:
        raise ValueError("BMP header truncated")
    off_bits = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bitcount = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP {bitcount}-bit/compression={compression} needs PIL — "
            "only 24-bit BI_RGB decodes dependency-free"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off_bits)
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(filt: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the PNG scanline filters (spec §9: None/Sub/Up/Average/
    Paeth). ``filt`` is the inflated stream reshaped (h, 1 + stride);
    returns the reconstructed (h, stride) bytes. Up is vectorized
    row-wide; Sub/Average/Paeth recurse on the left neighbor so they run
    per-pixel-column — fine inside an Arrow batch at thumbnail scale (a
    production pipeline plugs PIL at this same seam for bulk decode)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(filt[y, 0])
        line = filt[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-recursive
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = rec.astype(np.uint8)
    return out


# Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_subimage(
    raw: bytes, off: int, w: int, h: int, channels: int, bitdepth: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub)image of the inflated stream starting
    at byte ``off``; returns ((h, w, channels) samples scaled to 8-bit,
    next offset). Sub-byte depths pack pixels MSB-first with row padding;
    16-bit samples take their high byte (the standard 8-bit reduction)."""
    bytes_per_px = max(1, channels * bitdepth // 8)
    stride = (w * channels * bitdepth + 7) // 8
    end = off + h * (stride + 1)
    if end > len(raw):
        raise ValueError("PNG pixel stream truncated")
    filt = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1), offset=off)
    rec = _png_unfilter(filt.reshape(h, stride + 1), h, stride, bytes_per_px)
    if bitdepth == 8:
        px = rec.reshape(h, stride)[:, : w * channels]
    elif bitdepth == 16:
        px = rec.reshape(h, stride)[:, 0 : w * channels * 2 : 2]  # high byte
    else:  # 1/2/4-bit gray or palette indices, MSB-first
        per_byte = 8 // bitdepth
        shifts = np.array(
            [8 - bitdepth * (i + 1) for i in range(per_byte)], dtype=np.uint8
        )
        mask = (1 << bitdepth) - 1
        unpacked = (rec[:, :, None] >> shifts[None, None, :]) & mask
        px = unpacked.reshape(h, stride * per_byte)[:, : w * channels]
    return px.reshape(h, w, channels), end


def _png_decode(data: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8 RGB, stdlib-only (zlib inflate + numpy
    unfilter). Color types: 0 gray, 2 RGB, 3 palette, 4 gray+alpha,
    6 RGBA (alpha dropped — features are RGB-space); bit depths
    1/2/4/8/16 (16-bit reduces to the high byte, sub-byte gray scales to
    8-bit); Adam7 interlace deinterlaced pass by pass. CRCs are not
    verified (forgiving decode, like the corpus XML scans)."""
    import zlib

    pos = len(_PNG_SIG)
    w = h = None
    bitdepth = colortype = interlace = 0
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if channels is None:
        raise ValueError(f"PNG color type {colortype} invalid")
    if bitdepth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {bitdepth} invalid")
    raw = zlib.decompress(bytes(idat))
    if interlace:
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass emits no bytes at all
            sub, off = _png_subimage(raw, off, pw, ph, channels, bitdepth)
            px[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("PNG pixel stream truncated")
    else:
        px, off = _png_subimage(raw, 0, w, h, channels, bitdepth)
        if off != len(raw):
            raise ValueError("PNG pixel stream truncated")
    if colortype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px[..., 0]]
    if bitdepth in (1, 2, 4):  # gray: scale sample range to 8-bit
        px = (px.astype(np.uint16) * (255 // ((1 << bitdepth) - 1))).astype(
            np.uint8
        )
    if colortype == 0:
        return np.repeat(px, 3, axis=2)
    if colortype == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3].copy()  # 2 = RGB passthrough, 6 = drop alpha


# JPEG zigzag scan order (ITU T.81 figure 5): zigzag index -> natural index
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)  # fmt: skip


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis T: spatial = T.T @ coeffs @ T."""
    n = np.arange(8)
    t = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0) / 2.0
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


class _JpegBits:
    """MSB-first bit reader over one entropy-coded interval (already
    unstuffed). Reads past the end return 0 bits — T.81's pad-bit rule;
    a truncated stream surfaces as a garbage block, not a crash."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self) -> int:
        if self.pos >= len(self.data):
            return 0
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v


def _huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _jpeg_entropy_intervals(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Slice one scan's post-SOS entropy stream into restart intervals:
    unstuff 0xFF00, split at RSTn, stop at any other marker. Returns
    (intervals, position of the terminating marker) so multi-scan files
    can resume header parsing after the entropy data."""
    out, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: new interval, markers carry no len
            out.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next scan header
            break
    out.append(bytes(cur))
    return out, pos


def _jpeg_ac_first(bits: _JpegBits, cb, ac_tab: dict, k: int, se: int, al: int) -> int:
    """First-pass AC decode over the band [k, se] of one block (T.81
    G.1.2.2; also the baseline AC path, where al=0 and EOB runs are
    always length 1). cb is the block's zigzag-order coefficient row.
    Returns the remaining EOB-run length: how many FURTHER blocks are
    entirely zero in this band."""
    while k <= se:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:  # EOBn: run of 2^r + receive(r) all-zero bands
                return (1 << r) - 1 + (bits.receive(r) if r else 0)
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        cb[k] = _extend(bits.receive(s), s) << al
        k += 1
    return 0


def _jpeg_ac_refine(
    bits: _JpegBits, cb, ac_tab: dict, k: int, se: int, al: int, eobrun: int
) -> int:
    """Successive-approximation AC refinement over [k, se] of one block
    (T.81 G.1.2.3, the libjpeg decode_mcu_AC_refine control flow):
    already-nonzero coefficients absorb a correction bit each time the
    scan passes them; newly nonzero ones arrive as sign + position.
    Returns the updated EOB-run counter (blocks inside an EOB run still
    consume correction bits for their nonzero history)."""
    p1, m1 = 1 << al, -1 << al
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn — includes this block, decremented below
                    eobrun = (1 << r) + (bits.receive(r) if r else 0)
                    break
                # ZRL: skip 16 zero-history positions (r counts them down)
            else:
                if s != 1:
                    raise ValueError("JPEG refinement scan with s > 1")
                val = p1 if bits.read() else m1
            while k <= se:
                c = int(cb[k])
                if c:
                    if bits.read() and not (c & p1):
                        cb[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                cb[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB-run blocks: correction bits only
            c = int(cb[k])
            if c and bits.read() and not (c & p1):
                cb[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_scan(
    data: bytes,
    pos: int,
    scan: list,
    comps: list,
    geom: tuple,
    huff: dict,
    restart: int,
    coefs: list,
    band: tuple,
) -> int:
    """Decode one scan's entropy data into the per-component zigzag
    coefficient stores. scan = [(comp_idx, dc_id, ac_id), ...]; band =
    (Ss, Se, Ah, Al). Single-component scans walk the component's own
    block grid (non-interleaved geometry); multi-component scans walk
    MCUs. Returns the position of the marker after the entropy data."""
    ss, se, ah, al = band
    mcus_x, mcus_y, nb_dims = geom
    intervals, endpos = _jpeg_entropy_intervals(data, pos)
    if len(scan) == 1:
        hb, wb = nb_dims[scan[0][0]]
        n_units = hb * wb
    else:
        n_units = mcus_x * mcus_y
    bits = _JpegBits(intervals[0])
    interval_i = 0
    pred = [0] * len(comps)
    eobrun = 0
    for u in range(n_units):
        if restart and u and u % restart == 0:
            interval_i += 1  # RSTn: DC predictors and EOB runs reset
            bits = _JpegBits(intervals[interval_i])
            pred = [0] * len(comps)
            eobrun = 0
        if len(scan) == 1:
            ci, dcid, acid = scan[0]
            wb = nb_dims[ci][1]
            blocks = [(ci, dcid, acid, u // wb, u % wb)]
        else:
            my, mx = divmod(u, mcus_x)
            blocks = []
            for ci, dcid, acid in scan:
                _, hs, vs, _ = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blocks.append((ci, dcid, acid, my * vs + by, mx * hs + bx))
        for ci, dcid, acid, by, bx in blocks:
            cb = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:  # DC first: diff-coded, shifted by Al
                    s = _huff_decode(bits, huff[(0, dcid)])
                    pred[ci] += _extend(bits.receive(s), s)
                    cb[0] = pred[ci] << al
                elif bits.read():  # DC refine: one raw bit per block
                    cb[0] = int(cb[0]) | (1 << al)
            if se > 0:
                k0 = max(ss, 1)
                if ah == 0:
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        eobrun = _jpeg_ac_first(bits, cb, huff[(1, acid)], k0, se, al)
                else:
                    eobrun = _jpeg_ac_refine(
                        bits, cb, huff[(1, acid)], k0, se, al, eobrun
                    )
    return endpos


def _jpeg_decode(data: bytes) -> np.ndarray:
    """Huffman JPEG -> (h, w, 3) uint8 RGB, dependency-free: sequential
    (SOF0/SOF1), interleaved or multi-scan non-interleaved, AND
    progressive (SOF2) with spectral selection + successive
    approximation. Segment parse, canonical Huffman decode, per-scan
    coefficient accumulation, batched numpy matrix IDCT,
    nearest-neighbor chroma upsample, JFIF YCbCr -> RGB; restart
    markers (DRI) supported in every scan shape. Arithmetic-coded,
    hierarchical and lossless variants raise NotImplementedError (the
    PIL seam). The bit loop is per-symbol Python — fine for
    thumbnail-scale Arrow batches, same caveat as the PNG unfilter;
    bulk decode plugs PIL at the same seam."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    restart = 0
    coefs: list | None = None  # per-comp (bh, bw, 64) int32, ZIGZAG order
    geom = None  # (mcus_x, mcus_y, [(comp_blocks_h, comp_blocks_w), ...])
    saw_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless markers
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — one or more tables per segment
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 15
                i += 1
                if prec:  # 16-bit entries
                    tbl = np.frombuffer(body, dtype=">u2", count=64, offset=i)
                    i += 128
                else:
                    tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=i)
                    i += 64
                nat = np.zeros(64, dtype=np.float64)
                nat[_JPEG_ZIGZAG] = tbl  # stored zigzag; used natural
                qt[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT — canonical code build per T.81 C.2
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                counts = body[i + 1 : i + 17]
                i += 17
                table, code = {}, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = body[i]
                        code += 1
                        i += 1
                    code <<= 1
                huff[(cls, tid)] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            progressive = marker == 0xC2
            _, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "arithmetic/hierarchical/lossless JPEG needs PIL — plug in "
                "here (sequential and progressive Huffman decode "
                "dependency-free)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h, w, comps = frame
            if coefs is None:  # first scan: allocate the coefficient store
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coefs, nb_dims = [], []
                for _, hs, vs, _ in comps:
                    coefs.append(
                        np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
                    )
                    cw = -(-(w * hs) // hmax)  # comp extent in samples
                    ch = -(-(h * vs) // vmax)
                    nb_dims.append((-(-ch // 8), -(-cw // 8)))
                geom = (mcus_x, mcus_y, nb_dims)
            ns = body[0]
            ids = [c[0] for c in comps]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((ids.index(cid), tabs >> 4, tabs & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0  # T.81 fixes these values
            elif (ss == 0) != (se == 0):
                raise ValueError("JPEG progressive DC scan must have Se=0")
            elif ss and ns != 1:
                raise ValueError("JPEG progressive AC scan must be single-component")
            pos = _jpeg_decode_scan(
                data, pos + seglen, scan, comps, geom, huff, restart, coefs,
                (ss, se, ah, al),
            )
            saw_scan = True
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    T = _dct_matrix()
    full = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        arr = coefs[ci].astype(np.float64)  # (bh, bw, 64) zigzag order
        nat = np.zeros_like(arr)
        nat[:, :, _JPEG_ZIGZAG] = arr
        deq = nat.reshape(arr.shape[0], arr.shape[1], 8, 8) * qt[tq]
        spatial = np.einsum("ij,abjk,kl->abil", T.T, deq, T)
        plane = spatial.transpose(0, 2, 1, 3).reshape(
            arr.shape[0] * 8, arr.shape[1] * 8
        )
        p = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_image(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB for the dependency-free formats (PPM P6/P3,
    24-bit BMP, PNG via stdlib zlib at every depth/interlace, sequential
    AND progressive Huffman JPEG); NotImplementedError for formats
    needing external codecs (arithmetic-coded JPEG, webp/avif, ...) —
    the documented PIL/opencv plug-in seam."""
    if data[:2] in (b"P6", b"P3"):
        return _ppm_decode(data)
    if data[:2] == b"BM":
        return _bmp_decode(data)
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return _png_decode(data)
    if data[:2] == b"\xff\xd8":
        return _jpeg_decode(data)
    raise NotImplementedError(
        f"image format {data[:4]!r} needs PIL/opencv — plug in here "
        "(PPM/24-bit BMP/PNG/sequential+progressive JPEG decode "
        "dependency-free)"
    )


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index mapping — no interpolation
    libraries). Output (height, width, channels)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // max(height, 1), h - 1)
    xs = np.minimum((np.arange(width) * w) // max(width, 1), w - 1)
    return img[ys][:, xs]


def _g711_ulaw_lut() -> np.ndarray:
    """256-entry mu-law -> int16 expansion table (ITU-T G.711; the
    classic CCITT g711.c ulaw2linear, vectorized: bias 0x84, 3-bit
    mantissa shifted by the segment)."""
    u = (~np.arange(256, dtype=np.uint8)).astype(np.int32)
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _g711_alaw_lut() -> np.ndarray:
    """256-entry A-law -> int16 expansion table (G.711 alaw2linear:
    XOR 0x55, segment 0 adds 8, higher segments add 0x108 then shift)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_G711_ULAW = _g711_ulaw_lut()
_G711_ALAW = _g711_alaw_lut()

# IMA/DVI ADPCM quantizer step sizes and index adjustments (IMA ADPCM
# reference algorithm, as in the Microsoft WAV DVI/IMA spec & audioop).
_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_adpcm_decode(raw: bytes, channels: int, block_align: int) -> np.ndarray:
    """WAV IMA/DVI ADPCM (format tag 0x11) -> (n, channels) float32.

    Block layout: per-channel 4-byte header (int16 predictor = first
    output sample, uint8 step index, reserved), then 4-byte words of 8
    nibbles (low nibble first) round-robin across channels. The decode
    loop is sequential in the sample index but vectorized across
    blocks x channels — every block is independent, so a long file
    decodes in samples-per-block numpy steps, not per-sample Python."""
    nch = max(channels, 1)
    if block_align < 4 * nch or (block_align - 4 * nch) % (4 * nch):
        raise ValueError(f"IMA ADPCM block_align {block_align} invalid for {nch}ch")
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.zeros((0, nch), dtype=np.float32)
    data = np.frombuffer(raw[: nblocks * block_align], dtype=np.uint8).reshape(
        nblocks, block_align
    )
    hdr = data[:, : 4 * nch].reshape(nblocks, nch, 4).astype(np.int32)
    pred = hdr[:, :, 0] | (hdr[:, :, 1] << 8)
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = np.clip(hdr[:, :, 2], 0, 88)
    nwords = (block_align - 4 * nch) // (4 * nch)
    words = data[:, 4 * nch :].reshape(nblocks, nwords, nch, 4)
    nib = np.empty(words.shape[:3] + (8,), dtype=np.uint8)
    nib[..., 0::2] = words & 0x0F
    nib[..., 1::2] = words >> 4
    nib = nib.transpose(0, 2, 1, 3).reshape(nblocks, nch, nwords * 8)
    out = np.empty((nblocks, nch, nwords * 8 + 1), dtype=np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    for t in range(nwords * 8):
        n = nib[:, :, t].astype(np.int32)
        step = _IMA_STEPS[idx]
        diff = (step >> 3) + np.where(n & 4, step, 0)
        diff += np.where(n & 2, step >> 1, 0) + np.where(n & 1, step >> 2, 0)
        pred = np.clip(np.where(n & 8, pred - diff, pred + diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[n & 7], 0, 88)
        out[:, :, t + 1] = pred.astype(np.int16)
    inter = out.transpose(0, 2, 1).reshape(-1, nch)
    return inter.astype(np.float32) / 32768.0


_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230,
     230, 230],
    dtype=np.int64,
)
_MS_COEFS = np.array(
    [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
     (392, -232)],
    dtype=np.int64,
)  # the seven standard MS ADPCM predictor pairs (coef / 256)


def _ms_adpcm_decode(
    raw: bytes, channels: int, block_align: int, coefs: np.ndarray
) -> np.ndarray:
    """WAV MS ADPCM (format tag 0x02) -> (n, channels) float32.

    Block layout: per-channel predictor index byte, then per-channel
    int16 iDelta / iSamp1 / iSamp2 headers, then 4-bit codes (high
    nibble first, channels round-robin per nibble). The two header
    samples are emitted first (iSamp2 then iSamp1); each code yields
    sample = (samp1*c1 + samp2*c2)/256 (toward zero, as in Microsoft's
    reference C) + signed_nibble*delta, clamped, with
    delta = max(16, adapt[code]*delta>>8). Sequential in the
    sample index, vectorized across blocks x channels."""
    nch = max(channels, 1)
    hdr_len = 7 * nch  # 1 + 2 + 2 + 2 bytes per channel
    if block_align <= hdr_len:
        raise ValueError(f"MS ADPCM block_align {block_align} too small for {nch}ch")
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.zeros((0, nch), dtype=np.float32)
    data = np.frombuffer(raw[: nblocks * block_align], dtype=np.uint8).reshape(
        nblocks, block_align
    )
    pred_idx = np.minimum(data[:, :nch].astype(np.int64), len(coefs) - 1)
    c1 = coefs[pred_idx, 0]  # (nblocks, nch)
    c2 = coefs[pred_idx, 1]

    def i16(col0: int) -> np.ndarray:  # per-channel little-endian int16 header
        b = data[:, col0 : col0 + 2 * nch].reshape(nblocks, nch, 2).astype(np.int64)
        v = b[:, :, 0] | (b[:, :, 1] << 8)
        return np.where(v >= 1 << 15, v - (1 << 16), v)

    delta = i16(nch)
    samp1 = i16(3 * nch)
    samp2 = i16(5 * nch)
    body = data[:, hdr_len:]
    nib = np.empty((nblocks, body.shape[1] * 2), dtype=np.int64)
    nib[:, 0::2] = body >> 4  # high nibble first
    nib[:, 1::2] = body & 0x0F
    n_codes = nib.shape[1] // nch  # per channel
    codes = nib[:, : n_codes * nch].reshape(nblocks, n_codes, nch)
    out = np.empty((nblocks, n_codes + 2, nch), dtype=np.int64)
    out[:, 0] = samp2
    out[:, 1] = samp1
    for t in range(n_codes):
        n = codes[:, t]
        signed = np.where(n >= 8, n - 16, n)
        # Microsoft's reference decoder divides by 256 in C — integer
        # division TOWARD ZERO, not an arithmetic shift (floor): the
        # two differ by 1 on negative non-multiple-of-256 predictions
        t2 = samp1 * c1 + samp2 * c2
        pred = np.sign(t2) * (np.abs(t2) >> 8)
        s = np.clip(pred + signed * delta, -32768, 32767)
        delta = np.maximum(16, (_MS_ADAPT[n] * delta) >> 8)
        samp2, samp1 = samp1, s
        out[:, t + 2] = s
    return (out.reshape(-1, nch).astype(np.float32)) / 32768.0


def _wav_samples(raw: bytes, fmt: int, bits: int) -> np.ndarray:
    """data-chunk bytes -> flat float32 in [-1, 1] for the fixed-width
    encodings: integer PCM 8 (unsigned)/16/24/32, IEEE float 32/64, and
    the G.711 companded pair (A-law fmt 6 / mu-law fmt 7)."""
    if fmt == 1:  # integer PCM
        if bits == 8:
            return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        if bits == 16:
            return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        if bits == 24:
            b = np.frombuffer(raw[: len(raw) - len(raw) % 3], dtype=np.uint8)
            b = b.reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            return v.astype(np.float32) / float(1 << 23)
        if bits == 32:
            return np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
    elif fmt == 3:  # IEEE float
        if bits == 32:
            return np.frombuffer(raw, dtype="<f4").astype(np.float32)
        if bits == 64:
            return np.frombuffer(raw, dtype="<f8").astype(np.float32)
    elif fmt == 6:  # G.711 A-law
        return _G711_ALAW[np.frombuffer(raw, dtype=np.uint8)].astype(np.float32) / 32768.0
    elif fmt == 7:  # G.711 mu-law
        return _G711_ULAW[np.frombuffer(raw, dtype=np.uint8)].astype(np.float32) / 32768.0
    raise NotImplementedError(
        f"WAV format={fmt}/bits={bits} needs libsndfile — PCM 8/16/24/32, "
        "float 32/64, G.711 a/mu-law and IMA ADPCM decode dependency-free"
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (samples float32 in [-1, 1] shaped (n, ch),
    sample_rate). Walks the chunk list (fmt / fact / data; others
    skipped). Decodes integer PCM 8/16/24/32-bit, IEEE float 32/64-bit,
    G.711 A-law/mu-law, IMA/DVI ADPCM (format tag 0x11) and MS ADPCM
    (tag 0x02, coef pairs from the fmt extension) — block codecs
    truncated to the fact-chunk frame count — and the
    WAVE_FORMAT_EXTENSIBLE wrapper; perceptual codecs
    (mp3/aac/vorbis...) raise NotImplementedError (libsndfile seam)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            f"audio container {data[:4]!r} needs libsndfile/ffmpeg — "
            "plug in here (WAV PCM/float/G.711/IMA-ADPCM decode "
            "dependency-free)"
        )
    pos = 12
    rate = channels = fmt = bits = block_align = n_frames = None
    raw: bytes | None = None
    fmt_body = b""
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = bytes(body)
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            block_align = struct.unpack_from("<H", body, 12)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt == 0xFFFE:  # EXTENSIBLE: real format leads the GUID
                if len(body) < 26:
                    raise ValueError("WAV extensible fmt chunk truncated")
                fmt = struct.unpack_from("<H", body, 24)[0]
        elif cid == b"fact" and size >= 4:
            n_frames = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            raw = bytes(body)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt == 0x11:  # IMA/DVI ADPCM — block codec, needs align not bits
        frames = _ima_adpcm_decode(raw, channels, block_align)
    elif fmt == 0x02:  # MS ADPCM — coef pairs ride the fmt extension
        coefs = _MS_COEFS
        if len(fmt_body) >= 22:  # cbSize @16, samples/block @18, nCoef @20
            ncoef = struct.unpack_from("<H", fmt_body, 20)[0]
            if ncoef and len(fmt_body) >= 22 + 4 * ncoef:
                coefs = (
                    np.frombuffer(fmt_body, dtype="<i2", count=2 * ncoef, offset=22)
                    .astype(np.int64)
                    .reshape(ncoef, 2)
                )
        frames = _ms_adpcm_decode(raw, channels, block_align, coefs)
    else:
        frames = _wav_samples(raw, fmt, bits).reshape(-1, channels)
    if n_frames is not None and fmt in (0x02, 0x11):
        # fact chunk: true frame count — authoritative only for the
        # block codecs (the last block is usually padded); for plain
        # PCM/float the data chunk is the truth and stale/zero fact
        # values exist in the wild
        frames = frames[:n_frames]
    return frames, int(rate)


def _fake_decode_image(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    a 16-dim feature vector derived from the byte histogram."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_IMAGE_FEATURES, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=N_IMAGE_FEATURES, range=(0, 256))
    return (hist / max(arr.size, 1)).astype(np.float32)


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim features from a decoded (h, w, 3) image: per-channel
    mean/std (scaled to [0, 1]) + a 10-bin normalized luminance
    histogram — the classic cheap visual descriptor."""
    f = img.astype(np.float64)
    mean = f.mean(axis=(0, 1)) / 255.0
    std = f.std(axis=(0, 1)) / 255.0
    lum = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=10, range=(0.0, 255.001))
    return np.concatenate([mean, std, hist / max(lum.size, 1)]).astype(np.float32)


def extract_image_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """(doc_id, width, height, features) via mapInPandas over image rows.

    The filter on kind prunes non-image rows BEFORE the Python boundary
    (pushed to the parquet scan); the UDF sees only image bytes.

    decoder='real': numpy PPM/BMP/PNG (all depths, incl. Adam7
    interlace)/baseline-AND-progressive-JPEG decode (:func:`decode_image`),
    actual pixel-space features (:func:`image_features`), width/height
    from the DECODED raster (metadata can lie; pixels don't). The
    remaining NotImplementedError formats are the genuinely-external
    codecs: arithmetic/hierarchical/lossless JPEG, non-24-bit/compressed
    BMP, and any container other than PPM/BMP/PNG/JPEG (webp, avif, gif,
    tiff, ...) — each raises at the documented PIL plug-in seam.
    decoder='fake': deterministic byte-histogram features with metadata
    dimensions."""
    imgs = media.filter(media.kind == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                dims, feats = [], []
                for d in pdf["data"]:
                    img = decode_image(bytes(d) if d is not None else b"")
                    dims.append((img.shape[1], img.shape[0]))
                    feats.append(image_features(img).tolist())
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": [w for w, _ in dims],
                        "height": [h for _, h in dims],
                        "features": feats,
                    }
                )
                continue
            feats = [
                _fake_decode_image(
                    d if d is not None else b"",
                    int(m["width"] or 0),
                    int(m["height"] or 0),
                ).tolist()
                for d, m in zip(pdf["data"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [int(m["width"] or 0) for m in pdf["meta"]],
                    "height": [int(m["height"] or 0) for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """8-dim features from decoded samples (n, ch) in [-1, 1]: duration,
    RMS, zero-crossing rate, peak, plus a 4-bin |amplitude| histogram.
    Math runs in float64 with ONE float32 cast at the end, so an oracle
    computing in double and casting to REAL reproduces the exact values
    (the same parity contract image_features keeps)."""
    samples = np.asarray(samples, dtype=np.float64)
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = mono.size
    if n == 0:
        return np.zeros(N_AUDIO_FEATURES, dtype=np.float32)
    zc = np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
    hist, _ = np.histogram(np.abs(mono), bins=4, range=(0.0, 1.0001))
    return np.concatenate(
        [
            [n / rate, float(np.sqrt((mono**2).mean())),
             zc / max(n - 1, 1), float(np.abs(mono).max())],
            hist / n,
        ]
    ).astype(np.float32)


def extract_audio_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """(doc_id, sample_rate, n_samples, features) over audio rows —
    decoder='real' decodes PCM16 WAV (:func:`decode_wav`) and extracts
    sample-space features; 'fake' reinterprets the raw bytes as int16
    with the metadata sample rate (deterministic stand-in)."""
    aud = media.filter(media.kind == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, feats = [], [], []
            for d, m in zip(pdf["data"], pdf["meta"]):
                raw = bytes(d) if d is not None else b""
                if decoder == "real":
                    samples, rate = decode_wav(raw)
                else:
                    rate = int((m["sample_rate"] if m is not None else None) or 16000)
                    samples = (
                        np.frombuffer(raw[: len(raw) & ~1], dtype="<i2")
                        .astype(np.float32) / 32768.0
                    ).reshape(-1, 1)
                rates.append(rate)
                counts.append(samples.shape[0])
                feats.append(audio_features(samples, rate).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "features": feats,
                }
            )

    return aud.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def _avi_frames(data: bytes) -> list[bytes]:
    """RIFF-AVI video stream -> per-frame byte blobs, in stream order.
    Walks LIST/movi (and nested rec ) chunks collecting ``##dc``/``##db``
    frame chunks; headers/index/audio chunks are skipped. Frame PAYLOADS
    stay opaque bytes — for MJPEG AVIs each blob is a baseline JPEG that
    :func:`decode_image` decodes, making the whole video path
    dependency-free end to end."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF-AVI container")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            if cid == b"LIST":
                if data[pos + 8 : pos + 12] in (b"movi", b"rec "):
                    walk(pos + 12, pos + 8 + size)
            elif cid[2:4] in (b"dc", b"db") and all(
                c in b"0123456789ABCDEFabcdef" for c in cid[:2]
            ):
                # stream numbers are TWO ASCII HEX digits (##dc/##db) —
                # isdigit() silently skipped streams 0x0A..0xFF
                frames.append(bytes(data[pos + 8 : pos + 8 + size]))
            pos += 8 + size + (size & 1)  # chunks are word-aligned

    walk(12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0]))
    return frames


def _bmff_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, box_end) for ISO BMFF boxes in
    [pos, end) — handles 64-bit largesize (size==1) and to-end (size==0)."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        typ = bytes(data[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            raise ValueError(f"BMFF box {typ!r} size {size} < header")
        yield typ, pos + hdr, pos + size
        pos += size


def _bmff_child(data: bytes, pos: int, end: int, fourcc: bytes):
    """(body_start, box_end) of the first child box with this fourcc."""
    for typ, b, e in _bmff_boxes(data, pos, end):
        if typ == fourcc:
            return b, e
    return None


def _mp4_frames(data: bytes) -> list[bytes]:
    """ISO BMFF (MP4 / QuickTime .mov) video track -> per-sample byte
    blobs in decode order. Walks moov -> trak, picks the first track
    whose mdia/hdlr handler is ``vide``, and reconstructs every sample's
    (offset, size) from the sample tables: stsz/stz2 sizes, stsc
    sample-to-chunk runs, stco/co64 chunk offsets. Sample payloads stay
    opaque (for an MJPEG track each is a JPEG blob
    :func:`decode_image` handles). Fragmented MP4 (moof) and codecs
    needing parameter-set surgery are out of scope here — samples are
    returned as stored."""
    moov = _bmff_child(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("BMFF container without a moov box")
    for typ, tb, te in _bmff_boxes(data, *moov):
        if typ != b"trak":
            continue
        mdia = _bmff_child(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _bmff_child(data, *mdia, b"hdlr")
        # handler type: byte 8 of the body in both ISO (pre_defined then
        # handler_type) and QuickTime (component type then subtype)
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _bmff_child(data, *mdia, b"minf")
        stbl = _bmff_child(data, *minf, b"stbl") if minf else None
        if stbl is None:
            continue
        return _bmff_samples(data, *stbl)
    raise ValueError("BMFF container has no video track")


def _bmff_samples(data: bytes, sb: int, se: int) -> list[bytes]:
    """Extract sample blobs from one stbl box body."""
    stsz = _bmff_child(data, sb, se, b"stsz")
    stz2 = _bmff_child(data, sb, se, b"stz2")
    stsc = _bmff_child(data, sb, se, b"stsc")
    stco = _bmff_child(data, sb, se, b"stco")
    co64 = _bmff_child(data, sb, se, b"co64")
    if (stsz is None and stz2 is None) or stsc is None or (
        stco is None and co64 is None
    ):
        raise ValueError("stbl missing stsz|stz2/stsc/stco sample tables")
    if stsz is not None:
        p = stsz[0]
        fixed_size, n_samples = struct.unpack_from(">II", data, p + 4)
        sizes = (
            np.full(n_samples, fixed_size, dtype=np.int64)
            if fixed_size
            else np.frombuffer(
                data, dtype=">u4", count=n_samples, offset=p + 12
            ).astype(np.int64)
        )
    else:  # stz2: compact sizes at field_size 4/8/16 bits
        p = stz2[0]
        field_size = data[p + 7]
        (n_samples,) = struct.unpack_from(">I", data, p + 8)
        if field_size == 16:
            sizes = np.frombuffer(
                data, dtype=">u2", count=n_samples, offset=p + 12
            ).astype(np.int64)
        elif field_size == 8:
            sizes = np.frombuffer(
                data, dtype=np.uint8, count=n_samples, offset=p + 12
            ).astype(np.int64)
        elif field_size == 4:  # two sizes per byte, high nibble first
            packed = np.frombuffer(
                data, dtype=np.uint8, count=(n_samples + 1) // 2, offset=p + 12
            )
            sizes = np.empty(packed.size * 2, dtype=np.int64)
            sizes[0::2] = packed >> 4
            sizes[1::2] = packed & 0x0F
            sizes = sizes[:n_samples]
        else:
            raise ValueError(f"stz2 field size {field_size} invalid")
    if co64 is not None:
        p = co64[0]
        n_chunks = struct.unpack_from(">I", data, p + 4)[0]
        offsets = np.frombuffer(data, dtype=">u8", count=n_chunks, offset=p + 8)
    else:
        p = stco[0]
        n_chunks = struct.unpack_from(">I", data, p + 4)[0]
        offsets = np.frombuffer(data, dtype=">u4", count=n_chunks, offset=p + 8)
    p = stsc[0]
    n_runs = struct.unpack_from(">I", data, p + 4)[0]
    runs = np.frombuffer(data, dtype=">u4", count=3 * n_runs, offset=p + 8).reshape(
        n_runs, 3
    )  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)
    # expand stsc runs -> samples-per-chunk for every chunk
    if n_chunks and (n_runs == 0 or int(runs[0, 0]) != 1):
        raise ValueError("stsc runs must start at chunk 1")
    per_chunk = np.zeros(n_chunks, dtype=np.int64)
    for i in range(n_runs):
        first = int(runs[i, 0]) - 1
        last = int(runs[i + 1, 0]) - 1 if i + 1 < n_runs else n_chunks
        per_chunk[first:last] = int(runs[i, 1])
    frames: list[bytes] = []
    s = 0
    for c in range(n_chunks):
        off = int(offsets[c])
        for _ in range(int(per_chunk[c])):
            if s >= n_samples:
                break
            size = int(sizes[s])
            frames.append(bytes(data[off : off + size]))
            off += size
            s += 1
    return frames


_BMFF_TOP = (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide", b"pnot")
_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _ebml_vint(data: bytes, pos: int, keep_marker: bool = False):
    """Parse one EBML variable-length integer at pos. Returns
    (value, next_pos, byte_length). keep_marker=True keeps the length
    marker bit (element-ID style); False strips it (size style)."""
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("EBML vint longer than 8 bytes")
    length, mask = 1, 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
    val = b0 if keep_marker else b0 & (mask - 1)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length, length


def _ebml_children(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML elements in
    [pos, end). Unknown-size elements (all size bits set) extend to the
    parent's end — the streaming-Matroska convention."""
    while pos < end:
        eid, pos, _ = _ebml_vint(data, pos, keep_marker=True)
        size, pos, slen = _ebml_vint(data, pos)
        if size == (1 << (7 * slen)) - 1:  # unknown size: runs to end
            size = end - pos
        yield eid, pos, min(pos + size, end)
        pos += size


def _mkv_unlace(body: bytes) -> tuple[int, list[bytes]]:
    """(Simple)Block payload -> (track_number, frame list), handling
    the four lacing modes (none / Xiph / fixed / EBML)."""
    track, p, _ = _ebml_vint(body, 0)
    p += 2  # relative timestamp (int16)
    lacing = (body[p] >> 1) & 3
    p += 1
    if lacing == 0:
        return track, [bytes(body[p:])]
    n = body[p] + 1
    p += 1
    sizes: list[int] = []
    if lacing == 1:  # Xiph: 255-continued byte sums for frames 0..n-2
        for _ in range(n - 1):
            s = 0
            while True:
                s += body[p]
                stop = body[p] < 255
                p += 1
                if stop:
                    break
            sizes.append(s)
    elif lacing == 2:  # fixed: equal sizes
        each = (len(body) - p) // n
        sizes = [each] * (n - 1)
    elif n > 1:  # EBML: first absolute, then signed-vint deltas (a
        size, p, _ = _ebml_vint(body, p)  # 1-frame lace has NO size fields)
        sizes.append(size)
        for _ in range(n - 2):
            raw, p, slen = _ebml_vint(body, p)
            size += raw - ((1 << (7 * slen - 1)) - 1)
            sizes.append(size)
    frames = []
    for s in sizes:
        frames.append(bytes(body[p : p + s]))
        p += s
    frames.append(bytes(body[p:]))  # last frame: the remainder
    return track, frames


def _mkv_frames(data: bytes) -> list[bytes]:
    """Matroska / WebM -> per-frame byte blobs of the first video track,
    in cluster order. Walks EBML elements: Segment -> Tracks (TrackEntry
    with TrackType 1 selects the video TrackNumber) and Segment ->
    Cluster -> SimpleBlock / BlockGroup>Block, un-lacing each block.
    Frame payloads stay opaque codec bitstreams (an MJPEG track's are
    JPEG blobs :func:`decode_image` handles)."""
    if data[:4] != _EBML_MAGIC:
        raise ValueError("not an EBML/Matroska container")
    segment = None
    for eid, b, e in _ebml_children(data, 0, len(data)):
        if eid == 0x18538067:  # Segment
            segment = (b, e)
            break
    if segment is None:
        raise ValueError("Matroska container without a Segment")
    video_track = None
    for eid, b, e in _ebml_children(data, *segment):
        if eid != 0x1654AE6B:  # Tracks
            continue
        for tid, tb, te in _ebml_children(data, b, e):
            if tid != 0xAE:  # TrackEntry
                continue
            num = ttype = None
            for fid, fb, fe in _ebml_children(data, tb, te):
                if fid == 0xD7:  # TrackNumber
                    num = int.from_bytes(data[fb:fe], "big")
                elif fid == 0x83:  # TrackType
                    ttype = int.from_bytes(data[fb:fe], "big")
            if ttype == 1 and num is not None and video_track is None:
                video_track = num
    if video_track is None:
        raise ValueError("Matroska container has no video track")
    frames: list[bytes] = []
    for eid, b, e in _ebml_children(data, *segment):
        if eid != 0x1F43B675:  # Cluster
            continue
        for cid, cb, ce in _ebml_children(data, b, e):
            blocks = []
            if cid == 0xA3:  # SimpleBlock
                blocks.append((cb, ce))
            elif cid == 0xA0:  # BlockGroup
                blocks.extend(
                    (gb, ge)
                    for gid, gb, ge in _ebml_children(data, cb, ce)
                    if gid == 0xA1  # Block
                )
            for bb, be in blocks:
                track, fr = _mkv_unlace(data[bb:be])
                if track == video_track:
                    frames.extend(fr)
    return frames


def container_frames(data: bytes) -> list[bytes]:
    """Video container -> per-frame/sample byte blobs: RIFF-AVI
    (:func:`_avi_frames`), ISO BMFF mp4/mov (:func:`_mp4_frames`) and
    Matroska/WebM (:func:`_mkv_frames`) parse dependency-free; other
    containers (FLV, MPEG-TS, Ogg...) raise NotImplementedError (the
    ffmpeg seam)."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return _avi_frames(data)
    if len(data) >= 8 and data[4:8] in _BMFF_TOP:
        return _mp4_frames(data)
    if data[:4] == _EBML_MAGIC:
        return _mkv_frames(data)
    raise NotImplementedError(
        f"video container {data[:8]!r} needs ffmpeg — plug in here "
        "(RIFF-AVI, ISO-BMFF mp4/mov and Matroska/WebM frame "
        "extraction parse dependency-free)"
    )


def sample_video_frames(
    media: DataFrame, every_n: int = 10, decoder: str = "fake"
) -> DataFrame:
    """(doc_id, frame_idx, frame) — sample every n-th frame of video rows.

    decoder='real' walks RIFF-AVI, ISO-BMFF mp4/mov and Matroska/WebM
    containers (:func:`container_frames`): frame_idx is the
    stream-order frame number and ``frame`` the raw frame payload (for
    MJPEG tracks, a JPEG blob :func:`decode_image` decodes). Other
    containers raise at the ffmpeg seam. The fake
    decoder slices the raw byte stream into n_frames equal chunks (the
    Arrow/batch shape is identical either way)."""
    vids = media.filter(media.kind == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                out_doc, out_idx, out_frame = [], [], []
                for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                    frames = container_frames(bytes(data) if data is not None else b"")
                    for i in range(0, len(frames), every_n):
                        out_doc.append(doc_id)
                        out_idx.append(i)
                        out_frame.append(frames[i])
                yield pd.DataFrame(
                    {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
                )
                continue
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, data, meta in zip(pdf["doc_id"], pdf["data"], pdf["meta"]):
                n = int(meta["n_frames"] or 0)
                if not data or n <= 0:
                    continue
                size = max(len(data) // n, 1)
                for i in range(0, n, every_n):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(bytes(data[i * size : (i + 1) * size]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return vids.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/demos."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        data = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = {
            "width": 32 + i % 7 if kind == "image" else None,
            "height": 24 + i % 5 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 12 + i % 4 if kind == "video" else None,
        }
        rows.append((i, kind, data, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
