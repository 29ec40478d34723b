from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from searchenginer_spark.functions.multimodal import (
    extract_image_features,
    make_fake_media,
    sample_video_frames,
)
from searchenginer_spark.plans.build_index import IndexPaths, build_index, open_index
from searchenginer_spark.sources.corpus import build_docs
from searchenginer_spark.streaming.incremental import incremental_index
from searchenginer_spark.streaming.windows import sessionize, windowed_event_counts


def test_incremental_index_equivalent_results(spark, tmp_path_factory):
    """Stream-fold two doc chunks -> AND/OR queries return the same doc sets
    as a batch build over the union (scores may differ: stats staleness)."""
    base = str(tmp_path_factory.mktemp("inc"))
    input_dir, root, ckpt = f"{base}/in", f"{base}/idx", f"{base}/ckpt"

    docs = build_docs(spark, 300, seed=42, num_partitions=4).persist()
    d1 = docs.filter(F.col("doc_id") < 200)
    d2 = docs.filter(F.col("doc_id") >= 200)

    d1.write.mode("append").parquet(input_dir)
    incremental_index(spark, input_dir, root, ckpt, docs_per_part=64)
    idx = open_index(spark, root)
    n1 = idx.search("int return", k=50, mode="and").count()
    assert n1 > 0

    d2.write.mode("append").parquet(input_dir)
    incremental_index(spark, input_dir, root, ckpt, docs_per_part=64)
    idx = open_index(spark, root)
    got = {r["doc_id"] for r in idx.search("int return", k=500, mode="and").collect()}

    ref_root = str(tmp_path_factory.mktemp("inc_ref"))
    build_index(docs, ref_root, docs_per_part=64)
    want = {
        r["doc_id"]
        for r in open_index(spark, ref_root).search("int return", k=500, mode="and").collect()
    }
    assert got == want

    # exactly-once: re-running with no new files changes nothing
    before = spark.read.parquet(IndexPaths(root).postings).count()
    incremental_index(spark, input_dir, root, ckpt, docs_per_part=64)
    assert spark.read.parquet(IndexPaths(root).postings).count() == before


def test_windowed_counts_stream_equals_batch(spark, tmp_path_factory):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")  # watermark needs TIMESTAMP, not NTZ
    )
    max_ts = events.agg(F.max("ts")).first()[0]
    batch = windowed_event_counts(events, window="1 hour")
    # append mode only emits windows the watermark has passed; with a 0s
    # delay that is every window ending at or before max event time
    want = sorted(
        tuple(r) for r in batch.filter(F.col("window_end") <= F.lit(max_ts)).collect()
    )

    # same aggregation through the streaming engine (availableNow drain)
    base = str(tmp_path_factory.mktemp("evstream"))
    events.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(events.schema).parquet(f"{base}/in").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = windowed_event_counts(stream, window="1 hour", watermark="0 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.read.parquet(f"{base}/out").collect())
    assert got == want
    shutil.rmtree(base, ignore_errors=True)


def test_sessionize_batch(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 1.0),
        (1, "2024-01-01 01:30:00", 1.0),  # new session (gap > 30m)
        (2, "2024-01-01 00:05:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, gap="30 minutes").orderBy("user_id", "session_start").collect()
    assert [(r["user_id"], r["n_events"]) for r in out] == [(1, 2), (1, 1), (2, 1)]


def test_streaming_dedup_stateful(spark, tmp_path_factory):
    from searchenginer_spark.streaming.stateful import streaming_dedup

    base = str(tmp_path_factory.mktemp("sdedup"))
    rows1 = [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")]  # 2 dups 0
    rows2 = [(5, "alpha beta"), (6, "epsilon zeta"), (7, "gamma delta")]
    spark.createDataFrame(rows1, "doc_id long, text string").write.mode("append").parquet(f"{base}/in")

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").parquet(f"{base}/in")
        q = (
            streaming_dedup(stream)
            .writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got1 = {r["doc_id"] for r in spark.read.parquet(f"{base}/out").collect()}
    assert got1 == {0, 1}  # doc 2 suppressed (same content as 0, lowest id wins)

    # second batch: 5 and 7 are dups of content already emitted -> suppressed
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode("append").parquet(f"{base}/in")
    drain()
    got2 = {r["doc_id"] for r in spark.read.parquet(f"{base}/out").collect()}
    assert got2 == {0, 1, 6}, got2  # state persisted across restarts


def test_image_features_plumbing(spark):
    media = make_fake_media(spark, n=60)
    feats = extract_image_features(media).collect()
    assert len(feats) == 20  # every 3rd row is an image
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-5  # normalized histogram
    # deterministic across runs
    again = extract_image_features(make_fake_media(spark, n=60)).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, again))


def test_video_frame_sampling(spark):
    media = make_fake_media(spark, n=60)
    frames = sample_video_frames(media, every_n=5).collect()
    assert len(frames) > 0
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc, idxs in by_doc.items():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, 5))
        assert all(i % 5 == 0 for i in idxs)


def test_real_decoder_raises(spark):
    media = make_fake_media(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        extract_image_features(media, decoder="real").collect()


# ------------------------------------------------------- r5 real decoders


def _make_ppm_p6(img):
    import numpy as np

    h, w, _ = img.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _make_ppm_p3(img):
    h, w, _ = img.shape
    vals = " ".join(str(int(v)) for v in img.reshape(-1))
    return ("P3\n%d %d\n255\n%s" % (w, h, vals)).encode()


def _make_bmp24(img, top_down=False):
    import struct

    import numpy as np

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = img[..., ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        rows[y].astype(np.uint8).tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h)
    )
    off = 54
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + dib + body


def _make_wav_pcm16(samples, rate):
    import struct

    import numpy as np

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    body = pcm.tobytes()
    ch = samples.shape[1] if samples.ndim == 2 else 1
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def test_decode_image_roundtrip_ppm_and_bmp():
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import decode_image, resize_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_make_ppm_p6(img)), img)
    assert np.array_equal(decode_image(_make_ppm_p3(img)), img)
    assert np.array_equal(decode_image(_make_bmp24(img)), img)
    assert np.array_equal(decode_image(_make_bmp24(img, top_down=True)), img)
    # resize: nearest-neighbor 2x then back reproduces the original
    big = resize_image(img, 14, 10)
    assert big.shape == (10, 14, 3)
    assert np.array_equal(resize_image(big, 7, 5), img)
    # low-maxval PPM rescales to 8-bit like standard decoders
    low = b"P3\n2 1\n15\n15 0 7 3 15 1"
    import numpy as _np
    want = _np.rint(_np.array([[ [15,0,7],[3,15,1] ]]) * (255.0/15)).astype("uint8")
    assert _np.array_equal(decode_image(low), want)
    # unknown magic hits the declared PIL seam (PNG + baseline JPEG
    # decode since r6)
    with _pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"GIF89a..")
    # 8-bit palette BMP also needs PIL
    bad = bytearray(_make_bmp24(img))
    bad[28:30] = (8).to_bytes(2, "little")
    with _pytest.raises(NotImplementedError, match="24-bit"):
        decode_image(bytes(bad))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


_ADAM7_TEST = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_pack_rows(img, bitdepth):
    """(h, w, ch) samples -> (h, stride) packed byte rows (MSB-first for
    sub-byte depths, big-endian for 16-bit)."""
    import numpy as np

    h, w, ch = img.shape
    if bitdepth == 8:
        return img.astype(np.uint8).reshape(h, w * ch).astype(np.int32)
    if bitdepth == 16:
        raw = np.frombuffer(img.astype(">u2").tobytes(), dtype=np.uint8)
        return raw.reshape(h, w * ch * 2).astype(np.int32)
    per_byte = 8 // bitdepth
    stride = (w * ch * bitdepth + 7) // 8
    out = np.zeros((h, stride), dtype=np.int32)
    flat = img.reshape(h, w * ch)
    for i in range(w * ch):
        byte_i, slot = divmod(i, per_byte)
        out[:, byte_i] |= (flat[:, i] & ((1 << bitdepth) - 1)) << (
            8 - bitdepth * (slot + 1)
        )
    return out


def _png_filter_image(rows, bpp, filters):
    """Filter packed byte rows (one filter type per row, cycling
    ``filters``) into the PNG scanline serialization."""
    import numpy as np

    lines = bytearray()
    h, stride = rows.shape
    for y in range(h):
        f = filters[y % len(filters)]
        cur = rows[y]
        prev = rows[y - 1] if y else np.zeros_like(cur)
        out = np.zeros_like(cur)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, c)}[f]
            out[x] = (cur[x] - pred) & 0xFF
        lines += bytes([f]) + out.astype(np.uint8).tobytes()
    return lines


def _make_png(img, colortype, filters, palette=None, bitdepth=8, interlace=0):
    """Hand-rolled PNG encoder (spec-faithful: real CRCs, per-row filter
    types, Adam7 pass extraction, sub-byte/16-bit packing) so the
    decoder is tested against independently constructed bytes. ``img``
    is (h, w, ch) raw samples for the color type; ``filters`` gives the
    filter type per row."""
    import struct
    import zlib

    h, w, ch = img.shape
    bpp = max(1, ch * bitdepth // 8)
    lines = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7_TEST:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += _png_filter_image(
                    _png_pack_rows(sub, bitdepth), bpp, filters
                )
    else:
        lines += _png_filter_image(_png_pack_rows(img, bitdepth), bpp, filters)

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, interlace)
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        png += chunk(b"PLTE", palette.astype("uint8").tobytes())
    png += chunk(b"IDAT", zlib.compress(bytes(lines)))
    return png + chunk(b"IEND", b"")


def test_decode_png_all_filters_and_color_types():
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    # each filter type alone, then all five mixed across rows
    for f in range(5):
        assert np.array_equal(decode_image(_make_png(img, 2, [f])), img), f
    assert np.array_equal(decode_image(_make_png(img, 2, [0, 1, 2, 3, 4])), img)
    # grayscale replicates to RGB
    gray = rng.integers(0, 256, size=(4, 4, 1), dtype=np.uint8)
    assert np.array_equal(
        decode_image(_make_png(gray, 0, [1, 4])), np.repeat(gray, 3, axis=2)
    )
    # gray+alpha: alpha dropped, gray replicated
    ga = rng.integers(0, 256, size=(3, 4, 2), dtype=np.uint8)
    assert np.array_equal(
        decode_image(_make_png(ga, 4, [2, 3])), np.repeat(ga[..., :1], 3, axis=2)
    )
    # RGBA: alpha dropped
    rgba = rng.integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(_make_png(rgba, 6, [4])), rgba[..., :3])
    # palette indirection
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 6, 1), dtype=np.uint8)
    assert np.array_equal(
        decode_image(_make_png(idx, 3, [0, 1], palette=pal)), pal[idx[..., 0]]
    )
    # invalid bit depth is a hard error (1/2/4/8/16 all decode)
    bad_depth = bytearray(_make_png(img, 2, [0]))
    bad_depth[bad_depth.index(b"IHDR") + 12] = 3  # IHDR byte 8 = depth
    with _pytest.raises(ValueError, match="bit depth"):
        decode_image(bytes(bad_depth))
    # truncated pixel stream (IHDR claims 6 rows, IDAT carries 3) is a
    # hard error, not garbage pixels — CRCs are deliberately not checked
    import struct as _s
    short = _make_png(img[:3], 2, [0])
    body_at = short.index(b"IHDR") + 4
    lied = (
        short[:body_at]
        + _s.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
        + short[body_at + 13 :]
    )
    with _pytest.raises(ValueError, match="truncated"):
        decode_image(lied)


def test_decode_png_depths_and_interlace():
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(13)
    # 16-bit RGB reduces to each sample's high byte
    deep = rng.integers(0, 1 << 16, size=(5, 6, 3), dtype=np.uint16)
    got = decode_image(_make_png(deep, 2, [0, 2, 4], bitdepth=16))
    assert np.array_equal(got, (deep >> 8).astype(np.uint8))
    # 16-bit gray+alpha: high byte, alpha dropped, replicated
    ga = rng.integers(0, 1 << 16, size=(4, 5, 2), dtype=np.uint16)
    got = decode_image(_make_png(ga, 4, [1, 3], bitdepth=16))
    assert np.array_equal(got, np.repeat((ga[..., :1] >> 8).astype(np.uint8), 3, 2))
    # sub-byte grayscale scales the sample range to 8-bit
    for bd in (1, 2, 4):
        lv = (1 << bd) - 1
        g = rng.integers(0, lv + 1, size=(6, 11, 1), dtype=np.uint8)
        got = decode_image(_make_png(g, 0, [0, 1, 2], bitdepth=bd))
        want = np.repeat((g * (255 // lv)).astype(np.uint8), 3, axis=2)
        assert np.array_equal(got, want), bd
    # 4-bit palette indices (packed two per byte, odd width padding)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 7, 1), dtype=np.uint8)
    got = decode_image(_make_png(idx, 3, [0, 4], bitdepth=4, palette=pal))
    assert np.array_equal(got, pal[idx[..., 0]])
    # Adam7 interlace: odd dims exercise empty and partial passes
    for shape in [(9, 7), (1, 1), (3, 2), (16, 16), (2, 10)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        got = decode_image(_make_png(img, 2, [0, 1, 2, 3, 4], interlace=1))
        assert np.array_equal(got, img), shape
    # interlaced palette at 4-bit: both features at once
    idx2 = rng.integers(0, 16, size=(10, 9, 1), dtype=np.uint8)
    got = decode_image(_make_png(idx2, 3, [2, 3], bitdepth=4,
                                 palette=pal, interlace=1))
    assert np.array_equal(got, pal[idx2[..., 0]])


def test_decode_png_property_roundtrip():
    """Property (hypothesis): for random sizes, color types, pixel
    contents, and per-row filter choices, decode(encode(img)) is exact —
    the unfilter recursion (left/up/upper-left dependencies) has no
    shape- or content-dependent edge cases."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchenginer_spark.functions.multimodal import decode_image

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        colortype=st.sampled_from([0, 2, 4, 6]),
        seed=st.integers(0, 2**31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
        interlace=st.sampled_from([0, 1]),
    )
    def run(w, h, colortype, seed, filters, interlace):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got = decode_image(_make_png(img, colortype, filters, interlace=interlace))
        if colortype == 2:
            want = img
        elif colortype == 6:
            want = img[..., :3]
        else:
            want = np.repeat(img[..., :1], 3, axis=2)
        assert np.array_equal(got, want)

    run()


# --------------------------------------------------------------- JPEG
# Test-side baseline JFIF encoder, written independently of the decoder
# (forward DCT + quantization + canonical Huffman from hand-chosen code
# lengths). The Huffman tables are deliberately simple — DC: all 12
# categories at 5 bits; AC: 255 symbols at 9 bits + symbol 255 at 10 —
# which still exercises the decoder's canonical DHT build across two
# code lengths without Annex-K constant blobs.


def _jpeg_dct_T():
    import numpy as np

    n = np.arange(8)
    t = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0) / 2.0
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


_JZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]  # fmt: skip


def _jpeg_tables():
    dc_bits = [0, 0, 0, 0, 12] + [0] * 11
    ac_bits = [0] * 8 + [255, 1] + [0] * 6
    def enc_map(bits):
        m, code, sym = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                m[sym] = (length, code)
                code += 1
                sym += 1
            code <<= 1
        return m
    return dc_bits, enc_map(dc_bits), ac_bits, enc_map(ac_bits)


class _JpegBW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # T.81 pad bits are 1s


def _jpeg_pad(plane, mh, mw):
    """Edge-replicate a (h, w) plane up to multiples of (mh, mw)."""
    import numpy as np

    h, w = plane.shape
    return np.pad(
        plane, ((0, -h % mh), (0, -w % mw)), mode="edge"
    )


def _rgb_to_ycbcr(img):
    import numpy as np

    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    return y, cb, cr


def _block_avg(plane, fy, fx):
    h, w = plane.shape
    return plane.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))


def _jpeg_encode(img, quant=1, subsample=(1, 1), restart=0):
    """img: (h, w) uint8 grayscale or (h, w, 3) uint8 RGB. ``quant``
    fills both quant tables uniformly (1 = near-lossless); ``subsample``
    = Y's (hs, vs) sampling factors (chroma stays 1x1, so (2, 2) is
    4:2:0); ``restart`` inserts RSTn every that many MCUs."""
    import struct as s

    import numpy as np

    T = _jpeg_dct_T()
    gray = img.ndim == 2
    hs, vs = (1, 1) if gray else subsample
    h, w = img.shape[:2]
    if gray:
        planes = [(_jpeg_pad(img.astype(np.float64), 8, 8), 0)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        ypad = _jpeg_pad(y, 8 * vs, 8 * hs)
        planes = [
            (ypad, 0),
            (_block_avg(_jpeg_pad(cb, 8 * vs, 8 * hs), vs, hs), 1),
            (_block_avg(_jpeg_pad(cr, 8 * vs, 8 * hs), vs, hs), 1),
        ]
    qtab = np.full((8, 8), quant, dtype=np.float64)
    dc_bits, dc_map, ac_bits, ac_map = _jpeg_tables()

    def put_val(bw, table, v):
        mag = abs(v)
        cat = mag.bit_length()
        length, code = table[cat] if table is dc_map else table[cat]
        bw.put(code, length)
        if cat:
            bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)

    def encode_block(bw, block, pred):
        d = T @ (block - 128.0) @ T.T
        q = np.rint(d / qtab).astype(np.int64)
        zz = [int(q.flat[_JZZ[i]]) for i in range(64)]
        diff = zz[0] - pred
        put_val(bw, dc_map, diff)
        k, run = 1, 0
        last = max([i for i in range(1, 64) if zz[i]] or [0])
        while k <= last:
            if zz[k] == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                length, code = ac_map[0xF0]
                bw.put(code, length)  # ZRL
                run -= 16
            v = zz[k]
            cat = abs(v).bit_length()
            length, code = ac_map[(run << 4) | cat]
            bw.put(code, length)
            bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
            run = 0
            k += 1
        if last < 63:
            length, code = ac_map[0x00]
            bw.put(code, length)  # EOB
        return zz[0]

    # --- entropy-coded data: MCU-interleaved scan
    mcus_x = -(-w // (8 * hs))
    mcus_y = -(-h // (8 * vs))
    comp_geom = [(hs, vs)] + ([(1, 1), (1, 1)] if not gray else [])
    data = bytearray()
    bw = _JpegBW()
    pred = [0] * len(planes)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            bw.flush()
            data += bw.out
            data += b"\xff" + bytes([0xD0 + (rst & 7)])
            rst += 1
            bw = _JpegBW()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, ((chs, cvs), (plane, _)) in enumerate(zip(comp_geom, planes)):
            for by in range(cvs):
                for bx in range(chs):
                    y0 = (my * cvs + by) * 8
                    x0 = (mx * chs + bx) * 8
                    pred[ci] = encode_block(
                        bw, plane[y0 : y0 + 8, x0 : x0 + 8], pred[ci]
                    )
    bw.flush()
    data += bw.out

    # --- segments
    def seg(marker, body):
        return b"\xff" + bytes([marker]) + s.pack(">H", len(body) + 2) + body

    zzq = bytes(int(qtab.flat[_JZZ[i]]) for i in range(64))
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + zzq + bytes([0x01]) + zzq)
    ncomp = 1 if gray else 3
    sof = s.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (hs << 4) | vs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC0, sof)
    for cls, tid, bits in ((0, 0, dc_bits), (1, 0, ac_bits),
                           (0, 1, dc_bits), (1, 1, ac_bits)):
        syms = bytes(range(sum(bits)))
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + syms)
    if restart:
        out += seg(0xDD, s.pack(">H", restart))
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    out += seg(0xDA, sos + bytes([0, 63, 0]))
    return out + bytes(data) + b"\xff\xd9"


def test_decode_jpeg_dc_only_hand_fixture():
    """Gray 8x8 constant 200, quant 16: the only nonzero coefficient is
    DC = round(8*(200-128)/16) = 36; decode gives 36*16/8 + 128 = 200
    exactly — hand-computable end to end."""
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    img = np.full((8, 8), 200, dtype=np.uint8)
    got = decode_image(_jpeg_encode(img, quant=16))
    assert got.shape == (8, 8, 3)
    assert np.all(got == 200)


def test_decode_jpeg_gray_and_color_roundtrip():
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(17)
    # smooth gradient + noise: exercises DC drift across blocks and AC runs
    gy = np.clip(
        np.add.outer(np.arange(16) * 6, np.arange(24) * 4)
        + rng.integers(-20, 20, size=(16, 24)),
        0,
        255,
    ).astype(np.uint8)
    got = decode_image(_jpeg_encode(gy, quant=1))
    assert got.shape == (16, 24, 3)
    assert np.array_equal(got[..., 0], got[..., 1])  # gray replicates
    err = got[..., 0].astype(int) - gy.astype(int)
    assert np.abs(err).max() <= 5 and np.abs(err).mean() < 1.5

    # 4:4:4 color: only DCT-rounding + colorspace noise
    img = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    got = decode_image(_jpeg_encode(img, quant=1))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8

    # odd dimensions: encoder pads edge-replicated, decoder crops back
    odd = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    got = decode_image(_jpeg_encode(odd, quant=1))
    assert got.shape == odd.shape
    assert np.abs(got.astype(int) - odd.astype(int)).max() <= 8


def test_decode_jpeg_420_subsampling_and_restart():
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(20, 28, 3), dtype=np.uint8)
    got = decode_image(_jpeg_encode(img, quant=1, subsample=(2, 2)))
    assert got.shape == img.shape
    # expected = the SAME subsample pipeline computed independently in
    # numpy: chroma block-averaged 2x2 then nearest-upsampled
    y, cb, cr = _rgb_to_ycbcr(img)
    exp = []
    for p in (cb, cr):
        ds = _block_avg(_jpeg_pad(p, 16, 16), 2, 2)
        exp.append(np.repeat(np.repeat(ds, 2, 0), 2, 1)[:20, :28])
    cbu, cru = exp
    rgb = np.stack(
        [
            y + 1.402 * (cru - 128),
            y - 0.344136 * (cbu - 128) - 0.714136 * (cru - 128),
            y + 1.772 * (cbu - 128),
        ],
        axis=2,
    )
    want = np.clip(np.rint(rgb), 0, 255)
    assert np.abs(got.astype(float) - want).max() <= 8

    # restart markers: byte-aligned RSTn resets DC predictors mid-scan
    gray = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    plain = decode_image(_jpeg_encode(gray, quant=1))
    rst = decode_image(_jpeg_encode(gray, quant=1, restart=2))
    assert np.array_equal(plain, rst)

    # arithmetic-coded SOF hits the declared PIL seam
    arith = bytearray(_jpeg_encode(gray, quant=1))
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_image(bytes(arith))


def test_decode_jpeg_property_roundtrip():
    """Property: random shapes / contents / quant / subsampling decode
    within the quantization error bound (q=1 keeps it tight; q=4 scales
    the tolerance with the max IDCT amplification of per-coefficient
    rounding, ~q*4)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchenginer_spark.functions.multimodal import decode_image

    @settings(max_examples=12, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 18),
        gray=st.booleans(),
        quant=st.sampled_from([1, 4]),
        sub=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(w, h, gray, quant, sub, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_image(_jpeg_encode(img, quant=quant, subsample=sub))
        assert got.shape == (h, w, 3)
        if gray:
            err = got[..., 0].astype(int) - img.astype(int)
            assert np.abs(err).max() <= 5 + 4 * quant
        elif sub == (1, 1):
            err = got.astype(int) - img.astype(int)
            assert np.abs(err).max() <= 8 + 4 * quant
        # subsampled color: shape/validity only — values checked by the
        # dedicated 4:2:0 pipeline-parity test above

    run()


def test_decode_wav_roundtrip():
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import decode_wav

    t = np.arange(800) / 8000.0
    mono = np.sin(2 * np.pi * 440 * t).reshape(-1, 1)
    got, rate = decode_wav(_make_wav_pcm16(mono, 8000))
    assert rate == 8000 and got.shape == (800, 1)
    assert np.abs(got - mono).max() < 1e-3
    stereo = np.stack([mono[:, 0], -mono[:, 0]], axis=1)
    got2, _ = decode_wav(_make_wav_pcm16(stereo, 8000))
    assert got2.shape == (800, 2)
    assert np.abs(got2 - stereo).max() < 1e-3
    with _pytest.raises(NotImplementedError, match="libsndfile"):
        decode_wav(b"OggS....")


def _make_wav(samples, rate, fmt, bits, extensible=False):
    """Generic test-side WAV writer for the uncompressed encodings."""
    import struct

    import numpy as np

    x = np.clip(samples, -1, 1)
    ch = x.shape[1] if x.ndim == 2 else 1
    if fmt == 1 and bits == 8:
        body = (np.rint(x * 127) + 128).astype(np.uint8).tobytes()
    elif fmt == 1 and bits == 16:
        body = np.rint(x * 32767).astype("<i2").tobytes()
    elif fmt == 1 and bits == 24:
        v = np.rint(x * ((1 << 23) - 1)).astype(np.int64).ravel()
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.zeros((v.size, 3), dtype=np.uint8)
        b[:, 0], b[:, 1], b[:, 2] = v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF
        body = b.tobytes()
    elif fmt == 1 and bits == 32:
        body = np.rint(x * ((1 << 31) - 1)).astype("<i4").tobytes()
    elif fmt == 3 and bits == 32:
        body = x.astype("<f4").tobytes()
    elif fmt == 3 and bits == 64:
        body = x.astype("<f8").tobytes()
    else:
        raise AssertionError("unsupported test encoding")
    block = ch * bits // 8
    if extensible:
        guid = struct.pack("<H", fmt) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
             0x00, 0x38, 0x9B, 0x71]
        )
        fmtc = struct.pack(
            "<HHIIHHHHI", 0xFFFE, ch, rate, rate * block, block, bits,
            22, bits, (1 << ch) - 1,
        ) + guid
    else:
        fmtc = struct.pack("<HHIIHH", fmt, ch, rate, rate * block, block, bits)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmtc) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def _make_mjpeg_avi(frames, with_rec=False):
    """Minimal spec-shaped AVI: LIST/hdrl stub, LIST/movi holding 00dc
    JPEG frame chunks interleaved with a skippable 01wb audio chunk,
    trailing idx1. ``with_rec`` nests the frames one level deeper in a
    LIST/rec  group (the interleaved-AVI layout)."""
    import struct

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def list_chunk(ltype, body):
        return b"LIST" + struct.pack("<I", 4 + len(body)) + ltype + body

    avih = chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0, len(frames),
                                      0, 1, 0, 0, 0, 0, 0, 0, 0))
    hdrl = list_chunk(b"hdrl", avih)
    movi_body = b""
    for i, f in enumerate(frames):
        fr = chunk(b"00dc", f)
        if with_rec:
            fr = list_chunk(b"rec ", fr)
        movi_body += fr
        if i == 0:  # an audio chunk the walker must skip
            movi_body += chunk(b"01wb", b"\x01\x02\x03\x04")
    movi = list_chunk(b"movi", movi_body)
    idx = chunk(b"idx1", b"\x00" * 16)
    body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sample_video_frames_real_mjpeg_avi(spark):
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _avi_frames,
        container_frames,
        decode_image,
        sample_video_frames,
    )

    rng = np.random.default_rng(31)
    srcs = [
        np.clip(
            np.add.outer(np.arange(8) * 9, np.arange(16) * 5) + 12 * k,
            0, 255,
        ).astype(np.uint8)
        for k in range(7)
    ]
    jpegs = [_jpeg_encode(s, quant=1) for s in srcs]
    # container walk: audio chunks skipped, rec -nesting transparent
    assert _avi_frames(_make_mjpeg_avi(jpegs)) == jpegs
    assert _avi_frames(_make_mjpeg_avi(jpegs, with_rec=True)) == jpegs
    # FLV stays behind the ffmpeg seam
    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        container_frames(b"FLV\x01\x05\x00\x00\x00\x09....")

    rows = [
        (0, "video", _make_mjpeg_avi(jpegs),
         {"width": None, "height": None, "sample_rate": None, "n_frames": 999}),
        (1, "video", _make_mjpeg_avi(jpegs[:3], with_rec=True),
         {"width": None, "height": None, "sample_rate": None, "n_frames": 1}),
        (2, "image", b"not a video",
         {"width": 1, "height": 1, "sample_rate": None, "n_frames": None}),
        (3, "video", _make_mjpeg_mp4(jpegs[:4]),
         {"width": None, "height": None, "sample_rate": None, "n_frames": 4}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_video_frames(media, every_n=3, decoder="real").collect()
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in out}
    # metadata n_frames lies; the container is the truth (7 -> idx 0,3,6)
    assert set(got) == {(0, 0), (0, 3), (0, 6), (1, 0), (3, 0), (3, 3)}
    for (doc, idx), blob in got.items():
        dec = decode_image(blob)
        src = srcs[idx] if doc in (0, 3) else srcs[0]
        err = dec[..., 0].astype(int) - src.astype(int)
        assert np.abs(err).max() <= 5  # JPEG q=1 bound, gray replicated


def test_decode_wav_all_uncompressed_encodings():
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import decode_wav

    t = np.arange(400) / 8000.0
    mono = (0.8 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    stereo = np.stack([mono[:, 0], -0.5 * mono[:, 0]], axis=1)
    cases = [
        (1, 8, 1.0 / 127),      # unsigned PCM8: ~7-bit magnitude
        (1, 16, 1e-3),
        (1, 24, 1e-6),
        (1, 32, 1e-7),
        (3, 32, 1e-7),          # IEEE float passthrough
        (3, 64, 1e-7),
    ]
    for fmt, bits, tol in cases:
        for sig in (mono, stereo):
            got, rate = decode_wav(_make_wav(sig, 8000, fmt, bits))
            assert rate == 8000 and got.shape == sig.shape, (fmt, bits)
            assert np.abs(got - sig).max() <= tol + 1e-2 * (bits == 8), (fmt, bits)
    # WAVE_FORMAT_EXTENSIBLE wrapper resolves to the wrapped encoding
    got, rate = decode_wav(_make_wav(stereo, 16000, 3, 32, extensible=True))
    assert rate == 16000 and np.abs(got - stereo).max() <= 1e-7
    got, _ = decode_wav(_make_wav(mono, 16000, 1, 24, extensible=True))
    assert np.abs(got - mono).max() <= 1e-6
    # a (buggy) fact chunk on plain PCM must NOT truncate — the data
    # chunk is authoritative for non-block codecs; zero-length fact
    # chunks exist in the wild
    pcm = bytearray(_make_wav(mono, 8000, 1, 16))
    at = pcm.index(b"data")
    import struct as _s

    pcm[at:at] = b"fact" + _s.pack("<II", 4, 0)
    riffsz = _s.unpack_from("<I", pcm, 4)[0] + 12
    pcm[4:8] = _s.pack("<I", riffsz)
    got, _ = decode_wav(bytes(pcm))
    assert got.shape == mono.shape

    # perceptual codecs stay behind the seam (fmt 0x55 = MP3)
    mp3 = bytearray(_make_wav(mono, 8000, 1, 16))
    at = mp3.index(b"fmt ") + 8
    mp3[at:at + 2] = (0x55).to_bytes(2, "little")
    with _pytest.raises(NotImplementedError, match="libsndfile"):
        decode_wav(bytes(mp3))


def test_real_decoder_spark_paths(spark):
    import numpy as np

    from searchenginer_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        extract_audio_features,
        extract_image_features,
        image_features,
    )

    rng = np.random.default_rng(11)
    rows = []
    imgs = {}
    wavs = {}
    for i in range(6):
        img = rng.integers(0, 256, size=(4 + i, 6, 3), dtype=np.uint8)
        imgs[i] = img
        data = _make_ppm_p6(img) if i % 2 == 0 else _make_bmp24(img)
        # metadata deliberately WRONG: real decode must report pixel truth
        rows.append((i, "image", data, {"width": 999, "height": 999,
                                        "sample_rate": None, "n_frames": None}))
    for i in range(6, 9):
        s = rng.standard_normal((200 + i, 1)) * 0.1
        wavs[i] = s
        rows.append((i, "audio", _make_wav_pcm16(s, 16000),
                     {"width": None, "height": None,
                      "sample_rate": 16000, "n_frames": None}))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["doc_id"]: r for r in
             extract_image_features(media, decoder="real").collect()}
    assert set(feats) == set(range(6))
    for i, img in imgs.items():
        r = feats[i]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        want = image_features(img)
        assert np.abs(np.array(r["features"]) - want).max() < 1e-6

    afeats = {r["doc_id"]: r for r in
              extract_audio_features(media, decoder="real").collect()}
    assert set(afeats) == {6, 7, 8}
    for i in afeats:
        r = afeats[i]
        assert r["sample_rate"] == 16000 and r["n_samples"] == 200 + i
        # features recomputed from the QUANTIZED samples the wav holds
        pcm = (np.clip(wavs[i], -1, 1) * 32767).astype("<i2")
        deq = (pcm.astype(np.float32) / 32768.0).reshape(-1, 1)
        want = audio_features(deq, 16000)
        assert np.abs(np.array(r["features"]) - want).max() < 1e-6


# ------------------------------------------------------- r6b codec closures


def _make_wav_raw(body, rate, fmt, ch, bits, block_align, n_frames=None):
    """WAV writer that takes pre-encoded data-chunk bytes (G.711 / ADPCM),
    with an optional fact chunk carrying the true frame count."""
    import struct

    fmtc = struct.pack("<HHIIHH", fmt, ch, rate, rate * block_align,
                       block_align, bits)
    fact = (b"fact" + struct.pack("<II", 4, n_frames)
            if n_frames is not None else b"")
    payload = (b"fmt " + struct.pack("<I", len(fmtc)) + fmtc + fact
               + b"data" + struct.pack("<I", len(body)) + body
               + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload


def test_decode_wav_g711_matches_audioop():
    """G.711 mu-law/A-law expansion over every code byte == the stdlib
    audioop oracle (the canonical CCITT g711.c tables)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import decode_wav

    audioop = _pytest.importorskip("audioop")  # stdlib until 3.12

    codes = bytes(range(256)) * 2
    for fmt, name in ((7, "ulaw"), (6, "alaw")):
        want = np.frombuffer(
            getattr(audioop, f"{name}2lin")(codes, 2), dtype="<i2"
        ).astype(np.float32) / 32768.0
        got, rate = decode_wav(_make_wav_raw(codes, 8000, fmt, 1, 8, 1))
        assert rate == 8000 and got.shape == (512, 1), name
        assert np.array_equal(got[:, 0], want), name
        # stereo deinterleave
        got2, _ = decode_wav(_make_wav_raw(codes, 8000, fmt, 2, 8, 2))
        assert got2.shape == (256, 2)
        assert np.array_equal(got2.T.ravel(), want.reshape(256, 2).T.ravel())
    # struct imported for parity with the other helpers
    assert struct.calcsize("<H") == 2


def _ima_encode_wav(x, rate, spb):
    """Scalar spec-reference IMA ADPCM encoder (per-block header =
    first sample; step index persists across blocks). Returns (wav
    bytes, expected int16 decode chain) — the chain is what a correct
    decoder must reproduce EXACTLY."""
    import struct

    import numpy as np

    steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
             37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
             157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
             544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
             1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
             4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
             12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
             29794, 32767]
    itab = [-1, -1, -1, -1, 2, 4, 6, 8]
    x = np.asarray(x, dtype=np.int64)  # (n, ch) int16 range
    n, ch = x.shape
    pad = (-n) % spb
    x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)]) if pad else x
    idx = [0] * ch
    out = b""
    chain = np.zeros_like(x)
    for b0 in range(0, x.shape[0], spb):
        blk = x[b0 : b0 + spb]
        hdr = b""
        nibbles = [[] for _ in range(ch)]
        for c in range(ch):
            pred = int(blk[0, c])
            hdr += struct.pack("<hBB", pred, idx[c], 0)
            chain[b0, c] = pred
            for t in range(1, spb):
                step = steps[idx[c]]
                diff = int(blk[t, c]) - pred
                code = 0
                if diff < 0:
                    code, diff = 8, -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                vp = (step >> 3) + (step if code & 4 else 0) \
                    + ((step >> 1) if code & 2 else 0) \
                    + ((step >> 2) if code & 1 else 0)
                pred = max(-32768, min(32767, pred - vp if code & 8 else pred + vp))
                idx[c] = max(0, min(88, idx[c] + itab[code & 7]))
                nibbles[c].append(code)
                chain[b0 + t, c] = pred
        data = b""
        for g in range(0, spb - 1, 8):  # 4-byte words round-robin per channel
            for c in range(ch):
                grp = nibbles[c][g : g + 8]
                word = 0
                for j, nb in enumerate(grp):
                    word |= nb << (4 * j)
                data += struct.pack("<I", word)
        out += hdr + data
    block_align = 4 * ch + (spb - 1) // 2 * ch
    wav = _make_wav_raw(out, rate, 0x11, ch, 4, block_align, n_frames=n)
    return wav, chain[:n]


def test_decode_wav_ima_adpcm():
    """Block-vectorized IMA ADPCM decode reproduces the scalar spec
    chain bit-exactly, mono and stereo, with fact-chunk truncation of
    the padded final block."""
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_wav

    rng = np.random.default_rng(7)
    t = np.arange(700)
    mono = (
        12000 * np.sin(2 * np.pi * t / 37) + rng.integers(-500, 500, t.size)
    ).astype(np.int64).reshape(-1, 1)
    stereo = np.hstack([mono, np.clip(-mono * 2, -32768, 32767)])
    for sig, spb in ((mono, 505), (stereo, 249), (mono, 9)):
        wav, chain = _ima_encode_wav(sig, 11025, spb)
        got, rate = decode_wav(wav)
        assert rate == 11025 and got.shape == sig.shape, spb
        got_i16 = np.rint(got * 32768.0).astype(np.int64)
        assert np.array_equal(got_i16, chain), spb
        # the lossy codec still tracks the signal once the step index
        # has adapted (idx starts at 0 -> the first ~2 periods are an
        # attack transient chasing a 12000-amplitude sine)
        assert np.abs(got_i16 - sig)[100:].max() < 4000, spb


def _bmff_box(typ, body):
    import struct

    return struct.pack(">I", len(body) + 8) + typ + body


def _make_mjpeg_mp4(frames, co64=False, fixed_size=False, moov_first=False,
                    chunk_gap=3, stz2_bits=None):
    """Minimal ISO BMFF file: ftyp + mdat holding the frame payloads
    (split into two chunks with junk padding between) + moov with an
    audio trak (must be skipped) and a video trak whose stbl indexes the
    payloads. fixed_size exercises the stsz fixed-size path (requires
    equal-length frames); co64 the 64-bit chunk-offset table."""
    import struct

    import numpy as np

    ftyp = _bmff_box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
    # two chunks: first ceil(n/2) samples contiguous, junk, then the rest
    n = len(frames)
    n1 = (n + 1) // 2
    mdat_body = b""
    chunk_off = [None, None]
    sizes = [len(f) for f in frames]
    chunk_off[0] = 0
    for f in frames[:n1]:
        mdat_body += f
    mdat_body += b"\xde\xad" * chunk_gap
    chunk_off[1] = len(mdat_body)
    for f in frames[n1:]:
        mdat_body += f
    mdat = _bmff_box(b"mdat", mdat_body)

    def hdlr(kind):
        return _bmff_box(b"hdlr", b"\x00\x00\x00\x00\x00\x00\x00\x00" + kind
                         + b"\x00" * 12)

    def stbl(base):
        offs = [base + chunk_off[0], base + chunk_off[1]]
        if stz2_bits is not None:
            body = struct.pack(">I", 0) + b"\x00\x00\x00" + bytes([stz2_bits])
            body += struct.pack(">I", n)
            if stz2_bits == 4:
                packed = bytearray()
                padded = sizes + [0] * (len(sizes) & 1)
                for a, b in zip(padded[0::2], padded[1::2]):
                    packed.append((a << 4) | b)
                body += bytes(packed)
            else:
                dt = ">u2" if stz2_bits == 16 else "u1"
                body += np.array(sizes, dtype=dt).tobytes()
            stsz = _bmff_box(b"stz2", body)
        elif fixed_size:
            assert len(set(sizes)) == 1
            stsz = _bmff_box(b"stsz", struct.pack(">III", 0, sizes[0], n))
        else:
            stsz = _bmff_box(
                b"stsz",
                struct.pack(">III", 0, 0, n)
                + np.array(sizes, dtype=">u4").tobytes(),
            )
        stsc = _bmff_box(
            b"stsc",
            struct.pack(">II", 0, 2)
            + struct.pack(">III", 1, n1, 1)      # chunk 1: n1 samples
            + struct.pack(">III", 2, n - n1, 1),  # chunk 2+: the rest
        )
        if co64:
            sco = _bmff_box(b"co64", struct.pack(">II", 0, 2)
                            + np.array(offs, dtype=">u8").tobytes())
        else:
            sco = _bmff_box(b"stco", struct.pack(">II", 0, 2)
                            + np.array(offs, dtype=">u4").tobytes())
        return _bmff_box(b"stbl", stsz + stsc + sco)

    def moov(base):
        audio_trak = _bmff_box(
            b"trak", _bmff_box(b"mdia", hdlr(b"soun"))
        )
        video_trak = _bmff_box(
            b"trak",
            _bmff_box(b"mdia", hdlr(b"vide")
                      + _bmff_box(b"minf", stbl(base))),
        )
        return _bmff_box(b"moov", audio_trak + video_trak)

    if moov_first:
        base = len(ftyp) + len(moov(0)) + 8  # moov size is offset-free
        return ftyp + moov(base) + mdat
    base = len(ftyp) + 8
    return ftyp + mdat + moov(base)


def test_mp4_frame_extraction():
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import (
        _mp4_frames,
        container_frames,
    )

    rng = np.random.default_rng(5)
    frames = [bytes(rng.integers(0, 256, 30 + 7 * i, dtype=np.uint8))
              for i in range(5)]
    assert _mp4_frames(_make_mjpeg_mp4(frames)) == frames
    assert _mp4_frames(_make_mjpeg_mp4(frames, co64=True)) == frames
    assert _mp4_frames(_make_mjpeg_mp4(frames, moov_first=True)) == frames
    same = [frames[0]] * 4
    assert _mp4_frames(_make_mjpeg_mp4(same, fixed_size=True)) == same
    # compact stz2 size tables at 16, 8 and 4-bit field widths
    assert _mp4_frames(_make_mjpeg_mp4(frames, stz2_bits=16)) == frames
    small = [f[:9] for f in frames]
    assert _mp4_frames(_make_mjpeg_mp4(small, stz2_bits=8)) == small
    tiny = [f[:3 + i % 8] for i, f in enumerate(frames)]
    assert _mp4_frames(_make_mjpeg_mp4(tiny, stz2_bits=4)) == tiny
    # dispatcher picks the BMFF path for mp4 bytes and AVI for RIFF
    assert container_frames(_make_mjpeg_mp4(frames)) == frames
    assert container_frames(_make_mjpeg_avi(frames)) == frames
    with _pytest.raises(ValueError, match="moov"):
        _mp4_frames(_bmff_box(b"ftyp", b"mp42") + _bmff_box(b"mdat", b"xx"))
    with _pytest.raises(ValueError, match="video track"):
        _mp4_frames(
            _bmff_box(b"ftyp", b"mp42")
            + _bmff_box(b"moov", _bmff_box(b"trak", b""))
        )


# --------------------------------------------- r6c progressive JPEG encoders


def _jpeg_coefs(img, quant=1, subsample=(1, 1)):
    """Quantized ZIGZAG-order coefficient grids — one (bh, bw, 64) int
    array per component — via the same pad/subsample/DCT/quant pipeline
    as _jpeg_encode, so scripted encoders produce byte-different files
    with IDENTICAL coefficients (decodes must match pixel-exact)."""
    import numpy as np

    T = _jpeg_dct_T()
    gray = img.ndim == 2
    hs, vs = (1, 1) if gray else subsample
    h, w = img.shape[:2]
    if gray:
        planes = [_jpeg_pad(img.astype(np.float64), 8, 8)]
        comp_geom = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [
            _jpeg_pad(y, 8 * vs, 8 * hs),
            _block_avg(_jpeg_pad(cb, 8 * vs, 8 * hs), vs, hs),
            _block_avg(_jpeg_pad(cr, 8 * vs, 8 * hs), vs, hs),
        ]
        comp_geom = [(hs, vs), (1, 1), (1, 1)]
    out = []
    for p in planes:
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        q = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                # EXACT expression order of _jpeg_encode.encode_block —
                # a batched einsum rounds differently on rint near-ties
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                d = T @ (blk - 128.0) @ T.T
                q[by, bx] = np.rint(d / quant).astype(np.int64).ravel()
        out.append(q[:, :, _JZZ])  # natural -> zigzag order
    return out, comp_geom, (h, w)


def _jpeg_headers(shape, comp_geom, quant, sof_marker):
    """SOI + DQT + SOF + DHT prefix shared by the scripted encoders."""
    import struct as s

    import numpy as np

    def seg(marker, body):
        return b"\xff" + bytes([marker]) + s.pack(">H", len(body) + 2) + body

    h, w = shape
    qtab = np.full(64, quant, dtype=np.int64)
    zzq = bytes(int(qtab[i]) for i in range(64))
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + zzq + bytes([0x01]) + zzq)
    ncomp = len(comp_geom)
    sof = s.pack(">BHHB", 8, h, w, ncomp)
    for ci, (chs, cvs) in enumerate(comp_geom):
        sof += bytes([ci + 1, (chs << 4) | cvs, 0 if ci == 0 else 1])
    out += seg(sof_marker, sof)
    dc_bits, _, ac_bits, _ = _jpeg_tables()
    for cls, tid, bits in ((0, 0, dc_bits), (1, 0, ac_bits),
                           (0, 1, dc_bits), (1, 1, ac_bits)):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(range(sum(bits))))
    return out, seg


def _nb_dims(comp_geom, h, w):
    """Non-interleaved block-grid dims per component (ceil of the
    component extent / 8 — NOT the MCU-padded grid)."""
    hmax = max(g[0] for g in comp_geom)
    vmax = max(g[1] for g in comp_geom)
    dims = []
    for chs, cvs in comp_geom:
        cw = -(-(w * chs) // hmax)
        ch = -(-(h * cvs) // vmax)
        dims.append((-(-ch // 8), -(-cw // 8)))
    return dims


def _jpeg_encode_multiscan(img, quant=1, subsample=(1, 1)):
    zz, comp_geom, shape = _jpeg_coefs(img, quant, subsample)
    return _jpeg_multiscan_bytes(zz, comp_geom, shape, quant)


def _jpeg_multiscan_bytes(zz, comp_geom, shape, quant):
    """Sequential SOF0 with one full-band non-interleaved SOS per
    component — the multi-scan layout some encoders emit for 4:2:0.
    Takes zigzag coefficient grids directly so tests can hand-craft
    coefficient patterns."""
    import struct as s

    h, w = shape
    out, seg = _jpeg_headers((h, w), comp_geom, quant, 0xC0)
    dc_bits, dc_map, ac_bits, ac_map = _jpeg_tables()
    dims = _nb_dims(comp_geom, h, w)
    for ci in range(len(comp_geom)):
        tid = 0 if ci == 0 else 1
        out += seg(0xDA, bytes([1, ci + 1, (tid << 4) | tid, 0, 63, 0]))
        bw = _JpegBW()
        pred = 0
        hb, wb = dims[ci]
        for by in range(hb):
            for bx in range(wb):
                blk = zz[ci][by, bx]
                diff = int(blk[0]) - pred
                pred = int(blk[0])
                cat = abs(diff).bit_length()
                length, code = dc_map[cat]
                bw.put(code, length)
                if cat:
                    bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
                k, run = 1, 0
                last = max([i for i in range(1, 64) if blk[i]] or [0])
                while k <= last:
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        k += 1
                        continue
                    while run > 15:
                        length, code = ac_map[0xF0]
                        bw.put(code, length)
                        run -= 16
                    cat = abs(v).bit_length()
                    length, code = ac_map[(run << 4) | cat]
                    bw.put(code, length)
                    bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
                    run = 0
                    k += 1
                if last < 63:
                    length, code = ac_map[0x00]
                    bw.put(code, length)
        bw.flush()
        out += bytes(bw.out)
    assert s.calcsize(">H") == 2
    return out + b"\xff\xd9"


class _ProgAcWriter:
    """Scan-level EOB-run + buffered-correction-bit state for one
    progressive AC scan (the jcphuff.c encode_mcu_AC_first/refine
    bookkeeping, per-block methods)."""

    stats = None  # set to a dict by tests to record emitted symbol paths

    def __init__(self, bw, ac_map):
        self.bw, self.ac_map = bw, ac_map
        self.eobrun = 0
        self.bits = []  # correction bits riding the next EOBn

    def sym(self, s):
        if _ProgAcWriter.stats is not None:
            key = ("zrl" if s == 0xF0
                   else f"eob{s >> 4}" if (s & 15) == 0
                   else "coef")
            _ProgAcWriter.stats[key] = _ProgAcWriter.stats.get(key, 0) + 1
        length, code = self.ac_map[s]
        self.bw.put(code, length)

    def flush_eob(self):
        while self.eobrun > 0:
            run = min(self.eobrun, 32767)
            r = run.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.put(run - (1 << r), r)
            self.eobrun -= run
        for b in self.bits:
            self.bw.put(b, 1)
        self.bits = []

    def block_first(self, band_vals):
        """First AC scan of a band: band_vals are the point-transformed
        (sign-preserving abs>>Al) values in zigzag order."""
        r = 0
        any_emitted = False
        for v in band_vals:
            v = int(v)
            if v == 0:
                r += 1
                continue
            self.flush_eob()
            while r > 15:
                self.sym(0xF0)
                r -= 16
            cat = abs(v).bit_length()
            self.sym((r << 4) | cat)
            self.bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
            r = 0
            any_emitted = True
        if r > 0 or not any_emitted:
            self.eobrun += 1

    def block_refine(self, band_vals, al):
        """Refinement scan: band_vals are abs>>al with sign (one more
        bit of precision than the previous scan at ah=al+1)."""
        temps = [abs(int(v)) >> al for v in band_vals]
        signs = [int(v) < 0 for v in band_vals]
        news = [i for i, t in enumerate(temps) if t == 1]
        last_new = news[-1] if news else -1
        r = 0
        br = []
        for i, t in enumerate(temps):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= last_new:  # ZRLs past EOB fold into it
                self.flush_eob()
                self.sym(0xF0)
                r -= 16
                for b in br:
                    self.bw.put(b, 1)
                br = []
            if t > 1:  # already nonzero at the previous precision
                br.append(t & 1)
                continue
            self.flush_eob()
            self.sym((r << 4) | 1)
            self.bw.put(0 if signs[i] else 1, 1)
            for b in br:
                self.bw.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.bits.extend(br)


def _jpeg_encode_progressive(img, quant=1, subsample=(1, 1)):
    zz, comp_geom, shape = _jpeg_coefs(img, quant, subsample)
    return _jpeg_progressive_bytes(zz, comp_geom, shape, quant)


def _jpeg_progressive_bytes(zz, comp_geom, shape, quant):
    """Progressive SOF2: interleaved DC first at Al=1 + DC refine, then
    per-component AC bands 1-5 / 6-63 first at Al=1, then refined to
    Al=0 — exercises spectral selection, successive approximation,
    cross-block EOB runs, refinement ZRL and buffered correction bits.
    Takes zigzag coefficient grids directly."""
    h, w = shape
    out, seg = _jpeg_headers((h, w), comp_geom, quant, 0xC2)
    _, dc_map, _, ac_map = _jpeg_tables()
    dims = _nb_dims(comp_geom, h, w)
    hmax = max(g[0] for g in comp_geom)
    vmax = max(g[1] for g in comp_geom)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    ncomp = len(comp_geom)

    def mcu_blocks():
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (chs, cvs) in enumerate(comp_geom):
                for by in range(cvs):
                    for bx in range(chs):
                        yield ci, my * cvs + by, mx * chs + bx

    # scan 1: DC first, interleaved, Al=1 (diffs of arithmetic-shifted DC)
    sos = bytes([ncomp]) + b"".join(
        bytes([ci + 1, 0 if ci == 0 else 0x11]) for ci in range(ncomp)
    )
    out += seg(0xDA, sos + bytes([0, 0, 1]))
    bw = _JpegBW()
    pred = [0] * ncomp
    for ci, by, bx in mcu_blocks():
        val = int(zz[ci][by, bx, 0]) >> 1
        diff = val - pred[ci]
        pred[ci] = val
        cat = abs(diff).bit_length()
        length, code = dc_map[cat]
        bw.put(code, length)
        if cat:
            bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    bw.flush()
    out += bytes(bw.out)

    # per-component AC first scans at Al=1, two spectral bands
    bands = ((1, 5), (6, 63))
    for ss, se in bands:
        for ci in range(ncomp):
            tid = 0 if ci == 0 else 1
            out += seg(0xDA, bytes([1, ci + 1, tid, ss, se, 1]))
            bw = _JpegBW()
            wr = _ProgAcWriter(bw, ac_map)
            hb, wb = dims[ci]
            for by in range(hb):
                for bx in range(wb):
                    blk = zz[ci][by, bx]
                    vals = [
                        (abs(int(v)) >> 1) * (-1 if v < 0 else 1)
                        for v in blk[ss : se + 1]
                    ]
                    wr.block_first(vals)
            wr.flush_eob()
            bw.flush()
            out += bytes(bw.out)

    # scan: DC refine to Al=0 (one raw bit per block, interleaved)
    out += seg(0xDA, sos + bytes([0, 0, 0x10]))
    bw = _JpegBW()
    for ci, by, bx in mcu_blocks():
        bw.put(int(zz[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bytes(bw.out)

    # per-component AC refine scans to Al=0
    for ss, se in bands:
        for ci in range(ncomp):
            tid = 0 if ci == 0 else 1
            out += seg(0xDA, bytes([1, ci + 1, tid, ss, se, 0x10]))
            bw = _JpegBW()
            wr = _ProgAcWriter(bw, ac_map)
            hb, wb = dims[ci]
            for by in range(hb):
                for bx in range(wb):
                    wr.block_refine(zz[ci][by, bx, ss : se + 1], 0)
            wr.flush_eob()
            bw.flush()
            out += bytes(bw.out)
    return out + b"\xff\xd9"


def test_decode_jpeg_multiscan_sequential():
    """Non-interleaved multi-scan SOF0 decodes identically to the
    interleaved single-scan encoding of the same coefficients."""
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(41)
    for shape, sub in (((16, 24, 3), (1, 1)), ((20, 28, 3), (2, 2)),
                       ((12, 12), (1, 1))):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        inter = decode_image(_jpeg_encode(img, quant=1, subsample=sub))
        multi = decode_image(_jpeg_encode_multiscan(img, quant=1, subsample=sub))
        assert np.array_equal(inter, multi), (shape, sub)


def test_decode_jpeg_progressive():
    """Progressive decode == sequential decode of the same quantized
    coefficients, pixel-exact, over gray/4:4:4/4:2:0, smooth (EOBRUN-
    heavy) and noisy (ZRL/correction-heavy) content."""
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(43)
    smooth = np.clip(
        np.add.outer(np.arange(24) * 3, np.arange(32) * 2), 0, 255
    ).astype(np.uint8)
    noisy_gray = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    color = rng.integers(0, 256, size=(20, 28, 3), dtype=np.uint8)
    cases = [
        (smooth, (1, 1), 1), (smooth, (1, 1), 8),
        (noisy_gray, (1, 1), 1),
        (color, (1, 1), 1), (color, (2, 2), 1), (color, (2, 2), 8),
        (color[:6, :10], (2, 2), 1),  # odd dims: padded blocks + crop
    ]
    for img, sub, q in cases:
        base = decode_image(_jpeg_encode(img, quant=q, subsample=sub))
        prog = decode_image(_jpeg_encode_progressive(img, quant=q, subsample=sub))
        assert np.array_equal(base, prog), (img.shape, sub, q)


def test_decode_jpeg_progressive_handcrafted_paths():
    """Hand-built coefficient grids forcing the rare entropy paths:
    first-pass ZRL, refinement ZRL with correction bits buffered across
    it, cross-block EOB runs with riding bits, and DC refine parity —
    the symbol-level stats assert each path actually fired, and the
    decode must equal the sequential decode of the same grids."""
    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_image

    zz = np.zeros((1, 8, 64), dtype=np.int64)
    zz[0, 0, 0] = 37           # odd DC: refine bit 1
    zz[0, 0, [1, 3, 5]] = [4, -3, 1]
    zz[0, 0, 41] = 1           # 35 zero-history coefs before it in 6-63:
    zz[0, 0, 60] = -1          # refine ZRLs + another new coef after
    zz[0, 2, 0] = -6           # even DC: refine bit 0
    zz[0, 2, 30] = 5           # first-scan ZRL (24 zeros) + refine
    zz[0, 2, 50] = 1           # correction bit buffered ACROSS a ZRL
    zz[0, 3, 10] = -2          # refine correction only
    zz[0, 7, 0] = -1           # DC-only far block: long AC EOB runs
    zz[0, 7, 63] = 3           # band ends exactly at Se (no trailing EOB)
    comp_geom = [(1, 1)]
    shape = (8, 64)

    seq = decode_image(_jpeg_multiscan_bytes([zz], comp_geom, shape, 1))
    _ProgAcWriter.stats = stats = {}
    try:
        prog_bytes = _jpeg_progressive_bytes([zz], comp_geom, shape, 1)
    finally:
        _ProgAcWriter.stats = None
    prog = decode_image(prog_bytes)
    assert np.array_equal(seq, prog)
    assert stats.get("zrl", 0) >= 4, stats  # first-pass AND refine ZRLs
    assert stats.get("eob1", 0) + stats.get("eob2", 0) >= 2, stats  # runs > 1
    assert stats.get("coef", 0) >= 6, stats


def test_decode_wav_ms_adpcm_random_blocks():
    """MS ADPCM: the block-vectorized decoder equals a scalar
    spec-reference decoder on RANDOM block bytes (random predictors,
    deltas, headers and codes exercise clamping and delta adaptation),
    mono and stereo, custom coef tables, fact truncation."""
    import struct

    import numpy as np

    from searchenginer_spark.functions.multimodal import decode_wav

    adapt = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409,
             307, 230, 230, 230]
    std_coefs = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
                 (460, -208), (392, -232)]

    def scalar_decode(raw, nch, ba, coefs):
        out = []
        for b0 in range(0, len(raw) - len(raw) % ba, ba):
            blk = raw[b0 : b0 + ba]
            pred = [min(blk[c], len(coefs) - 1) for c in range(nch)]
            c1 = [coefs[p][0] for p in pred]
            c2 = [coefs[p][1] for p in pred]
            delta = list(struct.unpack_from(f"<{nch}h", blk, nch))
            samp1 = list(struct.unpack_from(f"<{nch}h", blk, 3 * nch))
            samp2 = list(struct.unpack_from(f"<{nch}h", blk, 5 * nch))
            rows = [tuple(samp2), tuple(samp1)]
            nibs = []
            for byte in blk[7 * nch :]:
                nibs.append(byte >> 4)
                nibs.append(byte & 0x0F)
            nibs = nibs[: len(nibs) - len(nibs) % nch]
            for i in range(0, len(nibs), nch):
                row = []
                for c in range(nch):
                    n = nibs[i + c]
                    signed = n - 16 if n >= 8 else n
                    t = samp1[c] * c1[c] + samp2[c] * c2[c]
                    p = int(t / 256)  # C division: toward zero (MS ref)
                    s = max(-32768, min(32767, p + signed * delta[c]))
                    delta[c] = max(16, (adapt[n] * delta[c]) >> 8)
                    samp2[c], samp1[c] = samp1[c], s
                    row.append(s)
                rows.append(tuple(row))
            out.extend(rows)
        return np.array(out, dtype=np.int64)

    rng = np.random.default_rng(11)
    custom = [(300, -50), (100, 10)]
    for nch, ba, nblocks, coefs, use_fact in (
        (1, 32, 5, std_coefs, False),
        (2, 38, 4, std_coefs, True),
        (1, 15, 3, custom, False),
    ):
        raw = bytes(rng.integers(0, 256, size=nblocks * ba, dtype=np.uint8))
        want = scalar_decode(raw, nch, ba, coefs)
        spb = (ba - 7 * nch) * 2 // nch + 2
        n_frames = nblocks * spb - 3 if use_fact else None
        # hand-built fmt chunk with the MS ADPCM coef extension
        ext = struct.pack("<HH", spb, len(coefs))
        for a, b in coefs:
            ext += struct.pack("<hh", a, b)
        fmtc = struct.pack("<HHIIHHH", 2, nch, 8000, 8000 * ba, ba, 4,
                           len(ext)) + ext
        fact = (b"fact" + struct.pack("<II", 4, n_frames)
                if n_frames is not None else b"")
        payload = (b"fmt " + struct.pack("<I", len(fmtc)) + fmtc + fact
                   + b"data" + struct.pack("<I", len(raw)) + raw
                   + (b"\x00" if len(raw) & 1 else b""))
        wav = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload
        got, rate = decode_wav(wav)
        assert rate == 8000
        if n_frames is not None:
            want = want[:n_frames]
        assert got.shape == want.shape, (nch, ba)
        got_i16 = np.rint(got * 32768.0).astype(np.int64)
        assert np.array_equal(got_i16, want), (nch, ba)


# ------------------------------------------------------------ r6c matroska


def _ebml_encode_vint(val, style="size", length=None):
    """Encode an EBML vint. style='size' adds the marker bit; style='id'
    expects val to already carry it (emitted as-is, big-endian)."""
    if style == "id":
        out = val.to_bytes((val.bit_length() + 7) // 8, "big")
        return out
    if length is None:
        length = 1
        while val >= (1 << (7 * length)) - 1:
            length += 1
    return ((1 << (7 * length)) | val).to_bytes(length, "big")


def _ebml_el(eid, body):
    return (_ebml_encode_vint(eid, "id") + _ebml_encode_vint(len(body))
            + body)


def _make_mkv(video_frames, lacing_plan):
    """Minimal Matroska: EBML header, Segment with Tracks (audio track 2
    first — must be skipped — then video track 1) and one Cluster per
    lacing_plan entry. Each entry is (mode, count): mode in none/xiph/
    fixed/ebml; count frames are drawn from video_frames in order. An
    audio SimpleBlock rides in each cluster and must be ignored."""
    import struct

    frames = list(video_frames)
    header = _ebml_el(0x1A45DFA3, _ebml_el(0x4282, b"matroska"))

    def track_entry(num, ttype):
        return _ebml_el(
            0xAE,
            _ebml_el(0xD7, bytes([num])) + _ebml_el(0x83, bytes([ttype]))
            + _ebml_el(0x86, b"V_MJPEG" if ttype == 1 else b"A_PCM"),
        )

    tracks = _ebml_el(0x1654AE6B, track_entry(2, 2) + track_entry(1, 1))
    clusters = b""
    at = 0
    for mode, n in lacing_plan:
        fs = frames[at : at + n]
        at += n
        body = _ebml_encode_vint(1) + struct.pack(">h", 0)
        if mode == "none":
            assert n == 1
            body += bytes([0x00]) + fs[0]
        elif mode == "xiph":
            body += bytes([0x02, n - 1])
            for f in fs[:-1]:
                s = len(f)
                while s >= 255:
                    body += bytes([255])
                    s -= 255
                body += bytes([s])
            body += b"".join(fs)
        elif mode == "fixed":
            assert len({len(f) for f in fs}) == 1
            body += bytes([0x04, n - 1]) + b"".join(fs)
        else:  # ebml lacing: first absolute, then signed deltas; a
            body += bytes([0x06, n - 1])  # 1-frame lace has NO sizes
            if n > 1:
                body += _ebml_encode_vint(len(fs[0]))
                prev = len(fs[0])
                for f in fs[1:-1]:
                    delta = len(f) - prev
                    prev = len(f)
                    # 2-byte signed vint: raw = delta + (2^13 - 1)
                    body += _ebml_encode_vint(delta + (1 << 13) - 1, length=2)
            body += b"".join(fs)
        sblock = _ebml_el(0xA3, body)
        audio = _ebml_el(
            0xA3, _ebml_encode_vint(2) + struct.pack(">h", 0) + b"\x00junk"
        )
        # wrap every other cluster's video block in a BlockGroup>Block
        if (at // max(n, 1)) % 2 == 0:
            sblock = _ebml_el(0xA0, _ebml_el(0xA1, body))
        cluster = _ebml_el(
            0x1F43B675, _ebml_el(0xE7, b"\x00") + audio + sblock
        )
        clusters += cluster
    segment = _ebml_el(0x18538067, tracks + clusters)
    assert at == len(frames)
    return header + segment


def test_mkv_frame_extraction():
    import numpy as np
    import pytest as _pytest

    from searchenginer_spark.functions.multimodal import (
        _mkv_frames,
        container_frames,
    )

    rng = np.random.default_rng(13)
    frames = [bytes(rng.integers(0, 256, size=s, dtype=np.uint8))
              for s in (300, 20, 33, 27, 40, 40, 40, 25, 31, 60, 17)]
    # the trailing single-frame EBML lace carries NO size fields (spec:
    # sizes are coded for n-1 / n-2 frames only) — regression for the
    # vint-eats-frame-bytes bug
    plan = [("none", 1), ("xiph", 3), ("fixed", 3), ("ebml", 3), ("ebml", 1)]
    mkv = _make_mkv(frames, plan)
    assert _mkv_frames(mkv) == frames
    assert container_frames(mkv) == frames
    # a segment with no Tracks (webm shares the machinery) is an error
    with _pytest.raises(ValueError, match="video track"):
        _mkv_frames(_ebml_el(0x1A45DFA3, b"") + _ebml_el(0x18538067, b""))


def test_decode_jpeg_progressive_property():
    """Property (hypothesis): for random shapes, content, quant and
    subsampling, the progressive and multi-scan-sequential encodings of
    the SAME quantized coefficients decode pixel-identically to the
    interleaved baseline encoding — the scan machinery (spectral bands,
    successive approximation, EOB runs, refinement) is lossless
    relative to the coefficient store."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchenginer_spark.functions.multimodal import decode_image

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 18),
        gray=st.booleans(),
        quant=st.sampled_from([1, 3, 8, 16]),
        sub=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
        smooth=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(w, h, gray, quant, sub, smooth, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        if smooth:  # gradient content: EOB-run-heavy coefficient grids
            base = np.add.outer(np.arange(h) * 5, np.arange(w) * 3) % 256
            img = (base[..., None] if not gray else base).astype(np.uint8)
            img = np.broadcast_to(img, shape).copy()
        else:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        sub = (1, 1) if gray else sub
        base_dec = decode_image(_jpeg_encode(img, quant=quant, subsample=sub))
        prog = decode_image(
            _jpeg_encode_progressive(img, quant=quant, subsample=sub)
        )
        multi = decode_image(
            _jpeg_encode_multiscan(img, quant=quant, subsample=sub)
        )
        assert np.array_equal(base_dec, prog)
        assert np.array_equal(base_dec, multi)

    run()
