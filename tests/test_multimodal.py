"""Multimodal plumbing: stubs raise without the fake, fakes are
deterministic, and the mapInPandas batch shapes (one-to-one features,
one-to-many frame sampling) produce exactly the expected rows."""

import hashlib

import pytest

from grebi_spark.functions.multimodal import (
    FRAME_SIZE,
    FRAME_STRIDE,
    decode_image_stub,
    extract_features,
    resize_stub,
    sample_frames,
)


def test_stubs_refuse_real_decode():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG", fake=False)
    with pytest.raises(NotImplementedError):
        resize_stub(b"\x89PNG", 8, fake=False)


def test_resize_stub_truncates_and_pads():
    assert resize_stub(b"abcdef", 4) == b"abcd"
    assert resize_stub(b"ab", 4) == b"ab\x00\x00"
    assert resize_stub(b"", 3) == b"\x00\x00\x00"


def test_extract_features_batch_shape(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNGrest"), (2, b"")], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert rows[1]["n_bytes"] == 8
    assert rows[1]["header_hex"] == "89504E47"
    assert rows[1]["content_md5"] == hashlib.md5(b"\x89PNGrest").hexdigest()
    assert rows[2]["n_bytes"] == 0


def test_sample_frames_stride_and_partial_drop(spark):
    # 3 full frames + a partial tail; stride 4 keeps only frame 0 here,
    # so use stride 2 explicitly to see sampling behaviour
    payload = bytes(range(FRAME_SIZE)) * 5 + b"tail"
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    rows = sample_frames(df, stride=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]  # partial tail dropped
    expected = hashlib.md5(bytes(range(FRAME_SIZE))).hexdigest()
    assert all(r["frame_md5"] == expected for r in rows)


def test_sample_frames_default_stride(spark):
    payload = b"x" * (FRAME_SIZE * (FRAME_STRIDE * 2 + 1))
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = sample_frames(df).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, FRAME_STRIDE, 2 * FRAME_STRIDE]


def test_png_pixel_decode_is_bit_exact_across_all_filters(spark):
    """The stdlib pixel decode must invert every PNG scanline filter
    (the fixture varies the filter per row: None/Sub/Up/Average/Paeth)
    and reproduce the closed-form pixel function exactly."""
    from grebi_spark.functions.multimodal import build_png_rgb, decode_png_pixels

    for d in (0, 1, 2, 3, 4, 37, 1001):
        s = decode_png_pixels(build_png_rgb(d))
        w, h = 4 + d % 8, 4 + (d * 3) % 8
        exp = [
            (d * 31 + y * 17 + x * 7 + c * 13) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        ]
        assert (s["width"], s["height"]) == (w, h)
        assert s["pixel_sum"] == sum(exp)
        assert (s["pixel_min"], s["pixel_max"]) == (min(exp), max(exp))


def test_png_pixel_decode_rejects_unsupported_honestly(spark):
    """Outside the implemented envelope (8-bit, the four color types)
    the decoder must still raise, not silently mis-decode."""
    import struct
    import zlib

    import pytest

    from grebi_spark.functions.multimodal import _PNG_SIG, decode_png_pixels

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # sub-byte depth (4-bit palette): honest NotImplementedError
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 3, 0, 0, 0)
    bad = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bad)
    # 16-bit palette: no such type in the spec — raises too
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    bad = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bad)
    with pytest.raises(ValueError):
        decode_png_pixels(b"not a png at all")


def test_png_pixel_decode_gray_and_palette(spark):
    """Color types 0 (grayscale) and 3 (palette) decode exactly: gray
    emits the closed-form base value per pixel; palette expands each
    index through the closed-form PLTE so the stats describe pixel
    CONTENT, not index values."""
    from grebi_spark.functions.multimodal import (
        _png_palette_entry,
        build_png_gray,
        build_png_palette,
        decode_png_pixels,
    )

    for d in (0, 1, 2, 5, 37, 1001):
        w, h = 4 + d % 8, 4 + (d * 3) % 8
        base = [
            (d * 31 + y * 17 + x * 7) % 256
            for y in range(h)
            for x in range(w)
        ]
        g = decode_png_pixels(build_png_gray(d))
        assert (g["width"], g["height"]) == (w, h)
        assert g["pixel_sum"] == sum(base)
        assert (g["pixel_min"], g["pixel_max"]) == (min(base), max(base))
        p = decode_png_pixels(build_png_palette(d))
        expanded = [v for j in base for v in _png_palette_entry(j)]
        assert p["pixel_sum"] == sum(expanded)
        assert (p["pixel_min"], p["pixel_max"]) == (
            min(expanded),
            max(expanded),
        )


def test_png_decoder_conformance_on_pinned_byte_fixtures(spark):
    """Byte-LITERAL PNGs whose filtered streams were computed BY HAND
    (the arithmetic is spelled out below), decoded against hand-summed
    expected stats. This pins decoder spec-conformance independently of
    the repo's own encoder: a symmetric encoder/decoder filter bug
    round-trips `build_png → decode_png_pixels` cleanly but cannot
    fake these fixed bytes."""
    import struct
    import zlib

    from grebi_spark.functions.multimodal import _PNG_SIG, decode_png_pixels

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # --- 2x2 RGB: row0 Sub, row1 Paeth --------------------------------
    # pixels row0 = (10,20,30)(40,50,60), row1 = (15,25,35)(45,55,65)
    # Sub row0:   f = v - left        → 10,20,30, 30,30,30
    # Paeth row1: x=0 left=ul=0 → pred=up → f = 15-10,25-20,35-30 = 5,5,5
    #             x=1 a=(15,25,35) b=(40,50,60) c=(10,20,30)
    #                 p=a+b-c=(45,55,65); |p-a|=30 |p-b|=5 |p-c|=35
    #                 → pred=b → f = 45-40,55-50,65-60 = 5,5,5
    stream = bytes([1, 10, 20, 30, 30, 30, 30, 4, 5, 5, 5, 5, 5, 5])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    s = decode_png_pixels(png)
    # sum = 10+20+30+40+50+60 + 15+25+35+45+55+65 = 450
    assert (s["width"], s["height"]) == (2, 2)
    assert (s["pixel_sum"], s["pixel_min"], s["pixel_max"]) == (450, 10, 65)

    # --- 3x2 grayscale: row0 Average, row1 None ------------------------
    # pixels row0 = 100,101,103; row1 = 7,8,9
    # Average row0 (prior row all 0):
    #   f0 = 100 - (0+0)//2   = 100
    #   f1 = 101 - (100+0)//2 = 51
    #   f2 = 103 - (101+0)//2 = 53
    stream = bytes([3, 100, 51, 53, 0, 7, 8, 9])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    s = decode_png_pixels(png)
    # sum = 100+101+103+7+8+9 = 328
    assert (s["width"], s["height"]) == (3, 2)
    assert (s["pixel_sum"], s["pixel_min"], s["pixel_max"]) == (328, 7, 103)

    # --- 2x1 palette: indices (1,0), PLTE (0,0,0),(255,10,20) ----------
    stream = bytes([0, 1, 0])  # filter None, raw indices
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([0, 0, 0, 255, 10, 20]))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    s = decode_png_pixels(png)
    # samples = 255,10,20, 0,0,0 → sum 285
    assert (s["pixel_sum"], s["pixel_min"], s["pixel_max"]) == (285, 0, 255)


def test_png_unfilter_vectorized_speedup(spark):
    """The numpy unfilter must beat the per-byte reference loop:
    None/Sub/Up rows are fully vectorized (measured ~20-45x); Average/
    Paeth are inherent left-to-right scans and stay scalar, so a
    worst-case all-five-filters-cycling image lands ~3x overall.
    Gates are set at half the quiet-machine measurements to survive a
    loaded CI box."""
    import time
    import zlib

    import numpy as np

    from grebi_spark.functions.multimodal import _paeth, _unfilter_rows

    w, h, bpp = 192, 120, 3
    rng = np.random.RandomState(11)
    raw = rng.randint(0, 256, size=(h, w * bpp), dtype=np.uint8)

    def encode(filters):
        filtered = bytearray()
        prior = bytes(w * bpp)
        for y in range(h):
            t = filters[y % len(filters)]
            filtered.append(t)
            row = raw[y].tolist()
            for i, v in enumerate(row):
                left = row[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                if t == 0:
                    f = v
                elif t == 1:
                    f = v - left
                elif t == 2:
                    f = v - up
                elif t == 3:
                    f = v - (left + up) // 2
                else:
                    f = v - _paeth(left, up, ul)
                filtered.append(f & 0xFF)
            prior = bytes(row)
        return bytes(filtered)

    def naive(data):
        stride = w * bpp
        prior = bytes(stride)
        out = []
        for y in range(h):
            t = data[y * (stride + 1)]
            row = data[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
            recon = bytearray(stride)
            for i, f in enumerate(row):
                left = recon[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                if t == 0:
                    v = f
                elif t == 1:
                    v = f + left
                elif t == 2:
                    v = f + up
                elif t == 3:
                    v = f + (left + up) // 2
                else:
                    v = f + _paeth(left, up, ul)
                recon[i] = v & 0xFF
            prior = bytes(recon)
            out.append(bytes(recon))
        return out

    def best_of_interleaved(fn_a, fn_b, reps=7):
        # alternate the two arms within each rep so a co-tenant load
        # spike inflates BOTH arms of that rep, not just one; best-of
        # then picks each arm's quietest moment independently
        best_a = best_b = float("inf")
        out_a = out_b = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out_a = fn_a()
            best_a = min(best_a, time.perf_counter() - t0)
            t0 = time.perf_counter()
            out_b = fn_b()
            best_b = min(best_b, time.perf_counter() - t0)
        return out_a, best_a, out_b, best_b

    for filters, floor in (((0, 1, 2), 10.0), ((0, 1, 2, 3, 4), 1.6)):
        data = encode(filters)
        _unfilter_rows(data, w, h, bpp)  # warm numpy dispatch/caches
        naive(data)
        fast, t_fast, ref, t_ref = best_of_interleaved(
            lambda: _unfilter_rows(data, w, h, bpp), lambda: naive(data)
        )
        assert [bytes(fast[y]) for y in range(h)] == ref
        assert (fast == raw).all()
        # best-of-3 after warmup: a loaded CI box inflates both arms
        # roughly equally; the floors sit well under the quiet-machine
        # measurements (~50x fast-path / ~2.5x all-five-filters mixed —
        # Average/Paeth are inherent scans and bound the mixed case)
        assert t_ref / t_fast >= floor, (
            f"unfilter speedup {t_ref / t_fast:.1f}x under floor "
            f"{floor}x for filters {filters}"
        )


def test_jpeg_header_parse_walks_real_segments(spark):
    """The JPEG metadata parse is a REAL ITU T.81 segment walk: SOI,
    FF-marker lengths (self-inclusive, big-endian), APP0-JFIF
    detection, and the first SOFn (baseline C0 / extended C1 /
    progressive C2) frame header. Malformed inputs degrade to the
    sentinel row, never an exception."""
    import struct

    from grebi_spark.functions.multimodal import build_jpeg, parse_jpeg_header

    for d in (0, 1, 7, 511, 1000, 99999):
        r = parse_jpeg_header(build_jpeg(d))
        assert r == {
            "width": 8 + d % 512,
            "height": 8 + (d * 5) % 384,
            "precision": 8,
            "n_components": 3,
            "is_jfif": True,
        }, (d, r)

    def seg(m, body):
        return bytes([0xFF, m]) + struct.pack(">H", len(body) + 2) + body

    # progressive (C2), grayscale, 12-bit, no JFIF — fields extracted
    prog = (
        b"\xff\xd8"
        + seg(0xC2, struct.pack(">BHHB", 12, 10, 20, 1) + bytes([1, 0x11, 0]))
        + b"\xff\xd9"
    )
    r = parse_jpeg_header(prog)
    assert (
        r["width"], r["height"], r["precision"], r["n_components"], r["is_jfif"]
    ) == (20, 10, 12, 1, False)

    # malformed: not a JPEG / truncated / no SOF before EOI
    assert parse_jpeg_header(b"nope")["width"] == -1
    assert parse_jpeg_header(b"\xff\xd8")["width"] == -1
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9")["width"] == -1


def test_adam7_interlaced_decode_matches_progressive(spark):
    """Adam7 reassembly: an interlaced PNG of the same closed-form
    pixels must decode to identical stats as the progressive one, for
    every color type."""
    from grebi_spark.functions.multimodal import _build_png, decode_png_pixels

    for d in (0, 1, 2, 3, 4, 5, 6, 7, 37, 1001):
        for ct in (0, 2, 3):
            a = decode_png_pixels(_build_png(d, ct, interlace=0))
            b = decode_png_pixels(_build_png(d, ct, interlace=1))
            assert a == b, (d, ct)


def test_adam7_pass_grid_pinned_by_hand_fixture(spark):
    """A hand-assembled 3×3 grayscale Adam7 stream pins the PASS ORDER
    and grid placement independently of the repo's own encoder (a
    symmetric pass-permutation bug in encoder+decoder would round-trip
    invisibly; these literal bytes cannot lie).

    3×3 → non-empty passes and their pixels (PNG spec §8.2 grid):
      pass 1 (x0=0,y0=0,dx=8,dy=8): (0,0)
      pass 4 (x0=2,y0=0,dx=4,dy=4): (2,0)
      pass 5 (x0=0,y0=2,dx=2,dy=4): (0,2) (2,2)
      pass 6 (x0=1,y0=0,dx=2,dy=2): (1,0) (1,2)
      pass 7 (x0=0,y0=1,dx=1,dy=2): (0,1) (1,1) (2,1)
    Image (value = 10·(y·3+x+1)):
      10  20  30
      40  50  60
      70  80  90
    Streams (filter byte + filtered bytes per scanline):
      p1: [0, 10]
      p4: [0, 30]
      p5: [0, 70, 90]            (one row, filter None)
      p6: [0, 20], [2, 80-20=60] (second row filter Up: f = v - up)
      p7: [1, 40, 50-40=10, 60-50=10]  (filter Sub: f = v - left)
    """
    import struct
    import zlib

    from grebi_spark.functions.multimodal import _PNG_SIG, decode_png_pixels

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    stream = bytes(
        [0, 10]            # pass 1
        + [0, 30]          # pass 4
        + [0, 70, 90]      # pass 5
        + [0, 20, 2, 60]   # pass 6 (rows y=0 and y=2; Up against 20)
        + [1, 40, 10, 10]  # pass 7 (row y=1; Sub)
    )
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    s = decode_png_pixels(png)
    # sum 10+20+...+90 = 450
    assert (s["width"], s["height"]) == (3, 3)
    assert (s["pixel_sum"], s["pixel_min"], s["pixel_max"]) == (450, 10, 90)


def test_png_16bit_decode_gray_and_rgb(spark):
    """Depth-16 decode: the filter unit is BYTES per pixel (spec §9.2,
    so the byte-level unfilter is unchanged), and the stats describe
    big-endian u16 SAMPLE VALUES — progressive and Adam7 both. 16-bit
    palette stays an honest raise (the spec has no such type)."""
    import pytest

    from grebi_spark.functions.multimodal import _build_png, decode_png_pixels

    for d in (0, 1, 2, 5, 37, 999):
        w, h = 4 + d % 8, 4 + (d * 3) % 8
        for ct in (0, 2):
            nch = 3 if ct == 2 else 1
            exp = [
                (d * 4099 + y * 257 + x * 31 + c * 13) % 65536
                for y in range(h)
                for x in range(w)
                for c in range(nch)
            ]
            for il in (0, 1):
                s = decode_png_pixels(_build_png(d, ct, interlace=il, depth=16))
                assert (s["width"], s["height"]) == (w, h), (d, ct, il)
                assert s["pixel_sum"] == sum(exp), (d, ct, il)
                assert (s["pixel_min"], s["pixel_max"]) == (
                    min(exp),
                    max(exp),
                ), (d, ct, il)
    with pytest.raises(NotImplementedError):
        decode_png_pixels(_build_png(3, 3, depth=16))


def test_resize_nearest_kernel_and_decode_array_shapes():
    """The resize kernel is a pure integer-coordinate gather:
    out[y, x] = in[(y*h)//oh, (x*w)//ow] — checked against a scalar
    brute force on a non-square array; identity dims return the array
    unchanged. decode_image_array sniffs containers and returns
    (h, w, C) for every corpus member kind (gray PNG C=1, RGB/palette
    C=3, gray JPEG C=1, 4:2:0 color C=3)."""
    import numpy as np

    from grebi_spark.functions.multimodal import (
        _build_png,
        build_jpeg_image,
        build_jpeg_image_420,
        build_jpeg_image_progressive,
        decode_image_array,
        resize_image_nearest,
    )

    rng = np.arange(7 * 5 * 3, dtype=np.int64).reshape(7, 5, 3) * 13 % 251
    out = resize_image_nearest(rng, 3, 4)
    for y in range(3):
        for x in range(4):
            assert (out[y, x] == rng[(y * 7) // 3, (x * 5) // 4]).all()
    assert (resize_image_nearest(rng, 7, 5) == rng).all()

    for payload, nch in (
        (_build_png(8, 0), 1),
        (_build_png(9, 2), 3),
        (_build_png(10, 3), 3),
        (build_jpeg_image(6), 1),
        (build_jpeg_image_progressive(6), 1),
        (build_jpeg_image_420(7), 3),
    ):
        arr = decode_image_array(payload)
        assert arr.ndim == 3 and arr.shape[2] == nch
    import pytest

    with pytest.raises(ValueError, match="unknown image container"):
        decode_image_array(b"RIFFxxxxWAVE")


def test_resample_pcm_2to1_kernel():
    """The 2:1 box filter is pair-mean in the u16 domain: exact on
    negatives (floor-vs-truncate skew would show at odd negative
    sums), drops a trailing unpaired sample, and empty input yields
    empty output."""
    import numpy as np

    from grebi_spark.functions.multimodal import resample_pcm_2to1

    out = resample_pcm_2to1([-5, -4, 7, 8, -1, 2, 100])
    # pairs: (-5,-4) -> u 32763+32764=65527//2=32763 -> -5 (floor mean
    # of -4.5 is -5, NOT the truncated -4); (7,8) -> 7; (-1,2) -> 0;
    # trailing 100 dropped
    assert out.tolist() == [-5, 7, 0]
    assert resample_pcm_2to1([]).tolist() == []
    assert resample_pcm_2to1([32767, 32767]).tolist() == [32767]
    assert resample_pcm_2to1([-32768, -32768]).tolist() == [-32768]
