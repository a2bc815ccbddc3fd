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
    """Outside the implemented envelope (8-bit RGB/RGBA, no interlace)
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

    # 16-bit depth: honest NotImplementedError
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bad)
    with pytest.raises(ValueError):
        decode_png_pixels(b"not a png at all")
