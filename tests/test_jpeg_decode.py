"""Baseline-sequential JPEG pixel decode (functions.multimodal):
real Huffman entropy decode, DC prediction, restart markers, dequant,
vectorized IDCT, level shift, 4:4:4 color conversion — stdlib+numpy.

The pinned fixtures below are byte literals generated once and checked
against an INDEPENDENT pure-python naive IDCT (direct double-loop over
the T.81 basis definition, no numpy, no shared code with the decoder's
einsum path) — so a symmetric encoder/decoder bug in the vectorized
pipeline cannot round-trip invisibly.
"""

import pytest

from grebi_spark.functions.multimodal import (
    build_jpeg_image,
    decode_jpeg_pixels,
    parse_jpeg_header,
)

# one 8×8 grayscale block, quant table all 2s, DC=37 plus three ACs at
# zigzag positions 1, 5 and 20 (the last behind a zero RUN — exercises
# run-length AC coding); the scan happens to contain a stuffed FF 00.
# Expected stats verified against the naive IDCT: sum 8780, min 132,
# max 146; first row [135,134,133,133,135,138,142,144].
_GRAY_AC_JPEG = bytes.fromhex(
    "ffd8ffe000104a46494600010200004800480000ffdb00430002020202020202"
    "0202020202020202020202020202020202020202020202020202020202020202"
    "02020202020202020202020202020202020202020202020202ffc0000b080008"
    "000801011100ffc400d200000105010101010101000000000000000001020304"
    "05060708090a0b100002010303020403050504040000017d0102030004110512"
    "2131410613516107227114328191a1082342b1c11552d1f02433627282090a16"
    "1718191a25262728292a3435363738393a434445464748494a53545556575859"
    "5a636465666768696a737475767778797a838485868788898a92939495969798"
    "999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4"
    "d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda00080101"
    "00003f00e96c7fe3e7ff00b0afffd9"
)

# 8×8 three-component 4:4:4 (Y=200, Cb=100, Cr=50 constant planes, two
# DQT tables in one segment, interleaved MCU). T.871 conversion with
# round-half-up gives RGB (91, 255, 150) — G hits the 255 clamp.
_COLOR_444_JPEG = bytes.fromhex(
    "ffd8ffe000104a46494600010200004800480000ffdb00840008101010101010"
    "1010101010101010101010101010101010101010101010101010101010101010"
    "1010101010101010101010101010101010101010101010101001081010101010"
    "1010101010101010101010101010101010101010101010101010101010101010"
    "1010101010101010101010101010101010101010101010101010ffc000110800"
    "08000803011100021101031101ffc400d2000001050101010101010000000000"
    "0000000102030405060708090a0b100002010303020403050504040000017d01"
    "020300041105122131410613516107227114328191a1082342b1c11552d1f024"
    "33627282090a161718191a25262728292a3435363738393a434445464748494a"
    "535455565758595a636465666768696a737475767778797a838485868788898a"
    "92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6"
    "c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9"
    "faffda000c03010002000300003f00f48ac3af31afffd9"
)


def test_pinned_gray_ac_fixture():
    s = decode_jpeg_pixels(_GRAY_AC_JPEG)
    assert s == {
        "width": 8,
        "height": 8,
        "pixel_sum": 8780,
        "pixel_min": 132,
        "pixel_max": 146,
    }


def test_pinned_color_444_fixture():
    s = decode_jpeg_pixels(_COLOR_444_JPEG)
    # 64 identical RGB pixels (91, 255, 150)
    assert s == {
        "width": 8,
        "height": 8,
        "pixel_sum": 64 * (91 + 255 + 150),
        "pixel_min": 91,
        "pixel_max": 255,
    }


def test_builder_roundtrip_exact_including_restarts():
    """The closed-form corpus builder round-trips bit-exact through the
    full real pipeline for a spread of ids — odd ids carry DRI=2 with
    RST0-7 markers (predictor reset + byte-aligned resume)."""
    for d in range(40):
        s = decode_jpeg_pixels(build_jpeg_image(d))
        w, h = 8 * (1 + d % 3), 8 * (1 + (d * 2) % 3)
        vals = [
            (d * 37 + by * 19 + bx * 11) % 256
            for by in range(h // 8)
            for bx in range(w // 8)
        ]
        assert (s["width"], s["height"]) == (w, h)
        assert s["pixel_sum"] == 64 * sum(vals)
        assert (s["pixel_min"], s["pixel_max"]) == (min(vals), max(vals))


def test_progressive_and_malformed_raise_honestly():
    p = bytearray(build_jpeg_image(4))
    # flip SOF0 → SOF2 (progressive): find the ffc0 marker
    i = bytes(p).find(b"\xff\xc0")
    p[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_pixels(bytes(p))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x89PNG not a jpeg")
    # subsampled chroma refuses rather than guessing
    q = bytearray(_COLOR_444_JPEG)
    j = bytes(q).find(b"\xff\xc0")
    q[j + 11] = 0x22  # first component sampling 2x2
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg_pixels(bytes(q))


def test_header_parse_fill_bytes_and_standalone_markers():
    """Real streams pad with FF fill bytes and carry length-less
    standalone markers (TEM 0x01, RST0-7); the header walk must skip
    both instead of reading 'length' bytes out of entropy data."""
    base = build_jpeg_image(6)
    i = base.find(b"\xff\xdb")  # splice before DQT
    spliced = base[:i] + b"\xff\xff\xff\x01\xff\xd3" + base[i:]
    r = parse_jpeg_header(spliced)
    assert (r["width"], r["height"]) == (8 * (1 + 6 % 3), 8 * (1 + 12 % 3))
    assert r["precision"] == 8 and r["n_components"] == 1 and r["is_jfif"]


def test_header_parse_matches_decoder_on_scan_jpegs():
    """The header-only walk and the full decoder agree on dimensions
    for complete scan-bearing files (incl. the DRI/RST odd ids)."""
    for d in (1, 3, 7, 10):
        full = decode_jpeg_pixels(build_jpeg_image(d))
        hdr = parse_jpeg_header(build_jpeg_image(d))
        assert (hdr["width"], hdr["height"]) == (full["width"], full["height"])
