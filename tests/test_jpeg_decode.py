"""JPEG pixel decode (functions.multimodal): real Huffman entropy
decode, DC prediction, restart markers, dequant, vectorized IDCT,
level shift, 4:4:4 color conversion, chroma-subsampled 4:2:0/4:2:2
layouts, and progressive (SOF2) multi-scan reconstruction —
stdlib+numpy.

The pinned fixtures below are byte literals generated once and checked
against an INDEPENDENT pure-python naive IDCT (direct double-loop over
the T.81 basis definition, no numpy, no shared code with the decoder's
einsum path) — so a symmetric encoder/decoder bug in the vectorized
pipeline cannot round-trip invisibly.
"""

import math

import pytest

from grebi_spark.functions.multimodal import (
    build_jpeg_image,
    build_jpeg_image_420,
    build_jpeg_image_progressive,
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


# 24×32 4:2:0 (luma 2×2, chroma 1×1): build_jpeg_image_420(7) pinned —
# 4 MCUs with DRI=2 (a real RST0 between MCU pairs), separate Annex K
# chroma quant/Huffman tables (two tables per DQT/DHT segment), and a
# padded luma column (24 not a multiple of 16) the decoder must crop.
# Expected stats verified against an INDEPENDENT per-pixel closed-form
# computation (no decoder/encoder code): sum 205568, min 0, max 201.
_COLOR_420_JPEG = bytes.fromhex(
    "ffd8ffe000104a46494600010200004800480000ffdb008400080b0c0e0c0a10"
    "0e0d0e1211101318281a181616183123251d283a333d3c3933383740485c4e40"
    "4457453738506d51575f626768673e4d71797064785c65676301081212181518"
    "2f1a1a2f63423842636363636363636363636363636363636363636363636363"
    "6363636363636363636363636363636363636363636363636363ffc000110800"
    "20001803012200021101031101ffc401a2000001050101010101010000000000"
    "0000000102030405060708090a0b100002010303020403050504040000017d01"
    "020300041105122131410613516107227114328191a1082342b1c11552d1f024"
    "33627282090a161718191a25262728292a3435363738393a434445464748494a"
    "535455565758595a636465666768696a737475767778797a838485868788898a"
    "92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6"
    "c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9"
    "fa0100030101010101010101010000000000000102030405060708090a0b1100"
    "0201020404030407050404000102770001020311040521310612415107617113"
    "22328108144291a1b1c109233352f0156272d10a162434e125f11718191a2627"
    "28292a35363738393a434445464748494a535455565758595a63646566676869"
    "6a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6"
    "a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2"
    "e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffdd00040002ffda000c0301000211"
    "0311003f00f02ab7562add7d09fa595e8ad3a2b52cffd0f28ab7562add7d61fa"
    "915e8ad3a2b52cffd9"
)

# 16×8 4:2:2 (luma 2×1, chroma 1×1) hand-built — a layout the corpus
# encoder never emits, so the decoder's generic h×v MCU walk is pinned
# independently of it: one MCU of two Y blocks (left 200, right 60) +
# Cb=100 + Cr=50. T.871 conversion gives left half RGB (91, 255, 150)
# (G clamps at 255) and right half (0, 125, 10) (R clamps at 0).
_COLOR_422_JPEG = bytes.fromhex(
    "ffd8ffe000104a46494600010200004800480000ffdb004300080b0c0e0c0a10"
    "0e0d0e1211101318281a181616183123251d283a333d3c3933383740485c4e40"
    "4457453738506d51575f626768673e4d71797064785c656763ffc00011080008"
    "001003012100021100031100ffc400d200000105010101010101000000000000"
    "00000102030405060708090a0b100002010303020403050504040000017d0102"
    "0300041105122131410613516107227114328191a1082342b1c11552d1f02433"
    "627282090a161718191a25262728292a3435363738393a434445464748494a53"
    "5455565758595a636465666768696a737475767778797a838485868788898a92"
    "939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7"
    "c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"
    "ffda000c03010002000300003f00f48af9ceb0ebcc6bffd9"
)


def _expected_420(d: int) -> dict:
    """Independent per-pixel brute force of the 4:2:0 closed form —
    shares NO code with the builder or the decoder (integer closed
    forms + T.871 floats, scalar math module, no numpy)."""
    w, h = 8 * (2 + d % 3), 8 * (2 + (d * 2) % 3)
    samples = []
    for y in range(h):
        for x in range(w):
            yv = (d * 37 + (y // 8) * 19 + (x // 8) * 11) % 256
            cb = (d * 23 + (y // 16) * 11 + (x // 16) * 5) % 256
            cr = (d * 29 + (y // 16) * 7 + (x // 16) * 3) % 256
            samples.append(
                min(255, max(0, math.floor(yv + 1.402 * (cr - 128.0) + 0.5)))
            )
            samples.append(
                min(255, max(0, math.floor(
                    yv - 0.344136 * (cb - 128.0)
                    - 0.714136 * (cr - 128.0) + 0.5
                )))
            )
            samples.append(
                min(255, max(0, math.floor(yv + 1.772 * (cb - 128.0) + 0.5)))
            )
    return {
        "width": w,
        "height": h,
        "pixel_sum": sum(samples),
        "pixel_min": min(samples),
        "pixel_max": max(samples),
    }


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


def test_pinned_color_420_fixture():
    """The pinned 4:2:0 bytes decode through the real subsampled path:
    chroma tables, four-Y MCUs, a restart marker, luma padding crop."""
    assert b"\xff\xd0" in _COLOR_420_JPEG  # a real RST0 is in the scan
    assert decode_jpeg_pixels(_COLOR_420_JPEG) == {
        "width": 24,
        "height": 32,
        "pixel_sum": 205568,
        "pixel_min": 0,
        "pixel_max": 201,
    }


def test_pinned_color_422_fixture():
    """Horizontal-only subsampling (a layout the corpus encoder never
    emits) pins the generic h×v walk: 64 px at (91, 255, 150) + 64 px
    at (0, 125, 10), both chroma planes upsampled ×2 in x only."""
    assert decode_jpeg_pixels(_COLOR_422_JPEG) == {
        "width": 16,
        "height": 8,
        "pixel_sum": 64 * (91 + 255 + 150) + 64 * (0 + 125 + 10),
        "pixel_min": 0,
        "pixel_max": 255,
    }


def test_builder_420_roundtrip_vs_independent_brute_force():
    """The 4:2:0 corpus builder round-trips bit-exact through the full
    subsampled pipeline for a spread of ids — odd ids carry DRI=2 with
    real RST markers (13 of these 40 have ≥3 MCUs so a RST actually
    fires mid-scan), and w=24/h=24 ids carry padded luma MCUs."""
    rst_seen = 0
    for d in range(40):
        payload = build_jpeg_image_420(d)
        if any(bytes([0xFF, 0xD0 + k]) in payload for k in range(8)):
            rst_seen += 1
        assert decode_jpeg_pixels(payload) == _expected_420(d)
    assert rst_seen >= 10


# 16×8 progressive (SOF2) with REAL nonzero ACs split across bands —
# the hard paths no DC-only corpus image reaches: six scans (DC first
# at Al=1; AC first over bands 1-5 and 6-63 at Al=1 with coded values
# mid-run, a multi-block EOB1 run AFTER a coded coefficient, and a
# custom EOBn-bearing Huffman table; AC refinement over both bands with
# correction bits for nonzero history, a newly-significant ±1 behind an
# r=15 zero run, and EOBRUN-tail corrections; DC refinement). Final
# coefficients: block 0 {DC 37, zz1 5, zz5 -3, zz20 7}, block 1 {DC
# 20, zz2 1, zz3 -4, zz21 -1}, quant all 2s. Expected stats from the
# INDEPENDENT pure-python naive IDCT: sum 17287, min 131, max 141;
# block-0 first row [139,140,140,140,139,138,137,136].
_PROG_AC_JPEG = bytes.fromhex(
    "ffd8ffe000104a46494600010200004800480000ffdb00430002020202020202"
    "0202020202020202020202020202020202020202020202020202020202020202"
    "02020202020202020202020202020202020202020202020202ffc2000b080008"
    "001001011100ffc4003800000105010101010101000000000000000001020304"
    "05060708090a0b100000000800000000000000000000000000023122e21011f1"
    "ffda0008010100000001d2afffda0008010100010501188687ffda0008010100"
    "063f014d5fffda00080101000105100da0ffda0008010100063f100b83ffda00"
    "08010100000010bfffd9"
)


def test_pinned_progressive_ac_fixture():
    """Six real progressive scans reconstruct the exact coefficients:
    successive approximation (Al=1 → refine), split spectral bands,
    EOB runs crossing block boundaries after coded values, correction
    bits, and a new significant coefficient behind an r=15 run."""
    assert decode_jpeg_pixels(_PROG_AC_JPEG) == {
        "width": 16,
        "height": 8,
        "pixel_sum": 17287,
        "pixel_min": 131,
        "pixel_max": 141,
    }


def test_builder_progressive_matches_baseline_pixels():
    """The progressive corpus builder carries the SAME closed-form
    pixels as the baseline one (the Adam7 pattern): bit-identical
    stats for a spread of ids, incl. odd ids whose DC-first, AC-band
    and DC-refinement scans are all restart-interval-bounded."""
    rst_seen = 0
    for d in range(40):
        payload = build_jpeg_image_progressive(d)
        assert b"\xff\xc2" in payload  # really SOF2
        if any(bytes([0xFF, 0xD0 + k]) in payload for k in range(8)):
            rst_seen += 1
        assert decode_jpeg_pixels(payload) == decode_jpeg_pixels(
            build_jpeg_image(d)
        )
    assert rst_seen >= 10


def test_arithmetic_and_malformed_raise_honestly():
    p = bytearray(build_jpeg_image(4))
    # flip SOF0 → SOF10 (arithmetic sequential): find the ffc0 marker
    i = bytes(p).find(b"\xff\xc0")
    p[i + 1] = 0xCA
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(bytes(p))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x89PNG not a jpeg")
    # a non-integer upsampling ratio (luma 3×1 against chroma 2×1)
    # refuses rather than guessing — replication needs h | hmax
    q = bytearray(_COLOR_444_JPEG)
    j = bytes(q).find(b"\xff\xc0")
    q[j + 11] = 0x31  # component 1 sampling 3x1
    q[j + 14] = 0x21  # component 2 sampling 2x1
    with pytest.raises(NotImplementedError, match="non-integer"):
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
