"""Baseline JPEG codec: lossless-layer exactness, bounded lossy
roundtrip, restart markers, hostile inputs, image_features routing."""

import struct

import numpy as np

from knowledgebase_processor_spark.operators.jpeg import (
    ZIGZAG, _huff_decode_table, _huff_encode_table, decode_jpeg_pixels,
    encode_jpeg)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 4) % 256, (yy * 3) % 256,
                     ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)


def test_zigzag_is_the_standard_scan():
    assert len(ZIGZAG) == 64 and sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10,
                           17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]


def test_huffman_tables_roundtrip():
    bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
    vals = list(range(162))
    enc = _huff_encode_table(bits, vals)
    dec = _huff_decode_table(bits, vals)
    assert len(enc) == 162
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym
    # prefix-free: no code is a prefix of a longer one
    codes = sorted((ln, code) for code, ln in enc.values())
    for (l1, c1) in codes:
        for (l2, c2) in codes:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1 or (l1, c1) == (l2, c2)


def test_rgb_roundtrip_bounded_error():
    img = _gradient(37, 53)
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert dec is not None
    w, h, ch, out = dec
    assert (w, h, ch) == (53, 37, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0


def test_gray_and_flat_roundtrip():
    flat = np.full((16, 16, 3), 77, np.uint8)
    d = decode_jpeg_pixels(encode_jpeg(flat))
    assert d is not None and np.abs(d[3].astype(int) - 77).max() <= 1
    gray = np.tile(np.arange(64, dtype=np.uint8) * 4, (24, 1))
    d2 = decode_jpeg_pixels(encode_jpeg(gray))
    assert d2 is not None and d2[:3] == (64, 24, 1)
    assert np.abs(d2[3][:, :, 0].astype(int) - gray.astype(int)).mean() < 4.0


def test_restart_markers_identical_output():
    img = _gradient(37, 53)
    plain = decode_jpeg_pixels(encode_jpeg(img))[3]
    for dri in (1, 3, 7):
        d = decode_jpeg_pixels(encode_jpeg(img, restart_interval=dri))
        assert d is not None and np.array_equal(plain, d[3]), dri


def test_hostile_inputs_return_none():
    img = _gradient(16, 16)
    enc = encode_jpeg(img)
    assert decode_jpeg_pixels(enc[:40]) is None          # truncated
    assert decode_jpeg_pixels(b"\xff\xd8junk") is None
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(enc, max_pixels=10) is None  # bomb guard
    # progressive flag (SOF2) must be rejected, not mis-decoded
    prog = bytearray(enc)
    prog[enc.index(b"\xff\xc0") + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(prog)) is None
    # forged huge dimensions rejected before allocation
    i = enc.index(b"\xff\xc0")
    huge = bytearray(enc)
    huge[i + 5:i + 9] = struct.pack(">HH", 65000, 65000)
    assert decode_jpeg_pixels(bytes(huge)) is None


def test_image_features_routes_baseline_jpeg(spark):
    from knowledgebase_processor_spark.operators.multimodal import (
        image_features)
    img = _gradient(24, 24)
    m = spark.createDataFrame(
        [("j1", "image", bytes(encode_jpeg(img)), "image/jpeg",
          None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    row = image_features(m).collect()[0]
    assert (row["format"], row["width"], row["height"],
            row["embedding_kind"]) == ("jpeg", 24, 24, "pixels")
    assert len(row["embedding"]) == 8


def test_subsampled_roundtrip_bounded_error():
    """4:2:0 and 4:2:2 encode->decode: luma detail survives, chroma is
    box-downsampled + nearest-upsampled, overall error stays bounded on
    a smooth gradient image (odd dims exercise the padding paths)."""
    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([(xx * 4) % 256, (yy * 5) % 256,
                    ((xx + yy) * 3) % 256], axis=-1).astype(np.uint8)
    for mode in ("420", "422"):
        enc = encode_jpeg(img, subsampling=mode)
        dec = decode_jpeg_pixels(enc)
        assert dec is not None, mode
        w, h, ch, out = dec
        assert (w, h, ch) == (53, 37, 3)
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 14.0, (mode, err)     # chroma halved, luma intact
        # 4:2:0 stream must be smaller than 4:4:4 of the same image
        assert len(enc) < len(encode_jpeg(img))


def test_subsampled_restart_markers():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    plain = decode_jpeg_pixels(encode_jpeg(img, subsampling="420"))[3]
    for dri in (1, 2):
        d = decode_jpeg_pixels(encode_jpeg(img, subsampling="420",
                                           restart_interval=dri))
        assert d is not None and np.array_equal(plain, d[3]), dri


def test_gray_image_through_subsampling_flag():
    gray = np.linspace(0, 255, 24 * 64).reshape(24, 64).astype(np.uint8)
    d = decode_jpeg_pixels(encode_jpeg(gray, subsampling="420"))
    assert d is not None and d[:3] == (64, 24, 1)


def test_progressive_equals_baseline_bit_exact():
    """SOF2 successive approximation (DC first Al=1, DC refinement,
    per-component AC first with EOBRUN, AC refinement) carries the SAME
    quantized coefficients as the baseline stream — so decoding both
    must yield bit-identical rasters, not merely close ones."""
    from knowledgebase_processor_spark.operators.jpeg import (
        encode_jpeg_progressive)
    rng = np.random.default_rng(3)
    for shape in ((24, 32, 3), (17, 23, 3), (16, 16), (9, 80), (8, 8, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg_pixels(encode_jpeg(img))
        prog = decode_jpeg_pixels(encode_jpeg_progressive(img))
        assert prog is not None, shape
        assert prog[:3] == base[:3]
        assert np.array_equal(base[3], prog[3]), shape


def test_progressive_hostile_inputs():
    from knowledgebase_processor_spark.operators.jpeg import (
        encode_jpeg_progressive)
    img = np.random.default_rng(0).integers(0, 256, (24, 24, 3), np.uint8)
    enc = encode_jpeg_progressive(img)
    assert decode_jpeg_pixels(enc[:80]) is None            # truncated
    assert decode_jpeg_pixels(enc[:len(enc) // 2]) is None # mid-scan cut
    assert decode_jpeg_pixels(enc, max_pixels=10) is None  # bomb guard
    # flipping a byte inside entropy data must not crash (None or a
    # decoded-but-different raster are both acceptable)
    mut = bytearray(enc)
    mut[len(enc) // 2] ^= 0x55
    decode_jpeg_pixels(bytes(mut))
