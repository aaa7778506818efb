"""Codec unit tests: roundtrip identity (lossless) + PSNR gate (lossy)."""

import numpy as np
import pytest

from tilers_tools_ray import codecs


def _test_image(h=96, w=128, seed=7):
    """Gradient + checker + noise patch — non-trivial spectrum so the
    lossy PSNR check is meaningful (FIXTURES.md A1)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[:, :, 0] = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    img[:, :, 1] = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    img[:, :, 2] = ((xx // 8 + yy // 8) % 2 * 200 + 27).astype(np.uint8)
    ph, pw = h // 2 - h // 4, w // 2 - w // 4
    img[h // 4 : h // 2, w // 4 : w // 2] += rng.integers(0, 50, (ph, pw, 4)).astype(
        np.uint8
    )
    img[:, :, 3] = 255
    return img


def test_raw_roundtrip():
    img = _test_image()
    assert np.array_equal(codecs.decode_raw(codecs.encode_raw(img)), img)


def test_raw_rgb_gets_alpha():
    img = _test_image()[:, :, :3]
    out = codecs.decode_raw(codecs.encode_raw(img))
    assert out.shape[2] == 4
    assert np.array_equal(out[:, :, :3], img)
    assert (out[:, :, 3] == 255).all()


def test_png_roundtrip_byte_exact():
    img = _test_image()
    data = codecs.encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(codecs.decode_png(data), img)


def test_png_filtered_scanlines_decode():
    # hand-build a 2x2 RGB PNG using filters 1 (Sub) and 2 (Up)
    import struct
    import zlib

    sub = bytes([1, 10, 20, 30, 5, 5, 5])  # recon: (10,20,30), (15,25,35)
    up = bytes([2, 1, 1, 1, 2, 2, 2])  # recon: (11,21,31), (17,27,37)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(sub + up))
        + codecs._png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    expect = np.array(
        [[[10, 20, 30], [15, 25, 35]], [[11, 21, 31], [17, 27, 37]]], dtype=np.uint8
    )
    assert np.array_equal(out[:, :, :3], expect)


def test_dct_psnr_gate():
    img = _test_image(128, 128)
    out = codecs.decode_dct(codecs.encode_dct(img))
    assert out.shape == img.shape
    p = codecs.psnr(img[:, :, :3], out[:, :, :3])
    assert p >= 40.0, f"lossy codec PSNR {p:.1f} dB < 40 dB gate"


def test_dct_nonsquare_and_padding():
    img = _test_image(70, 130)  # not multiples of 8
    out = codecs.decode_dct(codecs.encode_dct(img))
    assert out.shape == (70, 130, 4)
    assert codecs.psnr(img[:, :, :3], out[:, :, :3]) >= 40.0


def test_dispatch_sniffing():
    img = _test_image(64, 64)
    for fmt in codecs.FORMATS:
        data = codecs.encode_image(img, fmt)
        out = codecs.decode_image(data)  # no fmt hint — sniff magic
        assert out.shape == (64, 64, 4)
        out2 = codecs.decode_image(data, fmt)
        assert np.array_equal(out, out2)


def test_phash_deterministic_and_discriminative():
    a = _test_image(64, 64, seed=1)
    b = _test_image(64, 64, seed=1)
    c = _test_image(64, 64, seed=99)
    c[:32] = 255 - c[:32]  # structurally different
    ha, hb, hc = codecs.phash64(a), codecs.phash64(b), codecs.phash64(c)
    assert ha == hb
    assert ha != hc
    assert -(2**63) <= ha < 2**63


def test_phash_robust_to_lossy():
    img = _test_image(128, 128)
    lossy = codecs.decode_dct(codecs.encode_dct(img))
    h1, h2 = codecs.phash64(img), codecs.phash64(lossy)
    ham = bin((h1 ^ h2) & (2**64 - 1)).count("1")
    assert ham <= 4, f"phash hamming distance {ham} too large after mild loss"


# ---------------------------------------------------------------------------
# ozf (S6 bespoke container) + png8 (paletted output)
# ---------------------------------------------------------------------------


def _chart_image(h=130, w=200, seed=4):
    """Limited-palette chart-like image (≤252 colors): posterized."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    img[:, :, 0] = img[:, :, 0] // 43 * 43 + 21
    img[:, :, 1] = img[:, :, 1] // 43 * 43 + 21
    img[:, :, 2] = img[:, :, 2] // 37 * 37 + 18
    img[:, :, 3] = 255
    return img


def test_ozf_roundtrip_lossless_on_paletted():
    chart = _chart_image()
    data = codecs.encode_ozf(chart)
    assert data[:4] == b"OZF4"
    assert np.array_equal(codecs.decode_ozf(data), chart)


def test_ozf_odd_sizes_and_sniffing():
    chart = np.ascontiguousarray(_chart_image()[:97, :71])
    data = codecs.encode_image(chart, "ozf")
    assert np.array_equal(codecs.decode_image(data), chart)  # magic sniff
    assert np.array_equal(codecs.decode_image(data, "ozf"), chart)


def test_ozf_scrambled_container():
    """The palette/index section and tile streams are xor-scrambled —
    the raw zlib magic must NOT appear at the tile offsets (the
    descramble step is real, not a no-op)."""
    chart = _chart_image(64, 64)
    data = codecs.encode_ozf(chart)
    key = data[12]
    assert key != 0
    # first tile begins right after header+meta; zlib magic 0x78 only
    # appears after unscrambling
    meta_len = 256 * 3 + 4 * (1 * 1 + 1)
    first = data[18 + meta_len]  # OZF4 header is 18 bytes (uint32 tile count)
    assert first != 0x78 and (first ^ key) == 0x78


def test_ozf_quantizes_many_colors():
    rng = np.random.default_rng(7)
    many = rng.integers(0, 256, (96, 96, 4)).astype(np.uint8)
    many[:, :, 3] = 255
    back = codecs.decode_image(codecs.encode_ozf(many))
    assert codecs.psnr(many[:, :, :3], back[:, :, :3]) >= 25.0


def test_png8_roundtrip_and_alpha():
    chart = _chart_image()
    data = codecs.encode_png8(chart)
    assert data[:8] == codecs._PNG_MAGIC
    assert np.array_equal(codecs.decode_png(data), chart)
    # binary transparency via tRNS slot 0
    al = chart.copy()
    al[:40, :, 3] = 0
    back = codecs.decode_image(codecs.encode_png8(al))
    assert np.array_equal(back[:, :, 3], al[:, :, 3])
    opaque = al[:, :, 3] == 255
    assert np.array_equal(back[opaque][:, :3], al[opaque][:, :3])


def test_build_palette_exact_when_small():
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, :4, 0] = 200
    img[:, :, 3] = 255
    pal = codecs.build_palette(img)
    assert len(pal) == 2
    idx = codecs.quantize_to_palette(img, pal)
    assert np.array_equal(pal[idx], img[:, :, :3])
