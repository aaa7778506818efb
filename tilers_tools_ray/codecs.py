"""Pure-numpy image codecs + perceptual hash (SURVEY.md §7.2, §2 M1/M2/M11).

The reference delegates decode/encode to PIL (``Image.open`` /
``save`` calls in gdal_tiler.py / tiles_merge.py / tiles_convert.py
[C]); PIL is absent in this sandbox, so the synthetic corpus uses three
codecs we implement exactly:

  raw — magic + header + uncompressed RGB(A) bytes
  png — a real, minimal PNG (8-bit RGB/RGBA, zlib IDAT, filter 0 on
        encode; filters 0–4 supported on decode) — stands in for the
        lossless path
  dct — our own 8×8 DCT + uniform quantization + zlib — *lossy*, so
        the PSNR ≥ 40 dB gate (BASELINE.json:15) is exercised honestly;
        stands in for JPEG/WebP

All decoders return H×W×4 uint8 RGBA. All functions are deterministic.
Decoder state (DCT basis matrices) is module-level and cheap — actor
pools (T1) reuse it per process.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# DCT basis
# ---------------------------------------------------------------------------


def _dct_matrix(n):
    """Orthonormal DCT-II matrix: M @ x applies the transform."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT8 = _dct_matrix(8)
_DCT8_F32 = _DCT8.astype(np.float32)
_DCT32 = _dct_matrix(32)

# ---------------------------------------------------------------------------
# raw codec
# ---------------------------------------------------------------------------

_RAW_MAGIC = b"RAW1"
_DCT_MAGIC = b"DCT1"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_raw(rgba):
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w, c = rgba.shape
    return _RAW_MAGIC + struct.pack("<IIB", w, h, c) + rgba.tobytes()


def decode_raw(data):
    if data[:4] != _RAW_MAGIC:
        raise ValueError("not a RAW1 payload")
    w, h, c = struct.unpack("<IIB", data[4:13])
    px = np.frombuffer(data, dtype=np.uint8, offset=13).reshape(h, w, c)
    return _ensure_rgba(px)


def _ensure_rgba(px):
    if px.shape[2] == 4:
        return px
    out = np.empty((px.shape[0], px.shape[1], 4), dtype=np.uint8)
    out[:, :, :3] = px[:, :, :3]
    out[:, :, 3] = 255
    return out


# ---------------------------------------------------------------------------
# png codec (minimal but real PNG)
# ---------------------------------------------------------------------------


def _png_chunk(tag, payload):
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgba, level=6):
    """RGBA (or RGB) uint8 → minimal PNG bytes, filter 0 per scanline."""
    px = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w, c = px.shape
    colortype = 6 if c == 4 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    # prepend filter byte 0 to each scanline
    lines = np.zeros((h, 1 + w * c), dtype=np.uint8)
    lines[:, 1:] = px.reshape(h, w * c)
    idat = zlib.compress(lines.tobytes(), level)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data):
    """Minimal PNG decoder: 8-bit RGB/RGBA/paletted (colortype 2/6/3
    with PLTE + optional tRNS), filters 0–4. Returns RGBA."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = colortype = None
    idat = []
    plte = trns = None
    n = len(data)
    while pos < n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or colortype not in (2, 3, 6) or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    bpp = {2: 3, 3: 1, 6: 4}[colortype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * bpp
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    if not filters.any():
        out[:] = raw[:, 1:]
    else:
        prev = np.zeros(w * bpp, dtype=np.uint8)
        for r in range(h):
            f = int(filters[r])
            line = raw[r, 1:].astype(np.int64)
            if f == 0:
                rec = line
            elif f == 1:  # Sub — per-channel cumulative sum mod 256
                chan = line.reshape(w, bpp)
                rec = np.cumsum(chan, axis=0).reshape(-1) % 256
            elif f == 2:  # Up
                rec = (line + prev) % 256
            elif f == 3:  # Average — sequential in x
                rec = np.zeros(w * bpp, dtype=np.int64)
                for x in range(w * bpp):
                    left = rec[x - bpp] if x >= bpp else 0
                    rec[x] = (line[x] + (left + int(prev[x])) // 2) % 256
            elif f == 4:  # Paeth — sequential in x
                rec = np.zeros(w * bpp, dtype=np.int64)
                for x in range(w * bpp):
                    a = rec[x - bpp] if x >= bpp else 0
                    b = int(prev[x])
                    cc = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[x] = (line[x] + pred) % 256
            else:
                raise ValueError(f"bad PNG filter {f}")
            out[r] = rec.astype(np.uint8)
            prev = out[r]
    if colortype == 3:  # palette expansion (PNG8)
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        idx = out.reshape(h, w)
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            rgba[:, :, 3] = alpha[idx]
        else:
            rgba[:, :, 3] = 255
        return rgba
    return _ensure_rgba(out.reshape(h, w, bpp))


# ---------------------------------------------------------------------------
# dct codec (lossy JPEG/WebP stand-in)
# ---------------------------------------------------------------------------


def _blockify(f32):
    """H×W float (H,W multiples of 8) → (H//8, W//8, 8, 8) blocks."""
    h, w = f32.shape
    return f32.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks):
    nh, nw = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)


def encode_dct(rgba, q=6, level=6):
    """RGB(A) uint8 → lossy DCT payload (alpha is dropped; decode
    re-synthesizes alpha=255). Uniform quantizer step ``q`` ⇒
    PSNR ≈ 10·log10(255²·12/q²) ≈ 43 dB at q=6."""
    px = np.asarray(rgba, dtype=np.uint8)
    h, w = px.shape[:2]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    coeffs = []
    for ch in range(3):
        plane = px[:, :, ch].astype(np.float64) - 128.0
        if (ph, pw) != (h, w):
            plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = _blockify(plane)
        c = _DCT8 @ blocks @ _DCT8.T  # broadcasting matmul over blocks
        coeffs.append(np.round(c / q).astype(np.int16))
    payload = zlib.compress(np.stack(coeffs).tobytes(), level)
    return _DCT_MAGIC + struct.pack("<IIB", w, h, q) + payload


def decode_dct(data):
    if data[:4] != _DCT_MAGIC:
        raise ValueError("not a DCT1 payload")
    w, h, q = struct.unpack("<IIB", data[4:13])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    qc = np.frombuffer(zlib.decompress(data[13:]), dtype=np.int16).reshape(
        3, ph // 8, pw // 8, 8, 8
    )
    out = np.empty((h, w, 4), dtype=np.uint8)
    for ch in range(3):
        # float32 inverse transform: decode is the hot per-batch path;
        # coefficient magnitudes ≤ 255 keep float32 error ~3e-5 — far
        # inside the rounding granularity
        c = qc[ch].astype(np.float32) * np.float32(q)
        blocks = _DCT8_F32.T @ c @ _DCT8_F32
        plane = _unblockify(blocks)[:h, :w] + np.float32(128.0)
        out[:, :, ch] = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    out[:, :, 3] = 255
    return out


# ---------------------------------------------------------------------------
# palette quantization (shared by png8 + ozf — the reference's
# --paletted path: gdal_tiler.py quantize/expand [C semantics])
# ---------------------------------------------------------------------------


def build_palette(rgba, max_colors=256):
    """Deterministic ≤``max_colors`` RGB palette. Exact (lossless) when
    the image has ≤ max_colors distinct colors; otherwise median-cut
    over the distinct-color histogram. Returns (n, 3) uint8, sorted
    lexicographically."""
    px = np.asarray(rgba, dtype=np.uint8)[:, :, :3].reshape(-1, 3)
    colors, counts = np.unique(px, axis=0, return_counts=True)
    if len(colors) <= max_colors:
        return colors  # np.unique is lexicographically sorted
    boxes = [(colors, counts)]
    while len(boxes) < max_colors:
        # split the box with the largest (population × longest side)
        scores = [
            int(c.sum()) * int((b.max(axis=0) - b.min(axis=0)).max())
            for b, c in boxes
        ]
        bi = int(np.argmax(scores))
        b, c = boxes.pop(bi)
        if len(b) == 1:  # unsplittable — put back and stop
            boxes.append((b, c))
            break
        axis = int(np.argmax(b.max(axis=0) - b.min(axis=0)))
        order = np.argsort(b[:, axis], kind="stable")
        b, c = b[order], c[order]
        half = np.searchsorted(np.cumsum(c), c.sum() / 2.0, side="right")
        half = int(np.clip(half, 1, len(b) - 1))
        boxes.append((b[:half], c[:half]))
        boxes.append((b[half:], c[half:]))
    pal = np.array(
        [
            np.round(
                (b.astype(np.float64) * c[:, None]).sum(axis=0) / c.sum()
            )
            for b, c in boxes
        ],
        dtype=np.uint8,
    )
    pal = np.unique(pal, axis=0)  # dedupe + lexicographic order
    return pal


def quantize_to_palette(rgba, palette):
    """Nearest-palette-index map (H, W) uint8 for an RGB(A) image.

    Fast path: pixels whose exact color is IN the palette map via a
    packed-int searchsorted (O(n log c) — covers the whole image for
    ≤256-color sources, the normal paletted-chart case). Only the
    missing colors fall back to the chunked distance argmin."""
    px = np.asarray(rgba, dtype=np.uint8)[:, :, :3]
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3).astype(np.int32)
    pal = palette.astype(np.int32)
    keys = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    pkeys = (pal[:, 0] << 16) | (pal[:, 1] << 8) | pal[:, 2]
    order = np.argsort(pkeys)  # identity for lexicographic palettes
    sk = pkeys[order]
    pos = np.clip(np.searchsorted(sk, keys), 0, len(sk) - 1)
    exact = sk[pos] == keys
    idx = np.empty(len(flat), dtype=np.uint8)
    idx[exact] = order[pos[exact]].astype(np.uint8)
    miss = np.flatnonzero(~exact)
    if len(miss):
        # distance argmin only over the distinct missing colors
        mkeys, inv = np.unique(keys[miss], return_inverse=True)
        mcol = np.stack(
            [(mkeys >> 16) & 255, (mkeys >> 8) & 255, mkeys & 255], axis=1
        )
        step = 16384
        midx = np.empty(len(mkeys), dtype=np.uint8)
        for lo in range(0, len(mkeys), step):
            d = mcol[lo : lo + step, None, :] - pal[None, :, :]
            midx[lo : lo + step] = np.argmin(
                (d * d).sum(axis=2), axis=1
            ).astype(np.uint8)
        idx[miss] = midx[inv]
    return idx.reshape(h, w)


# ---------------------------------------------------------------------------
# png8 codec (paletted PNG, colortype 3; binary transparency via tRNS)
# ---------------------------------------------------------------------------


def encode_png8(rgba, level=6):
    """RGB(A) uint8 → paletted PNG (colortype 3). Transparent pixels
    (alpha < 128) map to a reserved palette slot 0 with tRNS alpha 0 —
    the binary-alpha model of the tile pipeline (nearest cutlines)."""
    px = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w = px.shape[:2]
    has_alpha = px.shape[2] == 4 and bool((px[:, :, 3] < 128).any())
    pal = build_palette(px, max_colors=255 if has_alpha else 256)
    idx = quantize_to_palette(px, pal)
    if has_alpha:
        idx = (idx + 1).astype(np.uint8)
        idx[px[:, :, 3] < 128] = 0
        pal = np.vstack([np.zeros(3, dtype=np.uint8), pal])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    lines = np.zeros((h, 1 + w), dtype=np.uint8)
    lines[:, 1:] = idx
    chunks = [_png_chunk(b"IHDR", ihdr), _png_chunk(b"PLTE", pal.tobytes())]
    if has_alpha:
        chunks.append(_png_chunk(b"tRNS", b"\x00"))
    chunks.append(_png_chunk(b"IDAT", zlib.compress(lines.tobytes(), level)))
    chunks.append(_png_chunk(b"IEND", b""))
    return _PNG_MAGIC + b"".join(chunks)


# ---------------------------------------------------------------------------
# ozf codec (S6 — the bespoke-container decode: OZF2/OZFx3 semantics,
# ozf_decoder.py upstream: 64×64 zlib-compressed internal tiles of
# 8-bit palette indices; OZFx3's xor-key descrambling of the header
# and tile streams)
# ---------------------------------------------------------------------------

_OZF_MAGIC = b"OZF4"  # v4: uint32 tile count (v3's uint16 capped at ~16384² px)
_OZF_TILE = 64


def _ozf_key(w, h):
    """Deterministic nonzero scramble key (OZFx3 derives its key from
    a header byte; the engine derives it from the dimensions)."""
    return ((w * 31 + h * 17) % 255) + 1


def encode_ozf(rgba, level=6):
    """RGB(A) uint8 → OZF-style container: palette + 64×64 internal
    tiles, each zlib-compressed then xor-scrambled; the palette and
    tile-offset index are xor-scrambled too. Lossless when the image
    has ≤256 distinct colors (charts do), else palette-quantized.
    Binary transparency (alpha < 128) maps to a reserved palette
    slot 0, recorded in the header flags (upstream OZF is opaque; the
    tile sink needs nodata)."""
    px = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w = px.shape[:2]
    key = _ozf_key(w, h)
    has_alpha = px.shape[2] == 4 and bool((px[:, :, 3] < 128).any())
    pal = build_palette(px, max_colors=255 if has_alpha else 256)
    idx = quantize_to_palette(px, pal)
    if has_alpha:
        idx = (idx + 1).astype(np.uint8)
        idx[px[:, :, 3] < 128] = 0
        pal = np.vstack([np.zeros(3, dtype=np.uint8), pal])
    T = _OZF_TILE
    nty, ntx = (h + T - 1) // T, (w + T - 1) // T
    tiles = []
    for ty in range(nty):
        for tx in range(ntx):
            block = np.zeros((T, T), dtype=np.uint8)
            sub = idx[ty * T : ty * T + T, tx * T : tx * T + T]
            block[: sub.shape[0], : sub.shape[1]] = sub
            comp = np.frombuffer(zlib.compress(block.tobytes(), level), np.uint8)
            tiles.append(comp ^ np.uint8(key))
    offsets = np.zeros(len(tiles) + 1, dtype=np.uint32)
    offsets[1:] = np.cumsum([len(t) for t in tiles])
    pal_full = np.zeros((256, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    scrambled = np.frombuffer(
        pal_full.tobytes() + offsets.tobytes(), dtype=np.uint8
    ) ^ np.uint8(key)
    header = _OZF_MAGIC + struct.pack(
        "<IIBBI", w, h, key, 1 if has_alpha else 0, len(tiles)
    )
    return header + scrambled.tobytes() + b"".join(t.tobytes() for t in tiles)


def decode_ozf(data):
    if data[:4] != _OZF_MAGIC:
        raise ValueError("not an OZF4 payload")
    w, h, key, flags, ntiles = struct.unpack("<IIBBI", data[4:18])
    T = _OZF_TILE
    ntx = (w + T - 1) // T
    nty = (h + T - 1) // T
    if ntx * nty != ntiles:
        raise ValueError("corrupt OZF4 tile count")
    meta_len = 256 * 3 + (ntiles + 1) * 4
    meta = np.frombuffer(data, np.uint8, count=meta_len, offset=18) ^ np.uint8(key)
    pal = meta[: 256 * 3].reshape(256, 3)
    offsets = meta[256 * 3 :].view(np.uint32)
    base = 18 + meta_len
    idx = np.zeros((nty * T, ntx * T), dtype=np.uint8)
    for t in range(ntiles):
        raw = np.frombuffer(
            data, np.uint8, count=int(offsets[t + 1] - offsets[t]),
            offset=base + int(offsets[t]),
        ) ^ np.uint8(key)
        block = np.frombuffer(zlib.decompress(raw.tobytes()), np.uint8).reshape(T, T)
        ty, tx = divmod(t, ntx)
        idx[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T] = block
    idx = idx[:h, :w]
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, :3] = pal[idx]
    out[:, :, 3] = np.where(idx == 0, 0, 255) if flags & 1 else 255
    return out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

ENCODERS = {
    "raw": encode_raw,
    "png": encode_png,
    "dct": encode_dct,
    "png8": encode_png8,
    "ozf": encode_ozf,
}
FORMATS = tuple(ENCODERS)


def encode_image(rgba, fmt):
    return ENCODERS[fmt](rgba)


def decode_image(data, fmt=None):
    """Decode by fmt tag, or sniff by magic when fmt is None."""
    if fmt == "raw" or data[:4] == _RAW_MAGIC:
        return decode_raw(data)
    if fmt == "dct" or data[:4] == _DCT_MAGIC:
        return decode_dct(data)
    if fmt == "ozf" or data[:4] == _OZF_MAGIC:
        return decode_ozf(data)
    if fmt in ("png", "png8") or data[:8] == _PNG_MAGIC:
        return decode_png(data)
    raise ValueError(f"cannot sniff image format (fmt={fmt!r})")


# ---------------------------------------------------------------------------
# perceptual hash (graft M11 — phash column of BASELINE.json:15)
# ---------------------------------------------------------------------------


def phash64(rgba):
    """64-bit DCT perceptual hash of an RGBA image.

    gray → 32×32 box-downsample → 32×32 DCT → low-freq 8×8 block →
    bit i = coeff_i > median. Returns int64 (two's-complement view)."""
    px = np.asarray(rgba, dtype=np.float64)
    gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    h, w = gray.shape
    ch, cw = h - h % 32, w - w % 32
    gray = gray[:ch, :cw]
    bh, bw = ch // 32, cw // 32
    small = gray.reshape(32, bh, 32, bw).mean(axis=(1, 3))
    coeff = _DCT32 @ small @ _DCT32.T
    block = coeff[:8, :8].ravel()
    bits = block > np.median(block)
    val = 0
    for i in np.flatnonzero(bits):
        val |= 1 << int(i)
    if val >= 1 << 63:  # two's-complement int64
        val -= 1 << 64
    return val


def psnr(a, b):
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
