"""Property-based tests (hypothesis) for the pure math kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tilers_tools_ray import codecs
from tilers_tools_ray import geometry as geo
from tilers_tools_ray import tilegrid as tg


@given(
    z=st.integers(0, 20),
    fx=st.floats(0, 1, exclude_max=True),
    fy=st.floats(0, 1, exclude_max=True),
)
def test_key_roundtrip_any_tile(z, fx, fy):
    n = 1 << z
    x, y = int(fx * n), int(fy * n)
    kz, kx, ky = (int(v) for v in tg.unpack_key(tg.pack_key(z, x, y)))
    assert (kz, kx, ky) == (z, x, y)


@given(
    z=st.integers(0, 20),
    fx=st.floats(0, 1, exclude_max=True),
    fy=st.floats(0, 1, exclude_max=True),
)
def test_tile_bounds_contain_center_point(z, fx, fy):
    n = 1 << z
    x, y = int(fx * n), int(fy * n)
    minx, miny, maxx, maxy = tg.tile_bounds_merc(z, x, y)
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    tx, ty = tg.merc_to_tile(cx, cy, z)
    assert (int(tx), int(ty)) == (x, y)


@given(
    z=st.integers(0, 20),
    fy=st.floats(0, 1, exclude_max=True),
)
def test_tms_flip_is_involution(z, fy):
    y = int(fy * (1 << z))
    assert int(tg.xyz_to_tms_y(z, tg.xyz_to_tms_y(z, y))) == y


@given(
    x0=st.floats(-1e6, 1e6),
    dx=st.floats(0.1, 1000),
    rx=st.floats(-10, 10),
    y0=st.floats(-1e6, 1e6),
    ry=st.floats(-10, 10),
    dy=st.floats(-1000, -0.1),
)
def test_affine_invert_roundtrip(x0, dx, rx, y0, ry, dy):
    gt = np.array([x0, dx, rx, y0, ry, dy])
    if abs(dx * dy - rx * ry) < 1e-6:
        return
    inv = geo.invert_gt(gt)
    px = np.array([0.0, 17.3, 250.0])
    py = np.array([0.0, 41.1, 123.0])
    wx, wy = geo.apply_gt(gt, px, py)
    px2, py2 = geo.apply_gt(inv, wx, wy)
    np.testing.assert_allclose(px2, px, atol=1e-5)
    np.testing.assert_allclose(py2, py, atol=1e-5)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(8, 80),
    w=st.integers(8, 80),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_any_size(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_composite_over_associative_binary_alpha(seed):
    """With binary alpha, OVER is exactly associative — the invariant
    the salted reduce depends on (SURVEY.md §7.6)."""
    rng = np.random.default_rng(seed)

    def frag():
        f = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
        f[:, :, 3] = (rng.random((16, 16)) < 0.5) * 255
        return f

    a, b, c = frag(), frag(), frag()
    from tilers_tools_ray.raster import composite_over

    ab = composite_over(a.copy(), b)
    left = composite_over(ab.copy(), c)
    bc = composite_over(b.copy(), c)
    right = composite_over(a.copy(), bc)
    assert np.array_equal(left, right)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(3, 10),
    seed=st.integers(0, 2**31),
)
def test_pip_matches_fill(n, seed):
    rng = np.random.default_rng(seed)
    ring = rng.uniform(1, 15, (n, 2))
    mask = geo.fill_polygon(ring, 16, 16)
    yy, xx = np.mgrid[0:16, 0:16]
    pip = geo.point_in_polygon(xx.ravel() + 0.5, yy.ravel() + 0.5, ring).reshape(
        16, 16
    )
    assert np.array_equal(mask > 0, pip)


@given(
    h=st.integers(8, 140),
    w=st.integers(8, 140),
    n_colors=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    alpha=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_ozf_roundtrip_any_paletted_image(h, w, n_colors, seed, alpha):
    """OZF container: LOSSLESS for any image with ≤256 distinct colors,
    any size (edge-tile padding), with or without binary alpha."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    img = np.empty((h, w, 4), dtype=np.uint8)
    img[:, :, :3] = pal[idx]
    img[:, :, 3] = 255
    if alpha:
        img[:, :, 3] = np.where(rng.random((h, w)) < 0.3, 0, 255)
    back = codecs.decode_ozf(codecs.encode_ozf(img))
    if alpha:
        assert np.array_equal(back[:, :, 3], img[:, :, 3])
        opaque = img[:, :, 3] == 255
        assert np.array_equal(back[opaque], img[opaque])
    else:
        assert np.array_equal(back, img)


@given(
    h=st.integers(4, 100),
    w=st.integers(4, 100),
    n_colors=st.integers(1, 60),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=40, deadline=None)
def test_png8_roundtrip_any_paletted_image(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    img = np.empty((h, w, 4), dtype=np.uint8)
    img[:, :, :3] = pal[rng.integers(0, n_colors, (h, w))]
    img[:, :, 3] = 255
    back = codecs.decode_png(codecs.encode_png8(img))
    assert np.array_equal(back, img)


@given(text=st.text(max_size=400))
@settings(max_examples=60, deadline=None)
def test_georef_parsers_never_crash_unstructured(text):
    """Malformed sidecar text raises ValueError, never another
    exception (the parser-contract fuzz)."""
    from tilers_tools_ray.stages import georef

    try:
        georef.parse_georef_any(text)
    except ValueError:
        pass
