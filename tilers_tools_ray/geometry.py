"""Geometry kernels — pure numpy, no Ray (SURVEY.md §2 M3/M7/J2/J3/T3).

Reimplements, from public specs:
  - GCP → affine solve: the reference delegates to ``gdal_translate
    -gcp`` + warp (reader_backend.py::MapTranslator.convert [R]);
    here a batched least-squares fit.
  - Cutline rasterization: the reference uses PIL ImageDraw.polygon
    (gdal_tiler.py [C]); here an even-odd scanline fill.
  - Point-in-polygon: the cutline "tile inside border?" test
    (gdal_tiler.py [C]) generalized to the graft's coverage join (J2).
  - Quadtree cell index (T3): S2/H3-style hierarchical cells over the
    Web-Mercator tile grid (BASELINE.json:14 mandates "reusable H3/S2
    indexers"; a true hex H3 is out of scope — SURVEY.md §7.6 records
    the quadtree substitution). Cell ids ARE tile_keys at a level.
  - kNN over region centroids (J3 fallback).

Everything vectorized; used inside map_batches stages and by golden.py.
"""

from __future__ import annotations

import numpy as np

from . import tilegrid as tg

# ---------------------------------------------------------------------------
# affine transforms (M3)
# ---------------------------------------------------------------------------


def solve_affine(px, py, wx, wy):
    """Least-squares affine fit from ≥3 GCPs: pixel (px,py) → world (wx,wy).

    Returns a GDAL-style geotransform (x0, dx, rx, y0, ry, dy):
      wx = x0 + px*dx + py*rx ;  wy = y0 + px*ry + py*dy
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    a = np.stack([np.ones_like(px), px, py], axis=1)
    cx, *_ = np.linalg.lstsq(a, np.asarray(wx, dtype=np.float64), rcond=None)
    cy, *_ = np.linalg.lstsq(a, np.asarray(wy, dtype=np.float64), rcond=None)
    return np.array([cx[0], cx[1], cx[2], cy[0], cy[1], cy[2]], dtype=np.float64)


def apply_gt(gt, px, py):
    """Apply geotransform: pixel → world. Vectorized."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return gt[0] + px * gt[1] + py * gt[2], gt[3] + py * gt[5] + px * gt[4]


def invert_gt(gt):
    """Invert a geotransform: world → pixel coefficients."""
    x0, dx, rx, y0, ry, dy = gt
    det = dx * dy - rx * ry
    if abs(det) < 1e-30:
        raise ValueError("singular geotransform")
    idx, irx = dy / det, -rx / det
    iry, idy = -ry / det, dx / det
    ix0 = -(idx * x0 + irx * y0)
    iy0 = -(iry * x0 + idy * y0)
    return np.array([ix0, idx, irx, iy0, iry, idy], dtype=np.float64)


# ---------------------------------------------------------------------------
# GCP warp transforms beyond affine (M3 extension)
#
# The reference handles ≥3 GCPs with GDAL's polynomial (order 1–3)
# and thin-plate-spline warps (``gdal_translate -gcp`` + ``-order N``
# / ``-tps`` in reader_backend.py's MapTranslator path [R]); scanned
# paper charts need order 2+, heavily warped scans need TPS. The
# engine fits BOTH directions (pixel→world for footprints,
# world→pixel for the warp) directly from the GCPs by normalized
# least squares; the fitted inverse is then Newton-refined against
# the exact forward model at apply time (GDAL's iterative inverter,
# vectorized).
#
# All three transform kinds serialize to ONE flat float64 list (a
# nullable list column next to the affine ``gt``), dispatched by
# length — poly records are even-length, TPS records are odd:
#
#   poly order k (k=2: len 32, k=3: len 48), nb = 6 or 10 basis terms:
#     [0:4]        pixel normalization (pcx, pcy, psx, psy)
#     [4:4+2nb]    forward coeffs ax[nb], ay[nb] over the monomial
#                  basis (1, u, v, u², uv, v², [u³, u²v, uv², v³])
#                  with u = (px−pcx)/psx, v = (py−pcy)/psy → (wx, wy)
#     [...:...+4]  world normalization (wcx, wcy, wsx, wsy)
#     [...:end]    inverse coeffs bx[nb], by[nb] (same basis over
#                  normalized world) → (px, py)
#
#   TPS with n centers (len 8n+21, always odd):
#     [0]     n
#     then per direction (forward = pixel→world, inverse reversed):
#     norm[4], centers u[n], v[n] (normalized source coords),
#     coefs cx[n+3], cy[n+3]  — f(x) = c0 + c1·u + c2·v + Σ wᵢ·φ(rᵢ),
#     φ(r) = r² ln r (the biharmonic kernel; Bookstein 1989).
#
# Normalizing to ±O(1) before squaring keeps the normal equations
# conditioned even for mercator-meter world coords (~1e7 raw, ~1e14
# squared — unusable unnormalized in float64 lstsq).
# ---------------------------------------------------------------------------

POLY2_LEN = 32
POLY3_LEN = 48
_POLY_NB = {2: 6, 3: 10}
_POLY_MIN_GCPS = {2: 6, 3: 10}


def _poly_basis(u, v, order):
    one = np.ones_like(u)
    cols = [one, u, v, u * u, u * v, v * v]
    if order == 3:
        cols += [u * u * u, u * u * v, u * v * v, v * v * v]
    return np.stack(cols, axis=-1)


def _poly_basis_du(u, v, order):
    z = np.zeros_like(u)
    cols = [z, np.ones_like(u), z, 2.0 * u, v, z]
    if order == 3:
        cols += [3.0 * u * u, 2.0 * u * v, v * v, z]
    return np.stack(cols, axis=-1)


def _poly_basis_dv(u, v, order):
    z = np.zeros_like(u)
    cols = [z, z, np.ones_like(u), z, u, 2.0 * v]
    if order == 3:
        cols += [z, u * u, 2.0 * u * v, 3.0 * v * v]
    return np.stack(cols, axis=-1)


def _norm_of(sx, sy):
    cx, cy = float(sx.mean()), float(sy.mean())
    scx = float(np.abs(sx - cx).max()) or 1.0
    scy = float(np.abs(sy - cy).max()) or 1.0
    return cx, cy, scx, scy


def _fit_poly_dir(sx, sy, tx, ty, order):
    """One direction: (sx, sy) → (tx, ty). Returns (norm[4], coef[2nb])."""
    cx, cy, scx, scy = _norm_of(sx, sy)
    a = _poly_basis((sx - cx) / scx, (sy - cy) / scy, order)
    ctx, *_ = np.linalg.lstsq(a, tx, rcond=None)
    cty, *_ = np.linalg.lstsq(a, ty, rcond=None)
    return np.array([cx, cy, scx, scy]), np.concatenate([ctx, cty])


def solve_poly(px, py, wx, wy, order=2):
    """Least-squares order-2/3 polynomial fit, both directions.
    Returns the flat float64 record above. Raises ValueError below
    the minimum GCP count (6 for order 2, 10 for order 3 — the fit is
    underdetermined; callers fall back to solve_affine)."""
    if order not in _POLY_NB:
        raise ValueError(f"polynomial order must be 2 or 3, got {order!r}")
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    need = _POLY_MIN_GCPS[order]
    if len(px) < need:
        raise ValueError(
            f"need ≥{need} GCPs for an order-{order} polynomial solve"
        )
    fn, fc = _fit_poly_dir(px, py, wx, wy, order)
    inorm, ic = _fit_poly_dir(wx, wy, px, py, order)
    return np.concatenate([fn, fc, inorm, ic])


def solve_poly2(px, py, wx, wy):
    return solve_poly(px, py, wx, wy, order=2)


def solve_poly3(px, py, wx, wy):
    return solve_poly(px, py, wx, wy, order=3)


def _record_kind(p):
    """(kind, param) from a flat warp record: ('poly', order) or
    ('tps', n_centers). Dispatch is by length — poly lengths are even
    (32 / 48), TPS lengths 8n+21 are odd."""
    n = len(p)
    if n == POLY2_LEN:
        return "poly", 2
    if n == POLY3_LEN:
        return "poly", 3
    if n % 2 == 1 and n >= 53 and (n - 21) % 8 == 0:
        return "tps", (n - 21) // 8
    raise ValueError(f"unrecognized GCP warp record (len {n})")


def _apply_poly(norm, coef, x, y, order):
    nb = _POLY_NB[order]
    u = (np.asarray(x, dtype=np.float64) - norm[0]) / norm[2]
    v = (np.asarray(y, dtype=np.float64) - norm[1]) / norm[3]
    b = _poly_basis(u, v, order)
    return b @ coef[:nb], b @ coef[nb:]


def _poly_inv_refined(p, wx, wy, order, refine):
    nb = _POLY_NB[order]
    k = 4 + 2 * nb
    px, py = _apply_poly(p[k : k + 4], p[k + 4 :], wx, wy, order)
    if refine:
        pcx, pcy, psx, psy = p[0:4]
        ax, ay = p[4 : 4 + nb], p[4 + nb : 4 + 2 * nb]
        for _ in range(int(refine)):
            u = (px - pcx) / psx
            v = (py - pcy) / psy
            b = _poly_basis(u, v, order)
            fx = b @ ax - wx
            fy = b @ ay - wy
            bu = _poly_basis_du(u, v, order)
            bv = _poly_basis_dv(u, v, order)
            j11 = (bu @ ax) / psx
            j12 = (bv @ ax) / psy
            j21 = (bu @ ay) / psx
            j22 = (bv @ ay) / psy
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            px = px - (j22 * fx - j12 * fy) / det
            py = py - (j11 * fy - j21 * fx) / det
    return px, py


# --- thin-plate spline ------------------------------------------------------

#: per-chunk bound on (points × centers) pairwise work inside TPS
#: evaluation — keeps the distance matrix ≤ ~32 MB however large the
#: warp grid is (the caller's row-chunking bounds the OUTPUT, this
#: bounds the INTERNAL temporary).
_TPS_CHUNK_PAIRS = 4_000_000


def _tps_phi(d2):
    # φ(r) = r² ln r = ½ d² ln d²; φ(0) = 0 (limit)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = 0.5 * d2 * np.log(d2)
    return np.where(d2 > 0.0, out, 0.0)


def _fit_tps_dir(sx, sy, tx, ty):
    """One TPS direction: (sx, sy) → (tx, ty).
    Returns (norm[4], cu[n], cv[n], coefx[n+3], coefy[n+3])."""
    cx, cy, scx, scy = _norm_of(sx, sy)
    u = (sx - cx) / scx
    v = (sy - cy) / scy
    n = len(u)
    d2 = (u[:, None] - u[None, :]) ** 2 + (v[:, None] - v[None, :]) ** 2
    k = _tps_phi(d2)
    pmat = np.stack([np.ones_like(u), u, v], axis=-1)  # n×3
    a = np.zeros((n + 3, n + 3))
    a[:n, :n] = k
    a[:n, n:] = pmat
    a[n:, :n] = pmat.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n, 0] = tx
    rhs[:n, 1] = ty
    # lstsq (not solve): duplicate/collinear GCPs make A singular —
    # the minimum-norm solution still interpolates the consistent ones
    sol, *_ = np.linalg.lstsq(a, rhs, rcond=None)
    wxc, wyc = sol[:, 0], sol[:, 1]
    coefx = np.concatenate([wxc[n:], wxc[:n]])  # (a0,a1,a2, w…)
    coefy = np.concatenate([wyc[n:], wyc[:n]])
    return np.array([cx, cy, scx, scy]), u, v, coefx, coefy


def solve_tps(px, py, wx, wy):
    """Thin-plate-spline fit from ≥4 GCPs, both directions (upstream:
    GDAL ``-tps``). The forward spline interpolates the GCPs exactly;
    the stored inverse spline is a seed that ``apply_gcp_inv`` Newton-
    refines against the forward model. Returns the flat float64
    record documented above (len 8n+21)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    if len(px) < 4:
        raise ValueError("need ≥4 GCPs for a thin-plate-spline solve")
    parts = [np.array([float(len(px))])]
    for norm, u, v, cfx, cfy in (
        _fit_tps_dir(px, py, wx, wy),
        _fit_tps_dir(wx, wy, px, py),
    ):
        parts += [norm, u, v, cfx, cfy]
    return np.concatenate(parts)


def _tps_dir_slices(p, which):
    """Unpack one direction of a TPS record: 0 = forward, 1 = inverse."""
    n = int(p[0])
    dlen = 4 * n + 10
    base = 1 + which * dlen
    norm = p[base : base + 4]
    cu = p[base + 4 : base + 4 + n]
    cv = p[base + 4 + n : base + 4 + 2 * n]
    cfx = p[base + 4 + 2 * n : base + 7 + 3 * n]
    cfy = p[base + 7 + 3 * n : base + 10 + 4 * n]
    return norm, cu, cv, cfx, cfy


def _apply_tps_dir(norm, cu, cv, cfx, cfy, x, y):
    """Evaluate one TPS direction at flat float64 points, chunked so
    the (points × centers) temporaries stay bounded."""
    n = len(cu)
    u = (x - norm[0]) / norm[2]
    v = (y - norm[1]) / norm[3]
    ox = np.empty_like(u)
    oy = np.empty_like(u)
    step = max(1, _TPS_CHUNK_PAIRS // max(n, 1))
    for i0 in range(0, len(u), step):
        i1 = min(len(u), i0 + step)
        uu, vv = u[i0:i1], v[i0:i1]
        d2 = (uu[:, None] - cu[None, :]) ** 2 + (vv[:, None] - cv[None, :]) ** 2
        phi = _tps_phi(d2)
        ox[i0:i1] = cfx[0] + cfx[1] * uu + cfx[2] * vv + phi @ cfx[3:]
        oy[i0:i1] = cfy[0] + cfy[1] * uu + cfy[2] * vv + phi @ cfy[3:]
    return ox, oy


def _tps_inv_refined(p, wx, wy, refine):
    norm_i, cu_i, cv_i, cfx_i, cfy_i = _tps_dir_slices(p, 1)
    shape = wx.shape
    wxf, wyf = wx.ravel(), wy.ravel()
    px, py = _apply_tps_dir(norm_i, cu_i, cv_i, cfx_i, cfy_i, wxf, wyf)
    if refine:
        norm_f, cu, cv, cfx, cfy = _tps_dir_slices(p, 0)
        pcx, pcy, psx, psy = norm_f
        n = len(cu)
        step = max(1, _TPS_CHUNK_PAIRS // max(n, 1))
        for i0 in range(0, len(px), step):
            i1 = min(len(px), i0 + step)
            tx, ty = wxf[i0:i1], wyf[i0:i1]
            cpx, cpy = px[i0:i1], py[i0:i1]
            for _ in range(int(refine)):
                u = (cpx - pcx) / psx
                v = (cpy - pcy) / psy
                du = u[:, None] - cu[None, :]
                dv = v[:, None] - cv[None, :]
                d2 = du * du + dv * dv
                phi = _tps_phi(d2)
                fx = cfx[0] + cfx[1] * u + cfx[2] * v + phi @ cfx[3:] - tx
                fy = cfy[0] + cfy[1] * u + cfy[2] * v + phi @ cfy[3:] - ty
                # ∂φ/∂u = (u−uᵢ)(ln d² + 1), limit 0 at d²=0
                with np.errstate(divide="ignore", invalid="ignore"):
                    g = np.log(d2) + 1.0
                g = np.where(d2 > 0.0, g, 0.0)
                j11 = (cfx[1] + (du * g) @ cfx[3:]) / psx
                j12 = (cfx[2] + (dv * g) @ cfx[3:]) / psy
                j21 = (cfy[1] + (du * g) @ cfy[3:]) / psx
                j22 = (cfy[2] + (dv * g) @ cfy[3:]) / psy
                det = j11 * j22 - j12 * j21
                det = np.where(np.abs(det) < 1e-30, 1e-30, det)
                cpx = cpx - (j22 * fx - j12 * fy) / det
                cpy = cpy - (j11 * fy - j21 * fx) / det
            px[i0:i1], py[i0:i1] = cpx, cpy
    return px.reshape(shape), py.reshape(shape)


# --- generic record API (what raster.py / golden.py call) ------------------


def apply_gcp_fwd(p, px, py):
    """pixel → world through any GCP warp record (poly2/poly3/TPS)."""
    p = np.asarray(p, dtype=np.float64)
    kind, param = _record_kind(p)
    if kind == "poly":
        return _apply_poly(p[0:4], p[4 : 4 + 2 * _POLY_NB[param]], px, py, param)
    norm, cu, cv, cfx, cfy = _tps_dir_slices(p, 0)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    shape = px.shape
    ox, oy = _apply_tps_dir(norm, cu, cv, cfx, cfy, px.ravel(), py.ravel())
    return ox.reshape(shape), oy.reshape(shape)


def apply_gcp_inv(p, wx, wy, refine=2):
    """world → pixel through any GCP warp record.

    The fitted inverse is only a model (the true inverse of a
    polynomial/spline is not one of the same family); it seeds
    ``refine`` Newton steps against the FORWARD model (analytic 2×2
    Jacobian, vectorized), which drive the residual to float noise —
    the same exactness GDAL's iterative inverter provides. refine=0
    gives the raw fitted inverse."""
    p = np.asarray(p, dtype=np.float64)
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    kind, param = _record_kind(p)
    if kind == "poly":
        return _poly_inv_refined(p, wx, wy, param, refine)
    return _tps_inv_refined(p, wx, wy, refine)


# kept as the historical names (older call sites / tests)
apply_poly2_fwd = apply_gcp_fwd
apply_poly2_inv = apply_gcp_inv


# ---------------------------------------------------------------------------
# polygons (M7 / J2)
# ---------------------------------------------------------------------------


def point_in_polygon(xs, ys, ring):
    """Even-odd ray-casting PIP: points (xs, ys) vs one closed ring.

    ``ring`` is (n, 2) float array (closure optional). Vectorized over
    points; O(n_points × n_vertices) numpy ops."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    inside = np.zeros(xs.shape, dtype=bool)
    for i in range(len(ring)):
        cond = (y0[i] > ys) != (y1[i] > ys)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0[i] + (ys - y0[i]) * (x1[i] - x0[i]) / (y1[i] - y0[i])
        inside ^= cond & (xs < xint)
    return inside


def fill_polygon(ring, h, w, ss=1):
    """Rasterize a ring (pixel coords) into an (h, w) uint8 alpha mask.

    Even-odd scanline fill at pixel centers (x+0.5, y+0.5) — the
    deterministic stand-in for PIL ImageDraw.polygon. ``ss`` > 1 would
    supersample; 1 keeps golden/engine byte-equality trivial."""
    ring = np.asarray(ring, dtype=np.float64)
    mask = np.zeros((h, w), dtype=np.uint8)
    ys = np.arange(h, dtype=np.float64) + 0.5
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for r in range(h):
        y = ys[r]
        cond = (y0 > y) != (y1 > y)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0[cond] + (y - y0[cond]) * (x1[cond] - x0[cond]) / (
                y1[cond] - y0[cond]
            )
        xint = np.sort(xint)
        for j in range(0, len(xint) - 1, 2):
            a = int(np.ceil(xint[j] - 0.5))
            b = int(np.floor(xint[j + 1] - 0.5))
            # b >= 0 / a < w: a span entirely OFF-image must fill
            # nothing — without the b >= 0 guard a negative b+1 slice
            # end WRAPS and floods the row (latent until zonal rings,
            # which legitimately extend past the image, first hit it;
            # cutline rings are always in-image so golden byte-equality
            # is unaffected)
            if b >= a and b >= 0 and a < w:
                mask[r, max(a, 0) : min(b + 1, w)] = 255
    return mask


def fill_polygon_fast(ring, h, w):
    """Vectorized even-odd fill, bit-identical to :func:`fill_polygon`
    (property-tested): the edge×row intersection matrix is computed in
    one broadcast, rows with exactly TWO crossings — the overwhelming
    case for the convex-ish coverage rings — become a single pair of
    column-index comparisons over the whole (h, w) plane, and only
    rows with >2 crossings fall back to the scalar pair loop.
    fill_polygon stays the from-the-spec golden reference (cutline
    byte-equality); this is the hot-path twin for per-batch zonal
    masks where the fill runs once per (image, region) pair."""
    ring = np.asarray(ring, dtype=np.float64)
    mask = np.zeros((h, w), dtype=np.uint8)
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    ys = np.arange(h, dtype=np.float64) + 0.5  # pixel-center scanlines
    # crossing test per (edge, row): (y0 > y) != (y1 > y)
    c = (y0[:, None] > ys[None, :]) != (y1[:, None] > ys[None, :])
    n_cross = c.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        # SAME association order as fill_polygon — multiply THEN
        # divide — so the xint values are bit-identical by
        # construction, not just property-tested: a divide-first
        # form can differ by a ULP and flip the ceil/floor snap when
        # a crossing lands exactly on column+0.5 (ADVICE r4)
        xint_all = x0[:, None] + (ys[None, :] - y0[:, None]) * (
            x1 - x0
        )[:, None] / (y1 - y0)[:, None]
    cols = np.arange(w, dtype=np.float64)

    two = n_cross == 2
    if two.any():
        # extract the two crossings per qualifying row, vectorized:
        # mask non-crossing entries to ±inf and take min/max
        xm = np.where(c[:, two], xint_all[:, two], np.inf)
        lo = xm.min(axis=0)
        xm = np.where(c[:, two], xint_all[:, two], -np.inf)
        hi = xm.max(axis=0)
        a = np.ceil(lo - 0.5)  # same snap as fill_polygon
        b = np.floor(hi - 0.5)
        sel = (cols[None, :] >= a[:, None]) & (cols[None, :] <= b[:, None])
        mask[two] = sel.astype(np.uint8) * 255

    odd_rows = np.flatnonzero((n_cross > 2))
    for r in odd_rows:
        xint = np.sort(xint_all[c[:, r], r])
        for j in range(0, len(xint) - 1, 2):
            a = int(np.ceil(xint[j] - 0.5))
            b = int(np.floor(xint[j + 1] - 0.5))
            if b >= a and b >= 0 and a < w:  # same off-image guard
                mask[r, max(a, 0) : min(b + 1, w)] = 255
    return mask


def polygon_bbox(ring):
    ring = np.asarray(ring, dtype=np.float64)
    return ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max()


def segments_intersect_rect(ring, minx, miny, maxx, maxy):
    """True if any ring edge intersects the axis-aligned rect (coarse:
    via Cohen–Sutherland-style separating checks on each segment)."""
    ring = np.asarray(ring, dtype=np.float64)
    ax, ay = ring[:, 0], ring[:, 1]
    bx, by = np.roll(ax, -1), np.roll(ay, -1)
    # reject segments entirely on one side
    out = (
        ((ax < minx) & (bx < minx))
        | ((ax > maxx) & (bx > maxx))
        | ((ay < miny) & (by < miny))
        | ((ay > maxy) & (by > maxy))
    )
    if (~out).sum() == 0:
        return False
    # for remaining segments, do a straddle test against the 4 rect edges
    cand = ~out
    ax, ay, bx, by = ax[cand], ay[cand], bx[cand], by[cand]
    # endpoint inside rect?
    if (
        ((ax >= minx) & (ax <= maxx) & (ay >= miny) & (ay <= maxy))
        | ((bx >= minx) & (bx <= maxx) & (by >= miny) & (by <= maxy))
    ).any():
        return True
    corners = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]], dtype=np.float64
    )
    dx, dy = bx - ax, by - ay
    for k in range(4):
        cx0, cy0 = corners[k]
        cx1, cy1 = corners[(k + 1) % 4]
        d1 = dx * (cy0 - ay) - dy * (cx0 - ax)
        d2 = dx * (cy1 - ay) - dy * (cx1 - ax)
        ex, ey = cx1 - cx0, cy1 - cy0
        d3 = ex * (ay - cy0) - ey * (ax - cx0)
        d4 = ex * (by - cy0) - ey * (bx - cx0)
        if ((d1 * d2 <= 0) & (d3 * d4 <= 0)).any():
            return True
    return False


def polygon_dist2_to_points(xs, ys, ring):
    """Squared distance from each point to the ring boundary (min over
    segments). Used for the kNN 'missed by ≤ ε' epsilon test (J3)."""
    xs = np.asarray(xs, dtype=np.float64)[:, None]
    ys = np.asarray(ys, dtype=np.float64)[:, None]
    ring = np.asarray(ring, dtype=np.float64)
    ax, ay = ring[None, :, 0], ring[None, :, 1]
    bx, by = np.roll(ring[:, 0], -1)[None, :], np.roll(ring[:, 1], -1)[None, :]
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    t = np.clip(((xs - ax) * dx + (ys - ay) * dy) / np.where(seg2 == 0, 1, seg2), 0, 1)
    px, py = ax + t * dx, ay + t * dy
    return np.min((xs - px) ** 2 + (ys - py) ** 2, axis=1)


# ---------------------------------------------------------------------------
# quadtree cell index (T3)
# ---------------------------------------------------------------------------


def cell_of_merc(mx, my, level):
    """Mercator point → quadtree cell id at ``level`` (= tile_key at z=level)."""
    tx, ty = tg.merc_to_tile(mx, my, level)
    return tg.pack_key(np.full_like(tx, level), tx, ty)


def cover_ring_merc(ring, level):
    """Covering cells of a mercator-coords ring at ``level``.

    Candidate cells from the bbox; kept if the cell center is inside
    the ring, a ring vertex is inside the cell, or a ring edge crosses
    the cell — a conservative superset (prefilter only; exact PIP
    follows downstream)."""
    minx, miny, maxx, maxy = polygon_bbox(ring)
    xs, ys = tg.tiles_overlapping_bbox(minx, miny, maxx, maxy, level)
    keep = np.zeros(len(xs), dtype=bool)
    bminx, bminy, bmaxx, bmaxy = tg.tile_bounds_merc(level, xs, ys)
    # cell center inside ring
    cx, cy = (bminx + bmaxx) / 2, (bminy + bmaxy) / 2
    keep |= point_in_polygon(cx, cy, ring)
    # ring vertex inside cell
    for vx, vy in np.asarray(ring, dtype=np.float64):
        keep |= (vx >= bminx) & (vx <= bmaxx) & (vy >= bminy) & (vy <= bmaxy)
    # edge crosses cell (only check cells still unkept)
    for i in np.flatnonzero(~keep):
        keep[i] = segments_intersect_rect(
            ring, bminx[i], bminy[i], bmaxx[i], bmaxy[i]
        )
    lv = np.full(len(xs), level, dtype=np.int64)
    return tg.pack_key(lv[keep], xs[keep], ys[keep])


class CoverageIndex:
    """Broadcastable spatial index over the small coverage table (J2/J3).

    Built once per actor (T3) from a ``ray.put`` of the coverage rows:
    an inverted map cell_id → region ordinals for the PIP prefilter,
    region centroid array for the kNN fallback, and the raw rings for
    the exact test. Pure-python/numpy — safely serializable.
    """

    def __init__(self, region_ids, rings, level=7):
        self.level = level
        self.region_ids = list(region_ids)
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        self.centroids = np.array(
            [r.mean(axis=0) for r in self.rings], dtype=np.float64
        )
        self.cell_to_regions = {}
        for ordinal, ring in enumerate(self.rings):
            for cid in cover_ring_merc(ring, level):
                self.cell_to_regions.setdefault(int(cid), []).append(ordinal)

    def candidates(self, mx, my):
        """Per-point candidate region-ordinal lists via the cell index."""
        cells = cell_of_merc(mx, my, self.level)
        return [self.cell_to_regions.get(int(c), ()) for c in cells]

    def assign(self, mx, my, knn_eps=None):
        """Exact region assignment per point: cell prefilter + PIP;
        ties broken by lowest region ordinal (deterministic).

        Returns int64 array of region ordinals, -1 where unmatched.
        With ``knn_eps`` set, unmatched points within ``knn_eps`` meters
        of any candidate-or-global ring fall back to the nearest region
        centroid (J3 kNN fallback, k=1 assignment semantics)."""
        mx = np.asarray(mx, dtype=np.float64)
        my = np.asarray(my, dtype=np.float64)
        out = np.full(mx.shape, -1, dtype=np.int64)
        cand_lists = self.candidates(mx, my)
        # group points by identical candidate tuple → vectorized PIP per region
        by_region = {}
        for i, cands in enumerate(cand_lists):
            for ordinal in cands:
                by_region.setdefault(ordinal, []).append(i)
        for ordinal in sorted(by_region):
            idx = np.array(by_region[ordinal], dtype=np.int64)
            unset = idx[out[idx] == -1]
            if len(unset) == 0:
                continue
            hit = point_in_polygon(mx[unset], my[unset], self.rings[ordinal])
            out[unset[hit]] = ordinal
        if knn_eps is not None:
            miss = np.flatnonzero(out == -1)
            if len(miss):
                d2 = np.stack(
                    [
                        polygon_dist2_to_points(mx[miss], my[miss], ring)
                        for ring in self.rings
                    ],
                    axis=1,
                )
                nearest = np.argmin(d2, axis=1)
                near_enough = d2[np.arange(len(miss)), nearest] <= knn_eps**2
                out[miss[near_enough]] = nearest[near_enough]
        return out

    def knn(self, mx, my, k=1):
        """k nearest region ordinals by centroid distance (brute force
        over the broadcast centroid array — J3)."""
        mx = np.asarray(mx, dtype=np.float64)[:, None]
        my = np.asarray(my, dtype=np.float64)[:, None]
        d2 = (self.centroids[None, :, 0] - mx) ** 2 + (
            self.centroids[None, :, 1] - my
        ) ** 2
        if k == 1:
            return np.argmin(d2, axis=1)[:, None]
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(d2.shape[0])[:, None]
        order = np.argsort(d2[rows, part], axis=1, kind="stable")
        return part[rows, order]
