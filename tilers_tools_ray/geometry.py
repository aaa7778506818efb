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
# order-2 polynomial GCP transform (M3 extension)
#
# The reference handles ≥3 GCPs with GDAL's polynomial warps
# (``gdal_translate -gcp`` + ``-order N`` in reader_backend.py's
# MapTranslator path [R]); scanned paper charts need order 2. The
# engine fits BOTH directions (pixel→world for footprints, world→pixel
# for the warp) directly from the GCPs by normalized least squares —
# no iterative inversion. Record layout (flat float64[32], stored as a
# nullable list column next to the affine ``gt``):
#
#   [0:4]   pixel normalization  (pcx, pcy, psx, psy)
#   [4:16]  forward coeffs ax[6], ay[6] over basis (1, u, v, u², uv, v²)
#           with u = (px−pcx)/psx, v = (py−pcy)/psy → (wx, wy)
#   [16:20] world normalization  (wcx, wcy, wsx, wsy)
#   [20:32] inverse coeffs bx[6], by[6] (same basis over normalized
#           world) → (px, py)
#
# Normalizing to ±O(1) before squaring keeps the normal equations
# conditioned even for mercator-meter world coords (~1e7 raw, ~1e14
# squared — unusable unnormalized in float64 lstsq).
# ---------------------------------------------------------------------------

POLY2_LEN = 32


def _poly2_basis(u, v):
    return np.stack(
        [np.ones_like(u), u, v, u * u, u * v, v * v], axis=-1
    )


def _fit_poly2_dir(sx, sy, tx, ty):
    """One direction: (sx, sy) → (tx, ty). Returns (norm[4], coef[12])."""
    cx, cy = float(sx.mean()), float(sy.mean())
    scx = float(np.abs(sx - cx).max()) or 1.0
    scy = float(np.abs(sy - cy).max()) or 1.0
    a = _poly2_basis((sx - cx) / scx, (sy - cy) / scy)
    ctx, *_ = np.linalg.lstsq(a, tx, rcond=None)
    cty, *_ = np.linalg.lstsq(a, ty, rcond=None)
    return np.array([cx, cy, scx, scy]), np.concatenate([ctx, cty])


def solve_poly2(px, py, wx, wy):
    """Least-squares order-2 polynomial fit from ≥6 GCPs, both
    directions. Returns the flat float64[POLY2_LEN] record above.
    Raises ValueError below 6 GCPs (the quadratic is underdetermined —
    callers fall back to solve_affine)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    if len(px) < 6:
        raise ValueError("need ≥6 GCPs for an order-2 polynomial solve")
    fn, fc = _fit_poly2_dir(px, py, wx, wy)
    inorm, ic = _fit_poly2_dir(wx, wy, px, py)
    return np.concatenate([fn, fc, inorm, ic])


def _apply_poly2(norm, coef, x, y):
    u = (np.asarray(x, dtype=np.float64) - norm[0]) / norm[2]
    v = (np.asarray(y, dtype=np.float64) - norm[1]) / norm[3]
    b = _poly2_basis(u, v)
    return b @ coef[:6], b @ coef[6:]


def apply_poly2_fwd(p, px, py):
    """pixel → world through a solve_poly2 record."""
    p = np.asarray(p, dtype=np.float64)
    return _apply_poly2(p[0:4], p[4:16], px, py)


def apply_poly2_inv(p, wx, wy, refine=2):
    """world → pixel through a solve_poly2 record.

    The fitted inverse quadratic is only a model (the true inverse of
    a quadratic is not one); it seeds ``refine`` Newton steps against
    the FORWARD polynomial (analytic 2×2 Jacobian, vectorized), which
    drive the residual to float noise — the same exactness GDAL's
    iterative polynomial inverter provides. refine=0 gives the raw
    fitted inverse."""
    p = np.asarray(p, dtype=np.float64)
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    px, py = _apply_poly2(p[16:20], p[20:32], wx, wy)
    if refine:
        pcx, pcy, psx, psy = p[0:4]
        ax, ay = p[4:10], p[10:16]
        for _ in range(int(refine)):
            u = (px - pcx) / psx
            v = (py - pcy) / psy
            b = _poly2_basis(u, v)
            fx = b @ ax - wx
            fy = b @ ay - wy
            # d/du basis = (0, 1, 0, 2u, v, 0); d/dv = (0, 0, 1, 0, u, 2v)
            j11 = (ax[1] + 2.0 * ax[3] * u + ax[4] * v) / psx
            j12 = (ax[2] + ax[4] * u + 2.0 * ax[5] * v) / psy
            j21 = (ay[1] + 2.0 * ay[3] * u + ay[4] * v) / psx
            j22 = (ay[2] + ay[4] * u + 2.0 * ay[5] * v) / psy
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            px = px - (j22 * fx - j12 * fy) / det
            py = py - (j11 * fy - j21 * fx) / det
    return px, py


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
            if b >= a:
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
