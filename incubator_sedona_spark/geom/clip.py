"""General polygon overlay (Boolean ops) for arbitrary simple polygons.

Replaces the convex-only Sutherland-Hodgman path with a full overlay that
handles CONCAVE, HOLED and MULTI polygon inputs — the engine's analog of the
reference's JTS-backed ST_Intersection / ST_Union / ST_Difference /
ST_SymDifference (/root/reference/sql/common/.../UDF/Catalog.scala:72-75) and
the dissolving ST_Union_Aggr (AggregateFunctions.scala:56-70).

Approach (overlay by edge classification, the classic planar-subdivision
recipe):

1. A polygonal geometry is held as a flat list of rings interpreted with the
   EVEN-ODD fill rule — shells, holes and nested islands need no special
   casing anywhere in the pipeline.
2. Every input edge is split at every intersection with the other operand's
   edges (proper crossings, T-junctions, endpoint touches, collinear-overlap
   endpoints), all computed vectorized in numpy.
3. A sub-edge belongs to the result boundary iff the result predicate
   (a&b, a|b, a&~b, a^b — or any(covered) for N-ary union) DIFFERS between
   the two points offset eps off the edge midpoint on either side.  This one
   rule uniformly handles interiors, exteriors and shared/collinear edges.
4. Kept sub-edges (deduplicated by canonical key) are stitched into closed
   rings by endpoint adjacency; with even-odd semantics ANY decomposition of
   the boundary multigraph into closed walks denotes the same region, which
   makes the stitch robust to multi-junction vertices.
5. Rings are nested by containment depth (even = shell, odd = hole of the
   smallest containing shell) to emit proper Polygon/MultiPolygon WKB.

Robustness model (round 4): offsets use an eps derived from the input
extent (1e-9 relative); side-classification probes sit 16*eps off each
sub-edge midpoint.  When any probe lands within that offset of ANOTHER edge
its side answer is unreliable — that exact condition is now DETECTED
(_probe_hazard, bucketed point-to-edge distances) and the overlay re-runs
once on inputs snapped to a 32*eps grid (the JTS GeometryPrecisionReducer /
snap-rounding analog): nearly-coincident features become exactly coincident
(shared-edge dedup handles them) or separated by >= one grid cell (probes
classify reliably).  Features finer than 32*eps relative*extent therefore
collapse DETERMINISTICALLY instead of misclassifying — the precision-
reduction contract, with area error bounded by grid*perimeter.  The
property fuzzer in test_geom_kernel exercises coordinates 100x finer than
the old documented ~1e-7-relative floor.
"""

from __future__ import annotations

import numpy as np

from incubator_sedona_spark.geom import wkb as W

_REL_EPS = 1e-9


def rings_of_geometry(g: W.Geometry) -> list[np.ndarray]:
    """All rings (closed (n,2) arrays) of a polygonal geometry — even-odd region."""
    rings = []
    for leaf in g.leaves():
        if leaf.kind == W.POLYGON:
            rings.extend(leaf.parts)
    return rings


def _edges_of_rings(rings: list[np.ndarray]) -> np.ndarray:
    segs = [np.column_stack([r[:-1], r[1:]]) for r in rings if len(r) >= 2]
    if not segs:
        return np.empty((0, 4))
    e = np.concatenate(segs, axis=0)
    # drop zero-length edges (repeated vertices)
    keep = (e[:, 0] != e[:, 2]) | (e[:, 1] != e[:, 3])
    return e[keep]


def _scale_of(*edge_sets: np.ndarray) -> float:
    m = 1.0
    for e in edge_sets:
        if len(e):
            m = max(m, float(np.abs(e).max()))
    return m


def _eo_inside(edges: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Even-odd point-in-region for (m,2) points vs region edges (e,4).
    Chunked over points to bound the (e x m) broadcast."""
    if len(edges) == 0 or len(pts) == 0:
        return np.zeros(len(pts), dtype=bool)
    chunk = max(64, int(4e6 // len(edges)))
    if len(pts) > chunk:
        return np.concatenate(
            [_eo_inside(edges, pts[s : s + chunk]) for s in range(0, len(pts), chunk)]
        )
    x1, y1, x2, y2 = edges[:, 0:1], edges[:, 1:2], edges[:, 2:3], edges[:, 3:4]
    px, py = pts[:, 0][None, :], pts[:, 1][None, :]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = cond & (px < xint)
    return (np.sum(crossings, axis=0) % 2).astype(bool)


def _bucket_ids(x0, y0, x1, y1, minx, miny, c):
    """Inclusive cell-index ranges for bboxes on a uniform grid of size c."""
    ix0 = np.floor((x0 - minx) / c).astype(np.int64)
    ix1 = np.floor((x1 - minx) / c).astype(np.int64)
    iy0 = np.floor((y0 - miny) / c).astype(np.int64)
    iy1 = np.floor((y1 - miny) / c).astype(np.int64)
    return ix0, ix1, iy0, iy1


def _candidate_pairs(E: np.ndarray, Fs: np.ndarray, eps: float):
    """(i, j) index arrays of E/F edge pairs whose bboxes may interact —
    uniform-grid bucketing, OUTPUT-sensitive instead of the |E|x|F| broadcast
    (all-pairs ufunc passes dominate wall time on big edge sets)."""
    ex0 = np.minimum(E[:, 0], E[:, 2]) - eps
    ex1 = np.maximum(E[:, 0], E[:, 2]) + eps
    ey0 = np.minimum(E[:, 1], E[:, 3]) - eps
    ey1 = np.maximum(E[:, 1], E[:, 3]) + eps
    fx0 = np.minimum(Fs[:, 0], Fs[:, 2])
    fx1 = np.maximum(Fs[:, 0], Fs[:, 2])
    fy0 = np.minimum(Fs[:, 1], Fs[:, 3])
    fy1 = np.maximum(Fs[:, 1], Fs[:, 3])
    minx = min(ex0.min(), fx0.min())
    miny = min(ey0.min(), fy0.min())
    c = max(
        float(np.median(ex1 - ex0)),
        float(np.median(ey1 - ey0)),
        float(np.median(fx1 - fx0)),
        float(np.median(fy1 - fy0)),
        eps * 16,
    )
    fix0, fix1, fiy0, fiy1 = _bucket_ids(fx0, fy0, fx1, fy1, minx, miny, c)
    buckets: dict[tuple, list[int]] = {}
    for j in range(len(Fs)):
        for gx in range(fix0[j], fix1[j] + 1):
            for gy in range(fiy0[j], fiy1[j] + 1):
                buckets.setdefault((gx, gy), []).append(j)
    eix0, eix1, eiy0, eiy1 = _bucket_ids(ex0, ey0, ex1, ey1, minx, miny, c)
    pi: list[int] = []
    pj: list[int] = []
    for i in range(len(E)):
        cand: set[int] = set()
        for gx in range(eix0[i], eix1[i] + 1):
            for gy in range(eiy0[i], eiy1[i] + 1):
                cand.update(buckets.get((gx, gy), ()))
        for j in cand:
            pi.append(i)
            pj.append(j)
    if not pi:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    i_arr = np.asarray(pi, dtype=np.int64)
    j_arr = np.asarray(pj, dtype=np.int64)
    # exact bbox-overlap filter on the candidate list
    ok = (
        (ex0[i_arr] <= fx1[j_arr]) & (fx0[j_arr] <= ex1[i_arr])
        & (ey0[i_arr] <= fy1[j_arr]) & (fy0[j_arr] <= ey1[i_arr])
    )
    return i_arr[ok], j_arr[ok]


def _split_params(E: np.ndarray, Fs: np.ndarray, eps: float) -> list[np.ndarray]:
    """For each edge of E, the sorted t-parameters in (0,1) where edges of Fs
    cross or touch it (proper crossings + F endpoints on the edge).

    Pair-pruned via grid bucketing: the intersection math runs over the
    bbox-overlapping pair LIST, never an |E| x |F| matrix."""
    m = len(E)
    if m == 0 or len(Fs) == 0:
        return [np.empty(0)] * m
    i_arr, j_arr = _candidate_pairs(E, Fs, eps)
    out: list[list[float]] = [[] for _ in range(m)]
    if len(i_arr):
        ax, ay = E[i_arr, 0], E[i_arr, 1]
        bx, by = E[i_arr, 2], E[i_arr, 3]
        cx, cy = Fs[j_arr, 0], Fs[j_arr, 1]
        dx, dy = Fs[j_arr, 2], Fs[j_arr, 3]
        rx, ry = bx - ax, by - ay
        sx, sy = dx - cx, dy - cy
        denom = rx * sy - ry * sx
        qpx, qpy = cx - ax, cy - ay
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (qpx * sy - qpy * sx) / denom
            u = (qpx * ry - qpy * rx) / denom
        proper = (np.abs(denom) > eps) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
        for k in np.nonzero(proper)[0]:
            out[i_arr[k]].append(float(t[k]))
        # F endpoints lying on the E edge (T-junction / collinear overlap)
        ll = rx * rx + ry * ry
        for px_, py_ in ((cx, cy), (dx, dy)):
            with np.errstate(divide="ignore", invalid="ignore"):
                tp = ((px_ - ax) * rx + (py_ - ay) * ry) / ll
            tpc = np.clip(tp, 0.0, 1.0)
            qx, qy = ax + tpc * rx, ay + tpc * ry
            d2 = (px_ - qx) ** 2 + (py_ - qy) ** 2
            on = (d2 <= eps * eps) & (tpc > 0) & (tpc < 1)
            for k in np.nonzero(on)[0]:
                out[i_arr[k]].append(float(tpc[k]))
    return [np.unique(np.asarray(v)) if v else np.empty(0) for v in out]


def _subdivide(E: np.ndarray, params: list[np.ndarray]) -> np.ndarray:
    subs = []
    for i in range(len(E)):
        a = E[i, 0:2]
        b = E[i, 2:4]
        ts = np.concatenate([[0.0], params[i], [1.0]])
        pts = a[None, :] + ts[:, None] * (b - a)[None, :]
        subs.append(np.column_stack([pts[:-1], pts[1:]]))
    return np.concatenate(subs, axis=0) if subs else np.empty((0, 4))


def _eo_inside_bboxed(edges: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """_eo_inside restricted to points within the region's bbox — regions in
    an N-ary union are typically small relative to the full sub-edge set, so
    this cuts the (edges x points) broadcast to the local neighborhood."""
    if len(edges) == 0 or len(pts) == 0:
        return np.zeros(len(pts), dtype=bool)
    bx0 = min(edges[:, 0].min(), edges[:, 2].min())
    bx1 = max(edges[:, 0].max(), edges[:, 2].max())
    by0 = min(edges[:, 1].min(), edges[:, 3].min())
    by1 = max(edges[:, 1].max(), edges[:, 3].max())
    cand = (pts[:, 0] >= bx0) & (pts[:, 0] <= bx1) & (pts[:, 1] >= by0) & (pts[:, 1] <= by1)
    out = np.zeros(len(pts), dtype=bool)
    idx = np.nonzero(cand)[0]
    if len(idx):
        out[idx] = _eo_inside(edges, pts[idx])
    return out


def _keep_mask(
    subs: np.ndarray, region_edges: list[np.ndarray], pred, eps: float
) -> np.ndarray:
    """Result-boundary test: predicate differs across the two offset sides."""
    if len(subs) == 0:
        return np.zeros(0, dtype=bool)
    dx, dy = subs[:, 2] - subs[:, 0], subs[:, 3] - subs[:, 1]
    ln = np.hypot(dx, dy)
    ok = ln > 0
    ln = np.where(ok, ln, 1.0)
    mx = (subs[:, 0] + subs[:, 2]) / 2.0
    my = (subs[:, 1] + subs[:, 3]) / 2.0
    nx, ny = -dy / ln, dx / ln
    off = eps * 16.0
    p1 = np.column_stack([mx + nx * off, my + ny * off])
    p2 = np.column_stack([mx - nx * off, my - ny * off])
    in1 = [_eo_inside_bboxed(e, p1) for e in region_edges]
    in2 = [_eo_inside_bboxed(e, p2) for e in region_edges]
    return ok & (pred(in1) != pred(in2))


def _stitch(subs: np.ndarray, eps: float) -> list[np.ndarray]:
    """Close kept sub-edges into non-crossing rings.

    Face-tracing walk: at every junction the next edge is the unused edge with
    the smallest counter-clockwise turn from the reversed incoming direction.
    A consistent turn rule decomposes the boundary multigraph into planar
    faces, so emitted rings never cross each other — required for the
    shell/hole nesting step (a symmetric-difference boundary, for example,
    contains every input edge and WOULD stitch into crossing loops under an
    arbitrary-successor walk)."""
    if len(subs) == 0:
        return []
    q = eps * 8.0

    # Endpoint canonicalization.  Bare round(x/q) is unstable when a
    # coordinate sits ON a cell boundary: two copies of the same point
    # differing by 1e-17 of roundoff straddle the .5 and get DIFFERENT
    # keys, so the ring never closes (found by the round-4 fuzzer at
    # x = 3e-05 with q = 8e-07 — x/q = 37.5 exactly).  Instead, each new
    # point adopts the key of any already-registered point within one cell
    # (3x3 neighborhood probe), so near-identical points always share one
    # canonical key regardless of where the grid lines fall.
    reps: dict[tuple, tuple] = {}

    def key(x: float, y: float):
        kx, ky = round(x / q), round(y / q)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                k = (kx + dx, ky + dy)
                r = reps.get(k)
                if r is not None and abs(x - r[0]) <= q and abs(y - r[1]) <= q:
                    return k
        reps[(kx, ky)] = (x, y)
        return (kx, ky)

    # dedup shared edges (kept once regardless of how many operands carry them)
    seen = {}
    for i in range(len(subs)):
        k1, k2 = key(subs[i, 0], subs[i, 1]), key(subs[i, 2], subs[i, 3])
        if k1 == k2:
            continue
        ek = (k1, k2) if k1 < k2 else (k2, k1)
        if ek not in seen:
            seen[ek] = (subs[i, 0:2], subs[i, 2:4], k1, k2)
    adj: dict[tuple, list] = {}
    edges = list(seen.values())
    used = [False] * len(edges)
    for idx, (_, _, k1, k2) in enumerate(edges):
        adj.setdefault(k1, []).append(idx)
        adj.setdefault(k2, []).append(idx)

    def _other(idx, k):
        pa, pb, ka, kb = edges[idx]
        return (pb, kb) if ka == k else (pa, ka)

    rings = []
    for start in range(len(edges)):
        if used[start]:
            continue
        p_a, p_b, k_a, k_b = edges[start]
        used[start] = True
        ring_pts = [p_a, p_b]
        cur_key, start_key = k_b, k_a
        cur_pt, prev_pt = p_b, p_a
        while cur_key != start_key:
            cands = [i for i in adj.get(cur_key, ()) if not used[i]]
            if not cands:
                break  # dangling chain (numeric residue): drop it
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # smallest CCW turn from the reversed incoming direction
                back = np.arctan2(prev_pt[1] - cur_pt[1], prev_pt[0] - cur_pt[0])
                best, best_ang = None, np.inf
                for i in cands:
                    op, _ = _other(i, cur_key)
                    ang = (
                        np.arctan2(op[1] - cur_pt[1], op[0] - cur_pt[0]) - back
                    ) % (2.0 * np.pi)
                    if ang < 1e-12:
                        ang = 2.0 * np.pi  # avoid immediate backtrack
                    if ang < best_ang:
                        best, best_ang = i, ang
                nxt = best
            used[nxt] = True
            op, ok = _other(nxt, cur_key)
            ring_pts.append(op)
            prev_pt, cur_pt, cur_key = cur_pt, op, ok
        if cur_key == start_key and len(ring_pts) >= 4:
            ring_pts[-1] = ring_pts[0]  # exact closure
            rings.append(np.asarray(ring_pts))
    return rings


def _ring_interior_point(ring: np.ndarray, eps: float) -> np.ndarray:
    """A point just inside the ring (midpoint of its longest edge, offset to
    whichever side even-odd says is interior)."""
    e = np.column_stack([ring[:-1], ring[1:]])
    lens = np.hypot(e[:, 2] - e[:, 0], e[:, 3] - e[:, 1])
    i = int(np.argmax(lens))
    mx, my = (e[i, 0] + e[i, 2]) / 2.0, (e[i, 1] + e[i, 3]) / 2.0
    dx, dy = e[i, 2] - e[i, 0], e[i, 3] - e[i, 1]
    ln = max(lens[i], eps)
    nx, ny = -dy / ln, dx / ln
    off = eps * 16.0
    cand = np.array([[mx + nx * off, my + ny * off], [mx - nx * off, my - ny * off]])
    ins = _eo_inside(e, cand)
    return cand[0] if ins[0] else cand[1]


def rings_to_geometry(rings: list[np.ndarray], eps: float) -> W.Geometry:
    """Assemble even-odd rings into nested Polygon/MultiPolygon WKB structure."""
    if not rings:
        return W.multi(W.GEOMETRYCOLLECTION, [])
    pts = np.array([_ring_interior_point(r, eps) for r in rings])
    n = len(rings)
    ring_edges = [np.column_stack([r[:-1], r[1:]]) for r in rings]
    depth = np.zeros(n, dtype=int)
    parents = [-1] * n
    areas = [abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])) / 2.0) for r in rings]
    for i in range(n):
        best_area = np.inf
        for j in range(n):
            if i == j:
                continue
            if _eo_inside(ring_edges[j], pts[i : i + 1])[0]:
                depth[i] += 1
                # candidate parent: smallest containing ring
                if areas[j] < best_area:
                    best_area = areas[j]
                    parents[i] = j
    polys = []
    shell_poly = {}
    for i in range(n):
        if depth[i] % 2 == 0:
            shell_poly[i] = [rings[i]]
    for i in range(n):
        if depth[i] % 2 == 1 and parents[i] in shell_poly:
            shell_poly[parents[i]].append(rings[i])
    for i, parts in shell_poly.items():
        polys.append(W.Geometry(W.POLYGON, parts))
    if len(polys) == 1:
        return polys[0]
    return W.multi(W.MULTIPOLYGON, polys)


_SNAP_FACTOR = 32.0


def _probe_hazard(subs: np.ndarray, all_edges: np.ndarray, eps: float) -> bool:
    """True iff any side-classification probe point lies closer than its own
    offset (16*eps) to some edge — the regime where _keep_mask's answers can
    flip and the overlay must fall back to snap rounding.  A probe is always
    exactly 16*eps from its OWN edge (and from exactly-coincident
    duplicates), so those never trigger; only genuinely nearer edges do.
    Bucketed: cost O(|probes| + |edges| + near pairs), never a broadcast."""
    if len(subs) == 0 or len(all_edges) == 0:
        return False
    dx, dy = subs[:, 2] - subs[:, 0], subs[:, 3] - subs[:, 1]
    ln = np.hypot(dx, dy)
    # sub-edges shorter than the stitch quantization (8*eps) collapse to a
    # point there and cannot carry a region boundary; probing them would
    # place the probe effectively ON the junction they came from (T-split
    # roundoff fragments have lengths ~1e-19) and fire falsely on every
    # junction-adjacent edge.  Hazard only matters for edges long enough to
    # survive stitching — use 64*eps (4x the probe offset) as the floor.
    okl = ln > eps * 64.0
    ln = np.where(okl, ln, 1.0)
    mx = (subs[:, 0] + subs[:, 2]) / 2.0
    my = (subs[:, 1] + subs[:, 3]) / 2.0
    nx, ny = -dy / ln, dx / ln
    off = eps * 16.0
    px = np.concatenate([mx + nx * off, mx - nx * off])[np.concatenate([okl, okl])]
    py = np.concatenate([my + ny * off, my - ny * off])[np.concatenate([okl, okl])]
    probes = np.column_stack([px, py, px, py])  # degenerate edges for bucketing
    i_arr, j_arr = _candidate_pairs(probes, all_edges, off)
    if not len(i_arr):
        return False
    ax, ay = all_edges[j_arr, 0], all_edges[j_arr, 1]
    bx, by = all_edges[j_arr, 2], all_edges[j_arr, 3]
    rx, ry = bx - ax, by - ay
    ll = rx * rx + ry * ry
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px[i_arr] - ax) * rx + (py[i_arr] - ay) * ry) / ll
    t = np.clip(np.where(ll > 0, t, 0.0), 0.0, 1.0)
    qx, qy = ax + t * rx, ay + t * ry
    d = np.hypot(px[i_arr] - qx, py[i_arr] - qy)
    # 0.1% margin: a probe's distance to its OWN edge computes as off with
    # ~1e-9 relative roundoff and must not fire; separations below off/1000
    # sit far inside the stitch quantization (8*eps) and are handled as
    # exactly coincident there
    return bool(np.any(d < off * 0.999))


def _snap_ring_sets(ring_sets: list[list[np.ndarray]], q: float) -> list[list[np.ndarray]]:
    """Round every vertex to the q-grid; drop collapsed vertices/rings.
    Deterministic precision reduction — the snap-rounding input transform."""
    out_sets = []
    for rs in ring_sets:
        out = []
        for r in rs:
            s = np.round(np.asarray(r, np.float64) / q) * q
            keep = np.ones(len(s), dtype=bool)
            keep[1:] = (s[1:] != s[:-1]).any(axis=1)
            s = s[keep]
            if len(s) == 0:
                continue
            if (s[0] != s[-1]).any():
                s = np.vstack([s, s[:1]])
            if len(s) >= 4:
                out.append(s)
        out_sets.append(out)
    return out_sets


_PREDS = {
    "intersection": lambda ins: ins[0] & ins[1],
    "union": lambda ins: ins[0] | ins[1],
    "difference": lambda ins: ins[0] & ~ins[1],
    "symdifference": lambda ins: ins[0] ^ ins[1],
}


def overlay_rings(
    a_rings: list[np.ndarray], b_rings: list[np.ndarray], op: str,
    _snapped: bool = False,
) -> list[np.ndarray]:
    """Boolean overlay of two even-odd ring sets; returns result rings.

    Falls back ONCE to snap-rounded inputs when the probe-hazard detector
    fires (see module docstring) — deterministic precision reduction instead
    of a silent sliver misclassification."""
    ea, eb = _edges_of_rings(a_rings), _edges_of_rings(b_rings)
    eps = _scale_of(ea, eb) * _REL_EPS
    sa = _subdivide(ea, _split_params(ea, eb, eps))
    sb = _subdivide(eb, _split_params(eb, ea, eps))
    if not _snapped:
        all_e = np.concatenate([ea, eb], axis=0) if len(ea) and len(eb) else (
            ea if len(ea) else eb
        )
        if _probe_hazard(sa, all_e, eps) or _probe_hazard(sb, all_e, eps):
            a2, b2 = _snap_ring_sets([a_rings, b_rings], eps * _SNAP_FACTOR)
            return overlay_rings(a2, b2, op, _snapped=True)
    pred = _PREDS[op]
    keep_a = _keep_mask(sa, [ea, eb], pred, eps)
    keep_b = _keep_mask(sb, [ea, eb], pred, eps)
    kept = np.concatenate([sa[keep_a], sb[keep_b]], axis=0)
    return _stitch(kept, eps)


def overlay_geoms(a: W.Geometry, b: W.Geometry, op: str) -> W.Geometry:
    ra, rb = rings_of_geometry(a), rings_of_geometry(b)
    ea, eb = _edges_of_rings(ra), _edges_of_rings(rb)
    eps = _scale_of(ea, eb) * _REL_EPS
    return rings_to_geometry(overlay_rings(ra, rb, op), eps)


def union_many(
    ring_sets: list[list[np.ndarray]], _snapped: bool = False
) -> list[np.ndarray]:
    """Dissolving union of N even-odd regions (the ST_Union_Aggr kernel).

    All edges are split against the union of everyone else's edges; a sub-edge
    survives iff the covered-by-at-least-one predicate differs across its two
    sides.  One pass, no pairwise fold — cost is bounded by the total edge
    count and the number of edge crossings, not by N^2 region pairs.
    Same snap-rounding fallback as overlay_rings.
    """
    per_region = [_edges_of_rings(rs) for rs in ring_sets]
    per_region = [e for e in per_region if len(e)]
    if not per_region:
        return []
    all_edges = np.concatenate(per_region, axis=0)
    eps = _scale_of(all_edges) * _REL_EPS
    subs = _subdivide(all_edges, _split_params(all_edges, all_edges, eps))
    if not _snapped and _probe_hazard(subs, all_edges, eps):
        return union_many(
            _snap_ring_sets(ring_sets, eps * _SNAP_FACTOR), _snapped=True
        )
    pred = lambda ins: np.any(np.stack(ins, axis=0), axis=0) if ins else None
    keep = _keep_mask(subs, per_region, pred, eps)
    return _stitch(subs[keep], eps)
