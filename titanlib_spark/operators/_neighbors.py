"""Output-sensitive neighbor queries inside one SCT kernel group.

The SCT-family kernels sweep centroids and, per centroid, need "all
points within ``outer_radius``, truncated to the ``num_max`` nearest
(ties broken by id)" — the reference's KD-tree radius query
(src/util.cpp:238-268). The naive vectorized scan is O(n_cell) per
centroid, i.e. O(n_cell^2 / num_max) per cell after the checked-memo:
fine for ordinary cells, quadratic for an urban-density cell holding tens
of thousands of DISTINCT locations (the co-located-duplicate memo only
collapses exact twins).

``CellNeighborhood`` keeps the exact semantics and bit-identical numerics
while making the per-query cost proportional to the answer size:

* below ``dense_threshold`` rows it IS the vectorized scan (same code
  path as before — zero behavior or perf change for normal cells);
* above it, points are bucketed into a uniform sub-grid whose pitch h is
  chosen from the group's extent so a sub-cell holds ~``target_per_cell``
  points (total sub-cells ~ n/target, so even a full-grid walk is cheap).
  A query expands Chebyshev rings around the centroid's sub-cell and
  stops once the ``num_max``-th nearest candidate distance is closer
  than the next ring's lower bound ((r-1)*h) — every point that could
  make the cut is then guaranteed gathered, including distance ties,
  so the final (distance, id) lexsort picks the identical subset.

Bit-identity: distances are the same elementwise expression
(sqrt(sum((p - q)^2))) evaluated on gathered rows, candidates are
re-sorted to ascending row index before the same where/truncate logic
runs, so untruncated results keep index order and truncated results keep
(d, id) order — byte-for-byte the arrays the naive scan produces.
"""

from __future__ import annotations

import numpy as np


class CellNeighborhood:
    """Radius-bounded k-nearest candidate queries over one kernel group.

    Parameters
    ----------
    pts : (n, 3) float ndarray — ECEF coordinates.
    ids : (n,) ndarray — tie-break ids (the sweep's stable ordering key).
    radius : float — outer_radius of the query ball.
    num_max : int — truncation cap (<=0 means no cap).
    """

    DENSE_THRESHOLD = 4096

    def __init__(self, pts, ids, radius, num_max,
                 dense_threshold=None, target_per_cell=None):
        self.pts = pts
        self.ids = ids
        self.radius = float(radius)
        self.num_max = int(num_max) if num_max and num_max > 0 else 0
        n = len(ids)
        thr = self.DENSE_THRESHOLD if dense_threshold is None else dense_threshold
        self._grid = None
        if n > thr:
            self._build_grid(target_per_cell or max(4 * (self.num_max or 64), 256))

    def _build_grid(self, target: int) -> None:
        pts = self.pts
        n = len(pts)
        lo = pts.min(axis=0)
        extent = float((pts.max(axis=0) - lo).max())
        if extent <= 0.0:  # all points co-located: the duplicate memo owns this
            return
        # pitch so a sub-cell holds ~target points => ~n/target cells total;
        # ring expansion is bounded by the grid span, never by radius/h
        h = extent * (target / n) ** (1.0 / 3.0)
        h = max(h, extent * 1e-6)
        cells = np.floor((pts - lo) / h).astype(np.int64)
        span = cells.max(axis=0) + 1
        key = (cells[:, 0] * span[1] + cells[:, 1]) * span[2] + cells[:, 2]
        order = np.argsort(key, kind="stable")
        sk = key[order]
        uniq, starts = np.unique(sk, return_index=True)
        ends = np.append(starts[1:], n)
        self._grid = {
            "h": h,
            "lo": lo,
            "span": span,
            "order": order,
            "buckets": {int(k): (int(s), int(e)) for k, s, e in zip(uniq, starts, ends)},
            "max_ring": int(span.max()),
        }

    def query(self, curr: int):
        """(guess, d_guess): indices within ``radius`` of point ``curr``
        (truncated to the ``num_max`` nearest, ties by id) and their
        distances — exactly the naive scan's output, in its order."""
        pts = self.pts
        if self._grid is None:
            d = np.sqrt(((pts - pts[curr]) ** 2).sum(axis=1))
            guess = np.where(d <= self.radius)[0]
            if self.num_max and guess.size > self.num_max:
                k = np.lexsort((self.ids[guess], d[guess]))[: self.num_max]
                guess = guess[k]
            return guess, d[guess]

        g = self._grid
        h, lo, span, buckets = g["h"], g["lo"], g["span"], g["buckets"]
        order = g["order"]
        c0 = np.floor((pts[curr] - lo) / h).astype(np.int64)
        num_max = self.num_max
        radius = self.radius

        cand_chunks: list[np.ndarray] = []
        n_cand = 0

        def ring_cells(r: int):
            x0, y0, z0 = int(c0[0]), int(c0[1]), int(c0[2])
            if r == 0:
                yield x0, y0, z0
                return
            for dx in range(-r, r + 1):
                x = x0 + dx
                if x < 0 or x >= span[0]:
                    continue
                on_x = abs(dx) == r
                for dy in range(-r, r + 1):
                    y = y0 + dy
                    if y < 0 or y >= span[1]:
                        continue
                    on_face = on_x or abs(dy) == r
                    zs = (
                        range(z0 - r, z0 + r + 1)
                        if on_face
                        else (z0 - r, z0 + r)  # interior: only the z faces
                    )
                    for z in zs:
                        if 0 <= z < span[2]:
                            yield x, y, z

        max_ring = g["max_ring"]
        for r in range(max_ring + 1):
            lower_next = r * h  # ring r+1 lower bound: ((r+1)-1)*h
            for x, y, z in ring_cells(r):
                b = buckets.get((x * int(span[1]) + y) * int(span[2]) + z)
                if b is not None:
                    cand_chunks.append(order[b[0]: b[1]])
                    n_cand += b[1] - b[0]
            # stop when no unexplored point can beat the current cut
            if lower_next > radius:
                break
            if num_max and n_cand >= num_max:
                cand = np.concatenate(cand_chunks)
                d = np.sqrt(((pts[cand] - pts[curr]) ** 2).sum(axis=1))
                in_ball = d[d <= radius]
                if in_ball.size >= num_max:
                    d_cut = np.partition(in_ball, num_max - 1)[num_max - 1]
                    if lower_next > d_cut:
                        break

        cand = np.concatenate(cand_chunks) if cand_chunks else np.empty(0, np.int64)
        cand.sort()  # ascending row index: the naive scan's iteration order
        d = np.sqrt(((pts[cand] - pts[curr]) ** 2).sum(axis=1))
        within = d <= radius
        guess = cand[within]
        d_g = d[within]
        if num_max and guess.size > num_max:
            k = np.lexsort((self.ids[guess], d_g))[:num_max]
            guess = guess[k]
            d_g = d_g[k]
        return guess, d_g
