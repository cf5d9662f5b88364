"""District geometry: convex hulls + centroids (S9/A5/A6/D4).

The reference fetches per-district points from PDOK, dedupes them on a
rounded lat/lng key (district.go:134-153), computes a convex hull with a
buffer (shapely twin scripts/geometry/hull_generator.py:9-40; unused native
Graham scan district.go:161-349) and writes a GeoJSON FeatureCollection
(district.go:351-400). No network here, so points are derived
deterministically from listing rows; the hull is a pure-numpy Andrew
monotone chain (public textbook algorithm). The buffer reproduces
shapely's ``hull.buffer(0.001)`` geometry for a convex ring
(hull_generator.py:28-31): every edge is offset outward along its normal
and consecutive edges are joined by circular arcs around the shared
vertex, interpolated at shapely's default resolution (quad_segs=8 segments
per quarter circle). Shapely itself is not in this container, so parity is
to its *documented* round-join semantics; the offset-distance and
convexity invariants are property-tested.

Shape: ``groupby(district).map_groups(hull)`` — embarrassingly parallel,
tiny data (SURVEY.md §3.3).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd
import ray.data


def synth_points(listings: pd.DataFrame) -> pd.DataFrame:
    """Deterministic pseudo-geocoding: (lat, lng) from the listing url hash,
    clustered per 4-digit district so hulls are geographically coherent."""
    districts = listings["postal_code"].fillna("").str.slice(0, 4)
    lats, lngs = [], []
    for url, d in zip(listings["url"], districts):
        hd = hashlib.blake2b(f"geo{d}".encode(), digest_size=8).digest()
        hu = hashlib.blake2b(f"pt{url}".encode(), digest_size=8).digest()
        base_lat = 52.0 + (hd[0] % 100) / 100.0  # district center
        base_lng = 4.5 + (hd[1] % 100) / 100.0
        lats.append(round(base_lat + (hu[0] - 128) / 12800.0, 6))
        lngs.append(round(base_lng + (hu[1] - 128) / 12800.0, 6))
    out = listings[["url"]].copy()
    out["district"] = districts
    out["lat"] = lats
    out["lng"] = lngs
    return out


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices CCW (≥1 point)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def buffer_hull(
    hull: np.ndarray, radius: float = 0.001, quad_segs: int = 8
) -> np.ndarray:
    """Ring-offset buffer with round joins — the shapely ``buffer(radius)``
    geometry for a convex CCW ring (hull_generator.py:31): each edge shifts
    outward by ``radius`` along its normal; at each vertex the two shifted
    edges are joined by a circular arc sampled at ``quad_segs`` segments
    per quarter circle (shapely's default resolution). Degenerate inputs
    follow shapely too: one point → circle, two points → capsule.

    Every output vertex is exactly ``radius`` from its source vertex, and
    the result is convex and CCW (property-tested in tests/test_domain)."""
    n = len(hull)
    if n == 0:
        return hull
    two_pi = 2.0 * np.pi
    max_step = (np.pi / 2.0) / quad_segs
    if n == 1:
        m = 4 * quad_segs
        ang = np.arange(m) * (two_pi / m)
        return hull[0] + radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    out: list[np.ndarray] = []
    for i in range(n):
        prev, cur, nxt = hull[i - 1], hull[i], hull[(i + 1) % n]
        d_in, d_out = cur - prev, nxt - cur
        n_in = np.array([d_in[1], -d_in[0]])  # outward normal of a CCW ring
        n_in /= np.linalg.norm(n_in)
        n_out = np.array([d_out[1], -d_out[0]])
        n_out /= np.linalg.norm(n_out)
        a_in = float(np.arctan2(n_in[1], n_in[0]))
        a_out = float(np.arctan2(n_out[1], n_out[0]))
        delta = (a_out - a_in) % two_pi  # convex CCW turn: arc sweeps CCW
        steps = max(1, int(np.ceil(delta / max_step - 1e-12)))
        for k in range(steps + 1):
            a = a_in + delta * k / steps
            out.append(cur + radius * np.array([np.cos(a), np.sin(a)]))
    ring = np.array(out)
    # drop consecutive duplicates (zero-sweep arcs on collinear-free hulls
    # do not occur, but guard anyway)
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    return ring[keep]


def district_hulls(listings: pd.DataFrame, min_points: int = 3) -> dict:
    """GeoJSON FeatureCollection of buffered district hulls, via Ray
    groupby(district).map_groups. Districts failing the postal-format
    predicate F5 (4 leading digits, district.go:66-70) are dropped; points
    are deduped on the rounded '%.6f,%.6f' key first (D4)."""
    pts = synth_points(listings)
    pts = pts[pts["district"].str.match(r"^\d{4}")]

    def hull_group(g: pd.DataFrame) -> pd.DataFrame:
        key = g["lat"].map("{:.6f}".format) + "," + g["lng"].map("{:.6f}".format)
        g = g.loc[~key.duplicated()]
        if len(g) < min_points:
            return pd.DataFrame({"district": [], "n_points": [], "polygon": []})
        h = buffer_hull(convex_hull(g[["lng", "lat"]].to_numpy()))
        ring = h.tolist() + [h[0].tolist()]
        return pd.DataFrame(
            [
                {
                    "district": g["district"].iloc[0],
                    "n_points": len(g),
                    "polygon": json.dumps([[round(x, 6), round(y, 6)] for x, y in ring]),
                }
            ]
        )

    hulls = (
        ray.data.from_pandas(pts)
        .groupby("district")
        .map_groups(hull_group, batch_format="pandas")
        .to_pandas()
        .sort_values("district")
    )
    features = [
        {
            "type": "Feature",
            "properties": {"district": r["district"], "point_count": int(r["n_points"])},
            "geometry": {"type": "Polygon", "coordinates": [json.loads(r["polygon"])]},
        }
        for _, r in hulls.iterrows()
    ]
    return {
        "type": "FeatureCollection",
        "metadata": {"district_count": len(features)},
        "features": features,
    }


def metro_centers(listings: pd.DataFrame) -> pd.DataFrame:
    """A5 (database.go:968-1009): mean lat/lng per city over member points."""
    from ..pipelines.analytics import r2

    pts = synth_points(listings)
    pts["city"] = listings["city"].to_numpy()
    # pin the accumulation order so the float mean is bit-reproducible
    # across input partitionings (oracle artifacts use the same order)
    pts = pts.sort_values("url", kind="mergesort")
    out = (
        pts.dropna(subset=["city"])
        .groupby("city", as_index=False)
        .agg(center_lat=("lat", "mean"), center_lng=("lng", "mean"), n=("url", "size"))
    )
    out["center_lat"] = r2(out["center_lat"], 6)
    out["center_lng"] = r2(out["center_lng"], 6)
    return out
