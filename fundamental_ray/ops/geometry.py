"""District geometry: convex hulls + centroids (S9/A5/A6/D4).

The reference fetches per-district points from PDOK, dedupes them on a
rounded lat/lng key (district.go:134-153), computes a convex hull with a
buffer (shapely twin scripts/geometry/hull_generator.py:9-40; unused native
Graham scan district.go:161-349) and writes a GeoJSON FeatureCollection
(district.go:351-400). No network here, so points are derived
deterministically from listing rows; the hull is a pure-numpy Andrew
monotone chain (public textbook algorithm) with a fixed-radius buffer
approximated by offsetting hull vertices radially from the centroid.

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


def buffer_hull(hull: np.ndarray, radius: float = 0.001) -> np.ndarray:
    """Radial buffer approximation (shapely buffer analogue,
    hull_generator.py:31): push each vertex away from the centroid."""
    if len(hull) == 0:
        return hull
    c = hull.mean(axis=0)
    out = []
    for p in hull:
        d = p - c
        n = np.linalg.norm(d)
        out.append(p + (d / n) * radius if n > 0 else p)
    return np.array(out)


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
    out = (
        pts.dropna(subset=["city"])
        .groupby("city", as_index=False)
        .agg(center_lat=("lat", "mean"), center_lng=("lng", "mean"), n=("url", "size"))
    )
    out["center_lat"] = r2(out["center_lat"], 6)
    out["center_lng"] = r2(out["center_lng"], 6)
    return out
