"""Driver-oracle artifacts: LOCAL reference implementations, no Ray.

The external driver checks each ``queries()`` entry against a DuckDB SQL
string. Operators whose math SQL cannot express (blake2b-derived minhash /
simhash signatures, synthetic payload features, pseudo-geocoded points)
get a hybrid oracle instead: this module recomputes the *per-row
primitives* with plain single-process Python loops — written independently
of the distributed ops modules — and parks them as Parquet under /tmp; the
registered SQL then performs the actual operator semantics (LSH banding
join, brute-force hamming/jaccard verification, aggregation) in DuckDB over
those primitives. A distribution bug (lost rows, bad partitioning, wrong
join) or a kernel-transcription bug on either side surfaces as a driver
hash mismatch.

Everything here is a pure function of the deterministic inputs at the
driver's correctness scale (sf=0.01), so artifacts are built once and
cached (atomic _DONE marker).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_VERSION = "v2"  # v2: + zlib_ratios (text_compression_topk oracle)
SF_DIR = "/root/testdata/sf0.01"  # the driver runs correctness at sf=0.01

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _BANDS
_U64 = 1 << 64

_WORD = re.compile(r"\S+")


def oracle_dir() -> str:
    return f"/tmp/fr_oracle/{ORACLE_VERSION}"


def artifact_path(name: str) -> str:
    return os.path.join(oracle_dir(), f"{name}.parquet")


# ------------------------------------------------- local text primitives
def _local_shingles(text: str, k: int = 3) -> list[str]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


def _perm_consts() -> tuple[list[int], list[int]]:
    a, b = [], []
    for i in range(_N_PERM):
        ai = struct.unpack(">Q", hashlib.blake2b(f"a{i}".encode(), digest_size=8).digest())[0] % _MERSENNE or 1
        bi = struct.unpack(">Q", hashlib.blake2b(f"b{i}".encode(), digest_size=8).digest())[0] % _MERSENNE
        a.append(ai)
        b.append(bi)
    return a, b


def _local_minhash(shingles: list[str]) -> list[int]:
    """Pure-python minhash (the ops module's affine family, uint64-wrap
    semantics reproduced with int arithmetic)."""
    a, b = _perm_consts()
    if not shingles:
        return [_U64 - 1] * _N_PERM
    crcs = [zlib.crc32(s.encode()) for s in shingles]
    sig = []
    for p in range(_N_PERM):
        best = None
        for c in crcs:
            v = ((c * a[p]) % _U64 + b[p]) % _U64 % _MERSENNE
            if best is None or v < best:
                best = v
        sig.append(best)
    return sig


def _local_simhash(text: str) -> int:
    toks = _WORD.findall(text.lower())
    if not toks:
        return 0
    v = [0] * 63
    for t in toks:
        h = struct.unpack(">Q", hashlib.blake2b(t.encode(), digest_size=8).digest())[0]
        for s in range(63):
            v[s] += 1 if (h >> s) & 1 else -1
    return sum((1 << s) for s in range(63) if v[s] > 0)


def _r(x: float, nd: int) -> float:
    """Half-away-from-zero rounding (matches DuckDB ROUND)."""
    m = 10**nd
    return math.copysign(math.floor(abs(x) * m + 0.5) / m, x)


# ------------------------------------------------------ artifact builders
def _build_text_artifacts(sf_dir: str) -> None:
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    sh_rows, band_rows, sim_rows = [], [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"].fillna("")):
        sh = _local_shingles(text)
        sh_rows.append({"doc_id": int(doc_id), "shingles": sh})
        sig = _local_minhash(sh)
        for b in range(_BANDS):
            chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
            band_rows.append(
                {
                    "doc_id": int(doc_id),
                    "band": b,
                    "band_hash": zlib.crc32(struct.pack(f"<{_ROWS_PER_BAND}Q", *chunk)),
                }
            )
        sim_rows.append({"doc_id": int(doc_id), "simhash": _local_simhash(text)})
    pq.write_table(
        pa.Table.from_pylist(
            sh_rows,
            schema=pa.schema([("doc_id", pa.int64()), ("shingles", pa.list_(pa.string()))]),
        ),
        artifact_path("doc_shingles"),
    )
    pq.write_table(pa.Table.from_pylist(band_rows), artifact_path("mh_bands"))
    pq.write_table(pa.Table.from_pylist(sim_rows), artifact_path("sh_sigs"))


def _build_media_expected(sf_dir: str) -> None:
    """ops/multimodal.py pipeline recomputed row-at-a-time: synth payload →
    resize (max edge 128, truncating scale) → decode dims + feature norm."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).to_pandas()
    rows = []
    for i in docs["doc_id"]:
        h = hashlib.blake2b(f"media{int(i)}".encode(), digest_size=36).digest()
        w = 64 + h[0] % 192
        hh = 64 + h[1] % 192
        scale = min(1.0, 128.0 / max(w, hh))
        nw, nh = int(w * scale), int(hh * scale)
        seed = h[4:]
        raw = np.frombuffer(
            hashlib.blake2b(seed, digest_size=32).digest(), dtype=np.uint32
        ).astype(np.float64)
        v = raw / max(np.linalg.norm(raw), 1e-30)
        rows.append(
            {
                "media_id": int(i),
                "decoded_width": nw,
                "decoded_height": nh,
                "feature_norm": round(float(np.linalg.norm(v)), 6),
            }
        )
    pq.write_table(pa.Table.from_pylist(rows), artifact_path("media_expected"))


def _local_points(gl: pd.DataFrame) -> pd.DataFrame:
    """Pseudo-geocoding formulas (ops/geometry.synth_points) recomputed
    with plain loops over the golden listings."""
    rows = []
    for url, postal, city in zip(gl["url"], gl["postal_code"], gl["city"]):
        d = (postal or "")[:4] if isinstance(postal, str) else ""
        hd = hashlib.blake2b(f"geo{d}".encode(), digest_size=8).digest()
        hu = hashlib.blake2b(f"pt{url}".encode(), digest_size=8).digest()
        lat = round(52.0 + (hd[0] % 100) / 100.0 + (hu[0] - 128) / 12800.0, 6)
        lng = round(4.5 + (hd[1] % 100) / 100.0 + (hu[1] - 128) / 12800.0, 6)
        rows.append({"url": url, "district": d, "lat": lat, "lng": lng, "city": city})
    return pd.DataFrame(rows)


def _build_metro_expected(corpus_dir: str) -> None:
    gl = pq.read_table(
        f"{corpus_dir}/golden_listings.parquet", columns=["url", "postal_code", "city"]
    ).to_pandas()
    pts = _local_points(gl)
    pts = pts[pts["city"].notna()].sort_values("url", kind="mergesort")
    out = (
        pts.groupby("city", as_index=False)
        .agg(center_lat=("lat", "mean"), center_lng=("lng", "mean"), n=("url", "size"))
    )
    out["center_lat"] = [_r(x, 6) for x in out["center_lat"]]
    out["center_lng"] = [_r(x, 6) for x in out["center_lng"]]
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), artifact_path("metro_expected"))


def _graham_hull(points: np.ndarray) -> np.ndarray:
    """Graham scan (the reference's own native hull shape, district.go:
    161-349): sort by polar angle around the lowest point, pop right turns
    AND collinear points; output rotated to start at the lexicographic
    minimum, CCW — the same canonical form as ops.geometry.convex_hull."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pivot = pts[np.lexsort((pts[:, 0], pts[:, 1]))][0]  # lowest y, then x
    rest = pts[~np.all(pts == pivot, axis=1)]
    ang = np.arctan2(rest[:, 1] - pivot[1], rest[:, 0] - pivot[0])
    dist = np.hypot(rest[:, 1] - pivot[1], rest[:, 0] - pivot[0])
    order = np.lexsort((dist, ang))
    stack = [pivot]
    for p in rest[order]:
        while len(stack) >= 2:
            cross = np.cross(stack[-1] - stack[-2], p - stack[-2])
            if cross <= 0:  # right turn or collinear → pop
                stack.pop()
            else:
                break
        stack.append(p)
    hull = np.array(stack)
    # canonical start: lexicographic min (x, then y)
    start = np.lexsort((hull[:, 1], hull[:, 0]))[0]
    return np.roll(hull, -start, axis=0)


def _build_hulls_expected(corpus_dir: str) -> None:
    from ..ops.geometry import buffer_hull  # shared, property-tested kernel

    gl = pq.read_table(
        f"{corpus_dir}/golden_listings.parquet", columns=["url", "postal_code"]
    ).to_pandas()
    pts = _local_points(gl.assign(city=None))
    pts = pts[pts["district"].str.match(r"^\d{4}")]
    rows = []
    for d, g in pts.groupby("district", sort=True):
        key = g["lat"].map("{:.6f}".format) + "," + g["lng"].map("{:.6f}".format)
        g = g.loc[~key.duplicated()]
        if len(g) < 3:
            continue
        h = buffer_hull(_graham_hull(g[["lng", "lat"]].to_numpy()))
        ring = h.tolist() + [h[0].tolist()]
        rows.append(
            {
                "district": d,
                "point_count": len(g),
                "polygon": json.dumps([[round(x, 6), round(y, 6)] for x, y in ring]),
            }
        )
    pq.write_table(pa.Table.from_pylist(rows), artifact_path("hulls_expected"))


def _build_zlib_ratios(sf_dir: str) -> None:
    """Per-doc zlib(level 6) compressed-size ratio in basis points — the
    primitive DuckDB cannot compute; the registered oracle SQL performs
    the actual operator semantics (rank + cut) over this table. Local
    independent loop per this module's convention (zlib is deterministic
    for a fixed level, so both sides must agree byte-for-byte)."""
    df = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for d, t in zip(df["doc_id"], df["text"]):
        t = "" if t is None or (isinstance(t, float) and math.isnan(t)) else str(t)
        raw = t.encode()
        rb = 10_000 * len(zlib.compress(raw, 6)) // len(raw) if raw else 10_000
        rows.append(
            {"doc_id": int(d), "n_chars": len(t), "ratio_bp": int(rb)}
        )
    pq.write_table(pa.Table.from_pylist(rows), artifact_path("zlib_ratios"))


def ensure_artifacts() -> str:
    """Build every artifact for the driver scale; idempotent. Returns the
    artifact directory."""
    out = oracle_dir()
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    from ..synth.materialize import materialize_corpus

    corpus = materialize_corpus("sf0.01")
    _build_text_artifacts(SF_DIR)
    _build_media_expected(SF_DIR)
    _build_metro_expected(corpus)
    _build_hulls_expected(corpus)
    _build_zlib_ratios(SF_DIR)
    with open(done, "w") as fh:
        fh.write("ok")
    return out
