"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / resize / feature-extract as actor-pool map_batches stages.

The container ships no image/audio codecs, so the *decode kernel* is a
clearly-marked deterministic fake (`FIMG` header parse) — the Ray-side
plumbing is real and what this module actually tests: binary columns kept in
``batch_format='pyarrow'`` end-to-end (pandas would object-box them), small
batch sizes because payload bytes dominate memory, per-actor setup in
``__init__``, partitioned output layout.

Payload format (synthesized deterministically from doc ids):
``b'FIMG' | uint16 width | uint16 height | blake2b(seed, 32B) pixel seed``.
A real deployment swaps ``_decode`` for PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

_MAGIC = b"FIMG"


def synth_media_dataset(sf_dir: str) -> ray.data.Dataset:
    """Deterministic media table derived from the documents table (one fake
    image per doc; size a pure function of doc_id)."""

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads, ws, hs = [], [], []
        for i in ids:
            h = hashlib.blake2b(f"media{i}".encode(), digest_size=36).digest()
            w = 64 + h[0] % 192
            hh = 64 + h[1] % 192
            payloads.append(_MAGIC + struct.pack(">HH", w, hh) + h[4:])
            ws.append(w)
            hs.append(hh)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * len(ids)),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(make, batch_format="pyarrow")


def _decode(payload: bytes) -> tuple[int, int, bytes]:
    """STUB DECODER (deterministic fake): parses the FIMG header. A real
    build replaces this body with PIL.Image.open — same signature."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FIMG payload")
    w, h = struct.unpack(">HH", payload[4:8])
    return w, h, payload[8:]


class DecodeAndFeaturize:
    """Actor-pool stage: payload → (decoded dims, 8-dim feature vector).

    __init__ = once-per-actor setup (a real model load would live here);
    __call__ = per-batch vectorized work. Arrow in/out: binary columns never
    touch pandas object dtype."""

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, ws, hs = [], [], []
        for payload in t.column("payload").to_pylist():
            w, h, seed = _decode(payload)
            # deterministic fake embedding: bytes → unit-norm float vector
            raw = np.frombuffer(
                hashlib.blake2b(seed, digest_size=self.feature_dim * 4).digest(),
                dtype=np.uint32,
            ).astype(np.float64)
            v = raw / max(np.linalg.norm(raw), 1e-30)
            feats.append(v.tolist())
            ws.append(w)
            hs.append(h)
        norms = [round(float(np.linalg.norm(f)), 6) for f in feats]
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "decoded_width": pa.array(ws, pa.int32()),
                "decoded_height": pa.array(hs, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
                "feature_norm": pa.array(norms, pa.float64()),
            }
        )


class Resize:
    """Actor-pool stage: clamp dims to a max edge, preserving aspect —
    metadata-only on the fake payload (a real build transforms pixels)."""

    def __init__(self, max_edge: int = 128):
        self.max_edge = max_edge

    def __call__(self, t: pa.Table) -> pa.Table:
        ws = t.column("width").to_numpy()
        hs = t.column("height").to_numpy()
        scale = np.minimum(1.0, self.max_edge / np.maximum(ws, hs))
        new_w = (ws * scale).astype(np.int32)
        new_h = (hs * scale).astype(np.int32)
        payloads = [
            _MAGIC + struct.pack(">HH", int(w), int(h)) + p[8:]
            for p, w, h in zip(t.column("payload").to_pylist(), new_w, new_h)
        ]
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(new_w),
                "height": pa.array(new_h),
                "kind": t.column("kind"),
            }
        )


def media_features(sf_dir: str, concurrency: int | None = None) -> pd.DataFrame:
    """Pipeline: synth media → resize → decode+featurize; returns metadata
    frame (feature vector L2 norm ≈ 1, dims, media_id).

    Pool sizing: two actor pools + the read stage must co-exist — reserving
    every CPU for the pools starves the read and the pipeline stalls, so each
    pool gets at most (cpus - 2) / 2."""
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, (ncpu - 2) // 2)
    ds = (
        synth_media_dataset(sf_dir)
        .map_batches(Resize, batch_format="pyarrow", batch_size=256,
                     concurrency=concurrency, num_cpus=1)
        .map_batches(DecodeAndFeaturize, batch_format="pyarrow", batch_size=256,
                     concurrency=concurrency, num_cpus=1)
        .select_columns(["media_id", "decoded_width", "decoded_height", "feature_norm"])
    )
    # feature vectors (the heavy column) are dropped IN the stage; only the
    # small metadata frame reaches the driver
    return ds.to_pandas()


# --------------------------------------------------------------------------
# Video frame-sampling plan — the "which frames do we decode" stage of a
# video ingestion pipeline, run BEFORE the (expensive, stubbed) decode:
# each video expands to its 1 Hz sample schedule, capped at MAX_FRAMES.
# Pure map-side fan-out in an actor pool (the real build holds the
# container/codec probe state per actor); output is bounded by
# videos × MAX_FRAMES, never by raw frame count. Video metadata is
# synthesized from doc_id with INTEGER arithmetic so the oracle is a
# standalone SQL query (the payload itself stays a stub either way).

MAX_FRAMES = 32


def synth_video_meta(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-doc video metadata: duration 5–119 s, fps ∈
    {24, 30, 36} — pure functions of doc_id (mirrored literally in SQL)."""

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        dur = (ids * 37) % 115 + 5
        fps = ((ids * 11) % 3) * 6 + 24
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_s": pa.array(dur.astype(np.int64), pa.int64()),
                "fps": pa.array(fps.astype(np.int64), pa.int64()),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(make, batch_format="pyarrow")


class FrameSampler:
    """Actor-pool stage: (media_id, duration_s, fps) → one row per planned
    frame (frame_no, source frame index, timestamp). A real build opens the
    container here (__init__ holds the demuxer) and emits decode work units."""

    def __init__(self, max_frames: int = MAX_FRAMES):
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy()
        dur = t.column("duration_s").to_numpy()
        fps = t.column("fps").to_numpy()
        k = np.minimum(dur, self.max_frames).astype(np.int64)
        media = np.repeat(ids, k)
        frame_no = np.concatenate([np.arange(n, dtype=np.int64) for n in k]) if len(k) else np.array([], dtype=np.int64)
        rep_fps = np.repeat(fps, k)
        return pa.table(
            {
                "media_id": pa.array(media, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int64()),
                "frame_idx": pa.array(frame_no * rep_fps, pa.int64()),
                "ts_ms": pa.array(frame_no * 1000, pa.int64()),
            }
        )


def frame_plan(sf_dir: str, concurrency: int | None = None) -> pd.DataFrame:
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, ncpu - 2)
    return (
        synth_video_meta(sf_dir)
        .map_batches(FrameSampler, batch_format="pyarrow", batch_size=512,
                     concurrency=concurrency, num_cpus=1)
        .to_pandas()
    )


FRAME_PLAN_SQL = f"""
WITH v AS (
  SELECT doc_id AS media_id,
         5 + (doc_id * 37) % 115 AS duration_s,
         24 + ((doc_id * 11) % 3) * 6 AS fps
  FROM documents
), f AS (
  SELECT media_id, fps,
         unnest(generate_series(0, LEAST(duration_s, {MAX_FRAMES}) - 1)) AS frame_no
  FROM v
)
SELECT media_id, frame_no::BIGINT AS frame_no,
       (frame_no * fps)::BIGINT AS frame_idx,
       (frame_no * 1000)::BIGINT AS ts_ms
FROM f
"""


# --------------------------------------------------------------------------
# Audio chunking plan — the ASR-style "which windows do we transcribe"
# stage (Whisper-style 30 s windows with 5 s overlap), run BEFORE the
# stubbed decode exactly like frame_plan. Same actor-pool map-side fan-out
# shape: output bounded by clips × MAX_WINDOWS; audio metadata synthesized
# from doc_id with integer arithmetic so the oracle is standalone SQL.

AUDIO_WIN_S = 30
AUDIO_STRIDE_S = 25  # 5 s overlap
MAX_WINDOWS = 24


def synth_audio_meta(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-doc audio metadata: duration 10–609 s, sample
    rate ∈ {16000, 22050, 44100} — pure functions of doc_id."""

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        dur = (ids * 53) % 600 + 10
        sr = np.array([16000, 22050, 44100], dtype=np.int64)[(ids * 7) % 3]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_s": pa.array(dur.astype(np.int64), pa.int64()),
                "sample_rate": pa.array(sr, pa.int64()),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(make, batch_format="pyarrow")


class AudioWindower:
    """Actor-pool stage: (media_id, duration_s, sample_rate) → one row per
    planned transcription window. A real build holds the resampler /
    VAD model in __init__ and emits decode work units."""

    def __init__(self, win_s: int = AUDIO_WIN_S, stride_s: int = AUDIO_STRIDE_S,
                 max_windows: int = MAX_WINDOWS):
        self.win_s, self.stride_s, self.max_windows = win_s, stride_s, max_windows

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy()
        dur = t.column("duration_s").to_numpy()
        sr = t.column("sample_rate").to_numpy()
        # windows start at 0, stride 25 s, last window may be short but
        # must cover ≥ 1 s of audio; capped at MAX_WINDOWS
        k = np.minimum(
            (dur + self.stride_s - 1) // self.stride_s, self.max_windows
        ).astype(np.int64)
        media = np.repeat(ids, k)
        win_no = (
            np.concatenate([np.arange(n, dtype=np.int64) for n in k])
            if len(k) else np.array([], dtype=np.int64)
        )
        rep_dur = np.repeat(dur, k)
        rep_sr = np.repeat(sr, k)
        start = win_no * self.stride_s
        end = np.minimum(start + self.win_s, rep_dur)
        return pa.table(
            {
                "media_id": pa.array(media, pa.int64()),
                "win_no": pa.array(win_no, pa.int64()),
                "start_s": pa.array(start, pa.int64()),
                "end_s": pa.array(end, pa.int64()),
                "n_samples": pa.array((end - start) * rep_sr, pa.int64()),
            }
        )


def audio_window_plan(sf_dir: str, concurrency: int | None = None) -> pd.DataFrame:
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, ncpu - 2)
    return (
        synth_audio_meta(sf_dir)
        .map_batches(AudioWindower, batch_format="pyarrow", batch_size=512,
                     concurrency=concurrency, num_cpus=1)
        .to_pandas()
    )


AUDIO_WINDOW_PLAN_SQL = f"""
WITH a AS (
  SELECT doc_id AS media_id,
         10 + (doc_id * 53) % 600 AS duration_s,
         [16000, 22050, 44100][((doc_id * 7) % 3 + 1)::INT] AS sample_rate
  FROM documents
), w AS (
  SELECT media_id, duration_s, sample_rate,
         unnest(generate_series(
           0, LEAST((duration_s + {AUDIO_STRIDE_S} - 1) // {AUDIO_STRIDE_S},
                    {MAX_WINDOWS}) - 1)) AS win_no
  FROM a
)
SELECT media_id, win_no::BIGINT AS win_no,
       (win_no * {AUDIO_STRIDE_S})::BIGINT AS start_s,
       LEAST(win_no * {AUDIO_STRIDE_S} + {AUDIO_WIN_S}, duration_s)::BIGINT AS end_s,
       ((LEAST(win_no * {AUDIO_STRIDE_S} + {AUDIO_WIN_S}, duration_s)
         - win_no * {AUDIO_STRIDE_S}) * sample_rate)::BIGINT AS n_samples
FROM w
"""


# --------------------------------------------------------------------------
# Perceptual-hash image near-dup (dHash; Krawetz's difference hash) — the
# image sibling of dedup_simhash. The synthetic pixel corpus plants
# near-duplicate GROUPS (4 variants per group: one base image + three
# one-pixel perturbations), with every pixel an integer function of doc_id
# so the DuckDB oracle recomputes hashes standalone — the oracle IS the
# brute-force hamming join, so oracle-green pins the banding's recall.
#
# Scale shape (identical to simhash_pairs): payload decode + hash in an
# actor-pool map_batches stage (binary column, Arrow end-to-end), band
# explode in the same stage, ONE groupby((band, band_val)) exchange of
# int rows, per-bucket pair fan-out, exact-hamming verify. Pigeonhole:
# 56-bit hash in 8×7-bit bands ⇒ hamming ≤ 7 leaves ≥1 band untouched,
# so recall is GUARANTEED total at the ≤6 threshold.

PH_ROWS, PH_COLS = 7, 9
PH_BITS = PH_ROWS * (PH_COLS - 1)  # 56-bit dHash
PH_BANDS = 8
_PH_BAND_BITS = PH_BITS // PH_BANDS  # 7
PH_GROUP = 4  # docs per planted variant group
PH_MAX_HAMMING = 6  # < PH_BANDS ⇒ full recall by pigeonhole


def _pixel_grid(ids: np.ndarray) -> np.ndarray:
    """(n, 7, 9) uint8 pixel grids — the synthetic image contract,
    mirrored literally in PHASH_NEARDUP_SQL: Knuth-hash of
    (group*7919 + i*131 + j*17) for the base image (group = doc_id // 4),
    one pixel +128 for variant members (doc_id % 4 != 0)."""
    ids = ids.astype(np.int64)
    g = ids // PH_GROUP
    i = np.arange(PH_ROWS, dtype=np.int64).reshape(1, -1, 1)
    j = np.arange(PH_COLS, dtype=np.int64).reshape(1, 1, -1)
    x = g.reshape(-1, 1, 1) * 7919 + i * 131 + j * 17
    px = ((x * 2654435761) >> 8) % 256
    r = ids % PH_GROUP
    pos = (ids * 5) % (PH_ROWS * PH_COLS)
    pi, pj = pos // PH_COLS, pos % PH_COLS
    rows = np.arange(len(ids))
    mask = r != 0
    px[rows[mask], pi[mask], pj[mask]] = (
        px[rows[mask], pi[mask], pj[mask]] + 128
    ) % 256
    return px.astype(np.uint8)


def synth_pixel_media(sf_dir: str) -> ray.data.Dataset:
    """Pixel-payload media table: FIMG header + the 63 raw grayscale bytes
    (row-major 7×9) — real bytes for the decode stage to parse, unlike the
    seed-only payloads of synth_media_dataset."""

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        px = _pixel_grid(ids)
        payloads = [
            _MAGIC + struct.pack(">HH", PH_COLS, PH_ROWS) + p.tobytes()
            for p in px
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(make, batch_format="pyarrow")


def dhash_of_pixels(px: np.ndarray) -> np.ndarray:
    """(n, 7, 9) pixels → (n,) int64 56-bit dHash: bit k = i*8+j set iff
    pixel(i, j) < pixel(i, j+1)."""
    bits = (px[:, :, :-1] < px[:, :, 1:]).reshape(len(px), -1)
    weights = np.left_shift(np.int64(1), np.arange(PH_BITS, dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


class DecodeAndDhash:
    """Actor-pool stage: FIMG pixel payload → (media_id, phash, band rows).
    __init__ holds the (here trivial) decoder state; __call__ is numpy-
    vectorized over the batch. Emits the band explode in-stage so the only
    exchange is the (band, band_val) groupby of int rows."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy()
        px = np.stack(
            [
                np.frombuffer(_decode(p)[2], dtype=np.uint8).reshape(
                    PH_ROWS, PH_COLS
                )
                for p in t.column("payload").to_pylist()
            ]
        )
        hs = dhash_of_pixels(px)
        n = len(ids)
        band = np.tile(np.arange(PH_BANDS, dtype=np.int64), n)
        rep_h = np.repeat(hs, PH_BANDS)
        band_val = (rep_h >> (band * _PH_BAND_BITS)) & ((1 << _PH_BAND_BITS) - 1)
        return pa.table(
            {
                "band": pa.array(band, pa.int64()),
                "band_val": pa.array(band_val, pa.int64()),
                "media_id": pa.array(
                    np.repeat(ids, PH_BANDS).astype(np.int64), pa.int64()
                ),
                "phash": pa.array(rep_h, pa.int64()),
            }
        )


def phash_neardup(
    sf_dir: str, max_hamming: int = PH_MAX_HAMMING, concurrency: int | None = None
) -> pd.DataFrame:
    """(a, b, hamming) image near-dup pairs at hamming ≤ max_hamming.
    Full recall for max_hamming < PH_BANDS (pigeonhole over the band
    explode); exact precision (pairs verified by exact hamming)."""
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, ncpu - 2)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("media_id")
        ids = g["media_id"].tolist()
        hs = g["phash"].tolist()
        out = {"a": [], "b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["hamming"].append(d)
        return pd.DataFrame(out)

    cand = (
        synth_pixel_media(sf_dir)
        .map_batches(
            DecodeAndDhash, batch_format="pyarrow", batch_size=512,
            concurrency=concurrency, num_cpus=1,
        )
        .groupby(["band", "band_val"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )
    return (
        cand.drop_duplicates(subset=["a", "b"])
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


PHASH_NEARDUP_SQL = f"""
WITH px AS (
  SELECT d.doc_id, i.i, j.j,
         CASE WHEN d.doc_id % {PH_GROUP} <> 0
                   AND (i.i * {PH_COLS} + j.j) = (d.doc_id * 5) % {PH_ROWS * PH_COLS}
              THEN ((((d.doc_id // {PH_GROUP}) * 7919 + i.i * 131 + j.j * 17)
                     * 2654435761 >> 8) % 256 + 128) % 256
              ELSE (((d.doc_id // {PH_GROUP}) * 7919 + i.i * 131 + j.j * 17)
                    * 2654435761 >> 8) % 256
         END AS p
  FROM documents d, range({PH_ROWS}) i(i), range({PH_COLS}) j(j)
), bits AS (
  SELECT a.doc_id,
         SUM(CASE WHEN a.p < b.p
                  THEN (1::BIGINT << (a.i * {PH_COLS - 1} + a.j))
                  ELSE 0 END)::BIGINT AS h
  FROM px a JOIN px b
    ON b.doc_id = a.doc_id AND b.i = a.i AND b.j = a.j + 1
  GROUP BY a.doc_id
)
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.h, y.h))::BIGINT AS hamming
FROM bits x JOIN bits y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.h, y.h)) <= {PH_MAX_HAMMING}
ORDER BY a, b
"""
