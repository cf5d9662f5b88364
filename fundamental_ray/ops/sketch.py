"""Mergeable-sketch operators for web-scale pipelines: distinct counting
with a sparse-exact / dense-HLL sketch, and a bloom-prefiltered semi-join.

These extend the aggregation family (SURVEY.md §2.7 — the reference's
COUNT(DISTINCT)-style rollups in database.go) with the two sketch shapes a
100-TB engine leans on:

* **distinct_users_daily** — daily active users. Each batch folds its rows
  into one sketch PER GROUP, so the exchange moves ``groups × blocks``
  fixed-size sketch rows instead of a row per (day, user) pair — the
  partial-aggregate combiner pattern, with the sketch as the partial. The
  sketch is **sparse-exact below a threshold** (stores the raw int64 values
  — bit-exact counts, which is what the sf-scale oracle checks) and
  converts to **dense HLL registers** (p=14, ~16 KiB, ±0.8 % standard
  error) when a merge exceeds the threshold — the scale path at 10^9
  distinct keys, where the exchange stays ``groups × blocks × 16 KiB``
  no matter the cardinality. Register contents are a pure max-fold over
  per-value hashes, so estimates are merge-order-independent.
* **bloom_semi_join_urgent** — lineitem rows whose order is URGENT. The
  small side (filtered order keys) is built distributed, pulled once
  (it is small BY DEFINITION of a broadcast semi-join — at 10^9 keys the
  bloom is ~1.3 GiB at 1 % FP, still a one-time ``ray.put``), and shipped
  as (a) a bit-array bloom filter and (b) a sorted key array. Each batch
  masks with 7 vectorized bloom probes first — at scale this rejects
  ~99 % of non-members touching only ``k`` cache lines per row — then
  exact-verifies the survivors with a binary search in the sorted keys,
  so the result has NO false positives while the expensive check runs on
  ~1 % of rows. If the small side ever outgrew a worker's heap the exact
  tier would become a key-hash-partitioned join (see ops/dedup.py's
  bucketed disk join for the shape); the bloom prefilter is unchanged.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# ------------------------------------------------------------------ hashing

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array."""
    with np.errstate(over="ignore"):
        x = (x + _GOLDEN).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
    return x


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# ------------------------------------------------------- HLL distinct sketch

HLL_P = 14  # 2^14 registers, std err ~ 1.04/sqrt(2^14) = 0.81 %
HLL_M = 1 << HLL_P
SPARSE_THRESHOLD = 4096  # raw-value set below this — exact counts


class DistinctSketch:
    """Sparse-exact / dense-HLL distinct counter over int64 keys.

    Sparse mode stores the raw values (a numpy int64 set) — estimates are
    EXACT. When a fold or merge pushes the set past SPARSE_THRESHOLD the
    sketch converts to 2^14 uint8 HLL registers. Both modes are mergeable;
    dense registers are a max-fold over per-value hashes, so the dense
    register array (hence the estimate) is independent of merge order and
    of where the sparse->dense conversion happened.
    """

    __slots__ = ("sparse", "registers")

    def __init__(self) -> None:
        self.sparse: np.ndarray | None = np.empty(0, dtype=np.int64)
        self.registers: np.ndarray | None = None

    # -- construction / transport

    @classmethod
    def from_values(cls, values: np.ndarray) -> "DistinctSketch":
        s = cls()
        s.add(values)
        return s

    def serialize(self) -> tuple[str, bytes]:
        if self.registers is not None:
            return "dense", self.registers.tobytes()
        return "sparse", self.sparse.tobytes()

    @classmethod
    def deserialize(cls, mode: str, payload: bytes) -> "DistinctSketch":
        s = cls()
        if mode == "dense":
            s.sparse = None
            s.registers = np.frombuffer(payload, dtype=np.uint8).copy()
        else:
            s.sparse = np.frombuffer(payload, dtype=np.int64).copy()
        return s

    # -- folding

    def add(self, values: np.ndarray) -> None:
        values = np.unique(np.asarray(values, dtype=np.int64))
        if self.registers is not None:
            self._fold_dense(values)
            return
        merged = np.union1d(self.sparse, values)
        if len(merged) > SPARSE_THRESHOLD:
            self._to_dense()
            self._fold_dense(merged)
        else:
            self.sparse = merged

    def merge(self, other: "DistinctSketch") -> None:
        if other.registers is not None:
            if self.registers is None:
                self._to_dense()
            np.maximum(self.registers, other.registers, out=self.registers)
        else:
            self.add(other.sparse)

    def _to_dense(self) -> None:
        pending = self.sparse
        self.sparse = None
        self.registers = np.zeros(HLL_M, dtype=np.uint8)
        if len(pending):
            self._fold_dense(pending)

    def _fold_dense(self, values: np.ndarray) -> None:
        h = _splitmix64(values.view(np.uint64))
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = h << np.uint64(HLL_P)  # low 64-p bits shifted to the top
        # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0).
        # Exact integer clz: smear the MSB downward, then popcount —
        # clz = 64 - popcount(smeared), no float rounding at the 2^k edges.
        x = rest.copy()
        for s in (1, 2, 4, 8, 16, 32):
            x |= x >> np.uint64(s)
        pop = _POPCOUNT[x.view(np.uint8)].reshape(len(x), 8).sum(
            axis=1, dtype=np.int64
        )
        rank = np.minimum(65 - pop, 64 - HLL_P + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    # -- estimation

    def estimate(self) -> int:
        if self.registers is None:
            return int(len(self.sparse))
        m = float(HLL_M)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting, small range
        return int(round(e))


def distinct_users_daily(sf_dir: str) -> pd.DataFrame:
    """Daily distinct active users over events, via mergeable per-batch
    DistinctSketch partials (exact at sf: daily cardinality is far below
    SPARSE_THRESHOLD; ±0.8 % dense-HLL at 10^9 users/day)."""
    import pyarrow.compute as pc

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partials(t: pa.Table) -> pd.DataFrame:
        day = pc.strftime(t["ts"], format="%Y-%m-%d").to_numpy(
            zero_copy_only=False
        )
        users = t["user_id"].to_numpy(zero_copy_only=False)
        rows = []
        order = np.argsort(day, kind="stable")
        day, users = day[order], users[order]
        bounds = np.flatnonzero(np.r_[True, day[1:] != day[:-1], True])
        for i, j in zip(bounds[:-1], bounds[1:]):
            mode, payload = DistinctSketch.from_values(users[i:j]).serialize()
            rows.append({"day": day[i], "mode": mode, "payload": payload})
        return pd.DataFrame(rows, columns=["day", "mode", "payload"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = DistinctSketch()
        for mode, payload in zip(g["mode"], g["payload"]):
            acc.merge(DistinctSketch.deserialize(mode, bytes(payload)))
        return pd.DataFrame(
            [{"day": g["day"].iloc[0], "n_users": acc.estimate()}]
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )


DISTINCT_USERS_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1
"""


# ------------------------------------------------------- quantile sketch

QUANTILE_CAP = 65536  # raw values kept exactly below this; centroids above


class QuantileSketch:
    """Mergeable quantile summary over float64 values.

    Exact mode keeps the raw sorted multiset (order-independent, bit-exact
    quantiles — the sf-scale regime, and what the DuckDB oracle checks).
    Past QUANTILE_CAP values it compresses to weighted centroids by
    averaging adjacent pairs (uniform 1-D cluster merge), bounding memory
    at CAP × 16 bytes per sketch while rank error stays ~n/CAP-scaled —
    the 100-TB regime, where a group holds 10^9+ values but the exchange
    still moves fixed-size summaries. Quantile queries interpolate on the
    weighted cumulative rank, reducing to numpy's linear interpolation
    (DuckDB ``quantile_cont`` semantics) when all weights are 1.
    """

    __slots__ = ("vals", "wts")

    def __init__(self) -> None:
        self.vals = np.empty(0, dtype=np.float64)
        self.wts = np.empty(0, dtype=np.int64)

    @property
    def exact(self) -> bool:
        return bool((self.wts == 1).all())

    @classmethod
    def from_values(cls, values: np.ndarray) -> "QuantileSketch":
        s = cls()
        v = np.sort(np.asarray(values, dtype=np.float64))
        s.vals, s.wts = v, np.ones(len(v), dtype=np.int64)
        s._compress()
        return s

    def serialize(self) -> tuple[bytes, bytes]:
        return self.vals.tobytes(), self.wts.tobytes()

    @classmethod
    def deserialize(cls, vals: bytes, wts: bytes) -> "QuantileSketch":
        s = cls()
        s.vals = np.frombuffer(vals, dtype=np.float64).copy()
        s.wts = np.frombuffer(wts, dtype=np.int64).copy()
        return s

    def merge(self, other: "QuantileSketch") -> None:
        v = np.concatenate([self.vals, other.vals])
        w = np.concatenate([self.wts, other.wts])
        order = np.argsort(v, kind="stable")
        self.vals, self.wts = v[order], w[order]
        self._compress()

    def _compress(self) -> None:
        while len(self.vals) > QUANTILE_CAP:
            n = len(self.vals) & ~1  # even prefix; odd tail carried through
            pv, pw = self.vals[:n].reshape(-1, 2), self.wts[:n].reshape(-1, 2)
            w = pw.sum(axis=1)
            v = (pv * pw).sum(axis=1) / w
            self.vals = np.concatenate([v, self.vals[n:]])
            self.wts = np.concatenate([w, self.wts[n:]])

    def quantile(self, q: float) -> float:
        if self.exact:
            return float(np.percentile(self.vals, q * 100.0, method="linear"))
        # weighted midpoint-rank interpolation over centroid means
        cum = np.cumsum(self.wts) - self.wts / 2.0
        total = float(self.wts.sum())
        return float(np.interp(q * total, cum, self.vals))


def sketch_quantiles_price(sf_dir: str) -> pd.DataFrame:
    """p50/p90/p99 of lineitem extendedprice per returnflag via mergeable
    QuantileSketch partials — exact at sf (per-flag cardinality below
    QUANTILE_CAP), bounded centroid summaries at 100-TB cardinalities."""
    from ..pipelines.analytics import r2

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for f, g in df.groupby("l_returnflag", sort=True):
            vals, wts = QuantileSketch.from_values(
                g["l_extendedprice"].to_numpy()
            ).serialize()
            rows.append({"l_returnflag": f, "vals": vals, "wts": wts})
        return pd.DataFrame(rows, columns=["l_returnflag", "vals", "wts"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = QuantileSketch()
        for vals, wts in zip(g["vals"], g["wts"]):
            acc.merge(QuantileSketch.deserialize(bytes(vals), bytes(wts)))
        return pd.DataFrame(
            [
                {
                    "l_returnflag": g["l_returnflag"].iloc[0],
                    "p50": float(r2(acc.quantile(0.5))),
                    "p90": float(r2(acc.quantile(0.9))),
                    "p99": float(r2(acc.quantile(0.99))),
                }
            ]
        )

    return (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("l_returnflag")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )


SKETCH_QUANTILES_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------- bloom semi-join

BLOOM_K = 7
BLOOM_BITS_PER_KEY = 10  # ~0.8 % FP at k=7


def _bloom_params(n_keys: int) -> tuple[int, np.uint64]:
    """(m_bits power of two, index mask)."""
    m = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys) * BLOOM_BITS_PER_KEY))))
    return m, np.uint64(m - 1)


def build_bloom(keys: np.ndarray) -> np.ndarray:
    """Pack int64 keys into a uint8 bit array (double hashing, k probes)."""
    keys = np.asarray(keys, dtype=np.int64)
    m, mask = _bloom_params(len(keys))
    bits = np.zeros(m >> 3, dtype=np.uint8)
    h1 = _splitmix64(keys.view(np.uint64))
    h2 = _splitmix64(h1) | np.uint64(1)
    for i in range(BLOOM_K):
        with np.errstate(over="ignore"):
            pos = ((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership mask (may include false positives, never
    false negatives)."""
    keys = np.asarray(keys, dtype=np.int64)
    mask = np.uint64(len(bits) * 8 - 1)
    h1 = _splitmix64(keys.view(np.uint64))
    h2 = _splitmix64(h1) | np.uint64(1)
    out = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        with np.errstate(over="ignore"):
            pos = ((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
        out &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return out


def bloom_semi_join_urgent(sf_dir: str) -> pd.DataFrame:
    """Semi-join: lineitem rows whose order is 1-URGENT. Bloom prefilter
    (broadcast bits, 7 vectorized probes) + exact binary-search verify on
    the broadcast sorted key array — exact output, bloom only saves work."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    keys_df = (
        read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        )
        .to_pandas()  # the SMALL side of the broadcast join, by design
    )
    keys = np.sort(keys_df["o_orderkey"].to_numpy(np.int64))
    bloom_ref = ray.put(build_bloom(keys))
    keys_ref = ray.put(keys)

    def probe(t: pa.Table) -> pa.Table:
        bits, sorted_keys = ray.get(bloom_ref), ray.get(keys_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cand = bloom_contains(bits, k)
        if cand.any():
            c = k[cand]
            pos = np.searchsorted(sorted_keys, c)
            pos[pos == len(sorted_keys)] = 0
            exact = sorted_keys[pos] == c
            cand[np.flatnonzero(cand)[~exact]] = False
        return t.filter(pa.array(cand))

    return (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(probe, batch_format="pyarrow")
        .to_pandas()
    )


BLOOM_SEMI_JOIN_SQL = """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


# ----------------------------------------------------------- count-min sketch
# Count-min (Cormode & Muthukrishnan, J. Algorithms 2005): the THIRD sketch
# shape next to HLL (distinct) and Misra-Gries (heavy hitters, corpus_stats)
# — point-frequency estimation in fixed memory with a one-sided error: the
# estimate never undercounts, and overcounts only by hash-collision mass.
# A 100-TB pipeline uses it where the term/URL/key universe outgrows even
# the Misra-Gries candidate set but per-key frequency lookups are needed
# (e.g. frequency-capped sampling, trap-URL rate limits).
#
# Scale shape: each batch folds its token counts into (row, bucket, cnt)
# partials — at most CMS_D x CMS_W rows per block, CONSTANT in corpus and
# vocabulary size — merged by one tiny groupby; the estimate pass probes
# the broadcast (CMS_D x CMS_W)-int table per term. Everything is integer
# arithmetic on md5-derived positions, so the SQL oracle reproduces the
# EXACT sketch — collisions, overestimates and all — the dedup_bloom_delta
# contract applied to counting.

CMS_D = 3  # sketch depth (independent rows)
CMS_W = 32  # buckets per row — sized BELOW the ~31-term synthetic vocab so
#             collisions really occur and the min/overestimate path is live

def _cms_positions(term: str) -> np.ndarray:
    import hashlib

    hx = hashlib.md5(term.encode("utf-8")).hexdigest()
    h1 = int(hx[:8], 16)
    h2 = int(hx[8:16], 16) * 2 + 1
    return (h1 + np.arange(CMS_D, dtype=np.int64) * h2) % CMS_W


def sketch_count_min_terms(sf_dir: str) -> pd.DataFrame:
    """(term, tf_exact, tf_est, overestimate) for every corpus term: the
    exact distributed term frequency next to its count-min estimate from a
    CMS_D x CMS_W sketch of the same token stream."""
    from ray.data.aggregate import Sum

    from .corpus_stats import _corpus_term_stats, _partial_term_counts

    def cms_partial(df: pd.DataFrame) -> pd.DataFrame:
        part = _partial_term_counts(df)  # Arrow table (corpus_stats)
        rows = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        for t, c in zip(
            part.column("term").to_pylist(), part.column("tf_part").to_pylist()
        ):
            rows[np.arange(CMS_D), _cms_positions(t)] += int(c)
        i, pos = np.nonzero(rows)
        return pd.DataFrame(
            {"i": i.astype(np.int64), "pos": pos.astype(np.int64),
             "cnt": rows[i, pos]}
        )

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cms = (
        docs.map_batches(cms_partial, batch_format="pandas")
        .groupby(["i", "pos"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    table = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    table[cms["i"].to_numpy(np.int64), cms["pos"].to_numpy(np.int64)] = cms[
        "cnt"
    ].to_numpy(np.int64)
    tref = ray.put(table)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        tab = ray.get(tref)
        est = np.array(
            [tab[np.arange(CMS_D), _cms_positions(t)].min() for t in df["term"]],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {
                "term": df["term"],
                "tf_exact": df["tf"].astype("int64"),
                "tf_est": est,
                "overestimate": est - df["tf"].to_numpy(np.int64),
            }
        )

    return (
        _corpus_term_stats(sf_dir)
        .map_batches(probe, batch_format="pandas")
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )


SKETCH_COUNT_MIN_SQL = rf"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (
  SELECT term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY term
), h AS (
  SELECT term, tf,
         ('0x' || substr(md5(term), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(term), 9, 8))::BIGINT * 2 + 1 AS h2
  FROM tf
), cms AS (
  SELECT i.i AS i, (h1 + i.i * h2) % {CMS_W} AS pos, SUM(tf)::BIGINT AS cnt
  FROM h CROSS JOIN (SELECT unnest(range({CMS_D})) AS i) i
  GROUP BY 1, 2
), est AS (
  SELECT h.term, h.tf, MIN(c.cnt)::BIGINT AS tf_est
  FROM h CROSS JOIN (SELECT unnest(range({CMS_D})) AS i) i
  JOIN cms c ON c.i = i.i AND c.pos = (h.h1 + i.i * h.h2) % {CMS_W}
  GROUP BY h.term, h.tf
)
SELECT term, tf AS tf_exact, tf_est, (tf_est - tf)::BIGINT AS overestimate
FROM est ORDER BY term
"""


# ---------------------------------------------------------- pure dense HLL
# The DENSE HyperLogLog path gets its own externally-checked estimate
# (distinct_users_daily's sketch is sparse-EXACT at sf scale, so its
# oracle never exercises register math). Flajolet et al. (2007) with the
# repo's determinism discipline: the 60-bit md5 hash, the register fold
# AND the harmonic sum are pure INTEGER arithmetic on both sides — the
# sum of 2^-M_j is carried as Σ 2^(RANK_MAX - M_j) (an int ≤ 2^61), so
# the only float ops are one division and (in the small-range regime)
# one ln, identical IEEE inputs in both engines, rounded at 2 dp.
#
# Scale shape: per-batch (day, register) max-rank partials → ONE int-only
# groupby-max exchange bounded by days × m (m = 1024) regardless of user
# cardinality; the per-day fold is m-bounded. At 10^9 users/day the
# exchange is identical — that is the point of the sketch.

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
_HLL_HASH_BITS = 60  # 15 md5 hex chars — fits signed 64-bit in both engines
_HLL_W_BITS = _HLL_HASH_BITS - HLL_P  # 50
_HLL_RANK_MAX = _HLL_W_BITS + 1  # 51
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_rank_rows(users: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per user id — md5 of the decimal string,
    mirrored literally in SQL."""
    import hashlib as _hl

    idx = np.empty(len(users), dtype=np.int64)
    rank = np.empty(len(users), dtype=np.int64)
    mask = (1 << _HLL_W_BITS) - 1
    for k, u in enumerate(users):
        h = int(_hl.md5(str(int(u)).encode()).hexdigest()[:15], 16)
        idx[k] = h >> _HLL_W_BITS
        w = h & mask
        rank[k] = _HLL_RANK_MAX - w.bit_length() if w else _HLL_RANK_MAX
    return idx, rank


def hll_users_daily(sf_dir: str) -> pd.DataFrame:
    """(day, n_hit, zeros, hll_estimate): per-day dense-HLL distinct-user
    estimate. n_hit/zeros are the register occupancy (integers); the
    estimate applies the standard small-range linear-counting correction."""
    import math

    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    from ..pipelines.analytics import r2

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partials(t: pa.Table) -> pd.DataFrame:
        day = pc.strftime(t["ts"], format="%Y-%m-%d").to_numpy(
            zero_copy_only=False
        )
        users = t["user_id"].to_numpy(zero_copy_only=False)
        idx, rank = _hll_rank_rows(users)
        df = pd.DataFrame({"day": day, "idx": idx, "rank": rank})
        # per-batch combiner: one row per (day, register)
        return (
            df.groupby(["day", "idx"], as_index=False)["rank"].max()
            .astype({"idx": "int64", "rank": "int64"})
        )

    regs = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["day", "idx"])
        .aggregate(Max("rank", alias_name="mj"))
        .to_pandas()  # ≤ days × m rows — register-bounded, never user-bounded
    )
    out = []
    for day, g in regs.groupby("day"):
        mj = g["mj"].to_numpy(np.int64)
        n_hit = len(mj)
        zeros = HLL_M - n_hit
        # harmonic sum as an exact integer: Σ 2^(RANK_MAX - Mj), empty
        # registers contribute 2^RANK_MAX each
        ssum = int((1 << (_HLL_RANK_MAX - mj)).sum()) + zeros * (
            1 << _HLL_RANK_MAX
        )
        est = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RANK_MAX) / float(ssum)
        if est <= 2.5 * HLL_M and zeros > 0:
            est = HLL_M * math.log(HLL_M / zeros)
        out.append(
            {"day": day, "n_hit": n_hit, "zeros": zeros,
             "hll_estimate": float(r2(est, 2))}
        )
    return (
        pd.DataFrame(out)
        .astype({"n_hit": "int64", "zeros": "int64"})
        .sort_values("day")
        .reset_index(drop=True)
    )


HLL_USERS_DAILY_SQL = f"""
WITH u AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
), h AS (
  SELECT day,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM u
), r AS (
  SELECT day, hv >> {_HLL_W_BITS} AS idx,
         CASE WHEN (hv & ((1::BIGINT << {_HLL_W_BITS}) - 1)) = 0
              THEN {_HLL_RANK_MAX}
              ELSE {_HLL_RANK_MAX}
                   - length(bin(hv & ((1::BIGINT << {_HLL_W_BITS}) - 1)))
         END AS rank
  FROM h
), m AS (
  SELECT day, idx, MAX(rank)::BIGINT AS mj FROM r GROUP BY day, idx
), s AS (
  SELECT day, COUNT(*)::BIGINT AS n_hit,
         ({HLL_M} - COUNT(*))::BIGINT AS zeros,
         (SUM(1::HUGEINT << ({_HLL_RANK_MAX} - mj))
          + ({HLL_M} - COUNT(*))::HUGEINT * (1::HUGEINT << {_HLL_RANK_MAX}))
           AS ssum
  FROM m GROUP BY day
)
SELECT day, n_hit, zeros,
       ROUND(CASE WHEN ({_HLL_ALPHA!r}::DOUBLE * {HLL_M} * {HLL_M}
                        * (1::BIGINT << {_HLL_RANK_MAX})::DOUBLE
                        / ssum::DOUBLE) <= 2.5 * {HLL_M} AND zeros > 0
                  THEN {HLL_M} * ln({HLL_M}::DOUBLE / zeros)
                  ELSE {_HLL_ALPHA!r}::DOUBLE * {HLL_M} * {HLL_M}
                       * (1::BIGINT << {_HLL_RANK_MAX})::DOUBLE
                       / ssum::DOUBLE
             END, 2) AS hll_estimate
FROM s ORDER BY day
"""
