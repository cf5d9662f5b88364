"""Host-level mirror detection and per-source boilerplate inventory.

Two classic crawl-infrastructure operators over the ``documents`` table
(``source`` plays the host role the reference's per-city spiders play,
funda_spider.py's one-spider-per-place layout):

* ``mirror_sources`` — Broder-style *mirror detection*: source (host)
  pairs whose shingle sets overlap. A production frontier collapses
  mirrored hosts before scheduling (crawling a mirror is pure waste), so
  the resemblance table is frontier input, not analytics. Shape: one
  explode pass emits the per-source DISTINCT k-gram set as narrow rows,
  ONE gram-bucket exchange folds grams globally (all rows of a gram land
  in one bucket), pair partials + per-source set sizes flow through a
  second tiny exchange keyed by pair — the corpus text itself never
  crosses an exchange twice and the driver only ever sees host-pair rows.
  Stop-gram cap: a gram present on > MIRROR_MAXSRC sources is web
  boilerplate (nav bars / footers); it is excluded on BOTH sides (the
  oracle's HAVING mirrors it), which also bounds the per-gram pair
  fan-out at MAXSRC² — the standard stop-word discipline of the mirror-
  detection literature, not a silent truncation.

* ``boilerplate_grams`` — the complementary inventory: per source, the
  k-grams appearing in ≥ BOILER_MIN_DF of that source's documents — the
  template/boilerplate table a cleaning pipeline subtracts before
  quality scoring (CCNet-style per-domain template removal). Shape:
  per-document distinct grams are a per-row set (a doc lives in exactly
  one row, so no cross-batch dedup is needed), batches pre-aggregate
  (combiner) and ONE (source, gram)-bucketed exchange sums document
  frequencies; only rows at/above the threshold reach the driver.

At 100 TB the gram strings themselves would be 64-bit hashes through the
exchange (8 bytes vs ~30); the string form is kept here so the DuckDB
oracle joins raw grams and parity is exact by construction rather than
modulo hash collisions.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean

WORD_RE = re.compile(r"\S+")

MIRROR_K = 5  # words per shingle
MIRROR_MIN_SHARED = 2  # report pairs sharing >= this many distinct grams
MIRROR_MAXSRC = 64  # stop-gram cap (mirrored in the oracle's HAVING)
BOILER_K = 3
BOILER_MIN_DF = 3  # gram must appear in >= this many docs of a source
_FB = 256  # fold buckets (the bucketized-fold idiom, relational.py)


def _read(sf_dir: str, columns: list[str]):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _grams(text: str, k: int) -> set[str]:
    w = WORD_RE.findall(text.lower())
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _crc_bucket(vals: pd.Series) -> pd.Series:
    return vals.map(lambda s: zlib.crc32(s.encode()) % _FB).astype("int64")


# ------------------------------------------------------------ mirror pairs
def mirror_sources(sf_dir: str) -> pd.DataFrame:
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        seen: set[tuple[str, str]] = set()
        for src, txt in zip(df["source"], df["text"].fillna("")):
            for g in _grams(txt, MIRROR_K):
                seen.add((src, g))
        if not seen:
            return pd.DataFrame({"source": pd.Series([], dtype="object"),
                                 "gram": pd.Series([], dtype="object")})
        src, gram = zip(*seen)
        return pd.DataFrame({"source": list(src), "gram": list(gram)})

    def gram_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["gb"] = _crc_bucket(df["gram"])
        return df

    def gram_fold(g: pd.DataFrame) -> pd.DataFrame:
        # every row of a gram is in this bucket -> global distinct + cap
        g = g.drop_duplicates(["source", "gram"])
        sizes = g.groupby("gram")["source"].transform("size")
        g = g[sizes <= MIRROR_MAXSRC]  # stop-gram: boilerplate, excluded
        # per-source partial set sizes (kind 0) + pair partials (kind 1)
        totals = g.groupby("source", as_index=False).size()
        totals = pd.DataFrame(
            {"kind": 0, "sa": totals["source"], "sb": "",
             "n": totals["size"].astype("int64")}
        )
        m = g.merge(g, on="gram", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        pairs = (
            m.groupby(["source_a", "source_b"], as_index=False)
            .size()
            .rename(columns={"source_a": "sa", "source_b": "sb", "size": "n"})
        )
        pairs.insert(0, "kind", 1)
        out = pd.concat([totals, pairs], ignore_index=True)
        return out.astype({"kind": "int64", "n": "int64"})

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pb"] = _crc_bucket(df["sa"] + "|" + df["sb"])
        return df

    def key_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["kind", "sa", "sb"], as_index=False)["n"].sum()

    rows = (
        _read(sf_dir, ["source", "text"])
        .map_batches(explode, batch_format="pandas")
        .map_batches(gram_bucket, batch_format="pandas")
        .groupby("gb")
        .map_groups(gram_fold, batch_format="pandas")
        .map_batches(key_bucket, batch_format="pandas")
        .groupby("pb")
        .map_groups(key_fold, batch_format="pandas")
        .to_pandas()  # O(#hosts + #qualifying pairs) rows only
    )
    ng = dict(
        zip(rows.loc[rows["kind"] == 0, "sa"], rows.loc[rows["kind"] == 0, "n"])
    )
    pairs = rows[(rows["kind"] == 1) & (rows["n"] >= MIRROR_MIN_SHARED)].copy()
    if pairs.empty:
        return pd.DataFrame(
            {"src_a": pd.Series([], dtype="object"),
             "src_b": pd.Series([], dtype="object"),
             "shared_grams": pd.Series([], dtype="int64"),
             "resemblance": pd.Series([], dtype="float64")}
        )
    shared = pairs["n"].to_numpy(np.float64)
    union = (
        pairs["sa"].map(ng).to_numpy(np.float64)
        + pairs["sb"].map(ng).to_numpy(np.float64)
        - shared
    )
    from ..pipelines.analytics import r2

    return (
        pd.DataFrame(
            {"src_a": pairs["sa"], "src_b": pairs["sb"],
             "shared_grams": pairs["n"].astype("int64"),
             "resemblance": r2(shared / union, 6)}
        )
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )


MIRROR_SOURCES_SQL = rf"""
WITH w AS (
  SELECT source, regexp_extract_all(lower(text), '\S+') AS w FROM documents
),
g AS (
  SELECT DISTINCT source,
         unnest(list_transform(
           generate_series(1, len(w) - {MIRROR_K} + 1),
           i -> array_to_string(w[i::INT : i::INT + {MIRROR_K} - 1], ' ')
         )) AS gram
  FROM w WHERE len(w) >= {MIRROR_K}
),
ok AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= {MIRROR_MAXSRC}),
gg AS (SELECT g.source, g.gram FROM g JOIN ok USING (gram)),
n AS (SELECT source, COUNT(*) AS ng FROM gg GROUP BY source),
p AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
  FROM gg a JOIN gg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, p.shared::BIGINT AS shared_grams,
       ROUND(p.shared::DOUBLE / (na.ng + nb.ng - p.shared), 6) AS resemblance
FROM p
JOIN n na ON na.source = p.src_a
JOIN n nb ON nb.source = p.src_b
WHERE p.shared >= {MIRROR_MIN_SHARED}
ORDER BY src_a, src_b
"""


# ------------------------------------------------------- boilerplate grams
def boilerplate_grams(sf_dir: str) -> pd.DataFrame:
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        part: dict[tuple[str, str], int] = {}
        for src, txt in zip(df["source"], df["text"].fillna("")):
            for g in _grams(txt, BOILER_K):  # distinct per doc by set()
                k = (src, g)
                part[k] = part.get(k, 0) + 1  # in-batch combiner
        if not part:
            return pd.DataFrame({"source": pd.Series([], dtype="object"),
                                 "gram": pd.Series([], dtype="object"),
                                 "df": pd.Series([], dtype="int64")})
        keys = list(part)
        return pd.DataFrame(
            {"source": [k[0] for k in keys], "gram": [k[1] for k in keys],
             "df": pd.Series([part[k] for k in keys], dtype="int64")}
        )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["b"] = _crc_bucket(df["source"] + "|" + df["gram"])
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["source", "gram"], as_index=False)["df"].sum()
        # all partials of a (source, gram) land here -> threshold is global
        return tot[tot["df"] >= BOILER_MIN_DF].astype({"df": "int64"})

    return (
        _read(sf_dir, ["source", "text"])
        .map_batches(explode, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # only >= threshold rows reach the driver
        .sort_values(["source", "gram"])
        .reset_index(drop=True)
    )


BOILERPLATE_GRAMS_SQL = rf"""
WITH w AS (
  SELECT source, doc_id, regexp_extract_all(lower(text), '\S+') AS w
  FROM documents
),
g AS (
  SELECT DISTINCT source, doc_id,
         unnest(list_transform(
           generate_series(1, len(w) - {BOILER_K} + 1),
           i -> array_to_string(w[i::INT : i::INT + {BOILER_K} - 1], ' ')
         )) AS gram
  FROM w WHERE len(w) >= {BOILER_K}
)
SELECT source, gram, COUNT(*)::BIGINT AS df
FROM g GROUP BY source, gram
HAVING COUNT(*) >= {BOILER_MIN_DF}
ORDER BY source, gram
"""


# ------------------------------------------------- boilerplate fraction
def boilerplate_fraction(sf_dir: str) -> pd.DataFrame:
    """Per-document boilerplate load: of the document's distinct
    ``BOILER_K``-grams, the fraction that are source-level boilerplate
    (document frequency ≥ ``BOILER_MIN_DF`` within the source) — the
    CCNet-style signal a cleaning pipeline thresholds on before quality
    scoring (a page that is mostly its host's template carries little
    content).

    Scale shape: the SAME narrow (source, gram, doc_id) rows feed both
    the boilerplate decision and the per-doc tally — one explode pass,
    ONE (source, gram)-bucketed exchange where each gram's global df is
    known (all of its rows land in the bucket) and per-doc partials are
    emitted, then ONE doc-bucketed exchange sums them. Text crosses no
    exchange; every exchanged row is three scalars."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, str, int]] = []
        for did, src, txt in zip(
            df["doc_id"].astype("int64"), df["source"], df["text"].fillna("")
        ):
            for g in _grams(txt, BOILER_K):
                rows.append((src, g, did))
        if not rows:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "gram": pd.Series([], dtype="object"),
                 "doc_id": pd.Series([], dtype="int64")}
            )
        src, gram, did = zip(*rows)
        return pd.DataFrame(
            {"source": list(src), "gram": list(gram),
             "doc_id": pd.Series(did, dtype="int64")}
        )

    def gram_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["gb"] = _crc_bucket(df["source"] + "|" + df["gram"])
        return df

    def gram_fold(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a (source, gram) land here -> its df is global
        sizes = g.groupby(["source", "gram"])["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "matched": (sizes >= BOILER_MIN_DF).astype("int64"),
            }
        )

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["db"] = (df["doc_id"] % _FB).astype("int64")
        return df

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            total_grams=("matched", "size"), boiler_grams=("matched", "sum")
        )
        return out.astype({"total_grams": "int64", "boiler_grams": "int64"})

    from ..pipelines.analytics import r2

    out = (
        _read(sf_dir, ["doc_id", "source", "text"])
        .map_batches(explode, batch_format="pandas")
        .map_batches(gram_bucket, batch_format="pandas")
        .groupby("gb")
        .map_groups(gram_fold, batch_format="pandas")
        .map_batches(doc_bucket, batch_format="pandas")
        .groupby("db")
        .map_groups(doc_fold, batch_format="pandas")
        .to_pandas()  # one row per document
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["boiler_frac"] = r2(out["boiler_grams"] / out["total_grams"], 6)
    return out[["doc_id", "total_grams", "boiler_grams", "boiler_frac"]]


BOILERPLATE_FRACTION_SQL = rf"""
WITH w AS (
  SELECT source, doc_id, regexp_extract_all(lower(text), '\S+') AS w
  FROM documents
),
g AS (
  SELECT DISTINCT source, doc_id,
         unnest(list_transform(
           generate_series(1, len(w) - {BOILER_K} + 1),
           i -> array_to_string(w[i::INT : i::INT + {BOILER_K} - 1], ' ')
         )) AS gram
  FROM w WHERE len(w) >= {BOILER_K}
),
d AS (SELECT source, gram, COUNT(*) AS df FROM g GROUP BY 1, 2)
SELECT g.doc_id, COUNT(*)::BIGINT AS total_grams,
       COUNT(*) FILTER (d.df >= {BOILER_MIN_DF})::BIGINT AS boiler_grams,
       ROUND(COUNT(*) FILTER (d.df >= {BOILER_MIN_DF})::DOUBLE / COUNT(*), 6)
         AS boiler_frac
FROM g JOIN d USING (source, gram)
GROUP BY g.doc_id ORDER BY doc_id
"""


# --------------------------------------------------------- mirror collapse
MIRROR_COLLAPSE_MIN = 0.02  # resemblance edge threshold (synthetic scale;
# production mirrors read >= 0.8 — the synthetic corpus shares templated
# phrases, not full mirrors, so the threshold is set where it discriminates)


def mirror_collapse(sf_dir: str) -> pd.DataFrame:
    """Frontier host-collapse table: connected components over the mirror
    pairs (resemblance ≥ MIRROR_COLLAPSE_MIN), representative = the
    lexicographically smallest host of each component; a frontier drops
    every URL whose host is not its component's representative before
    scheduling (crawling a mirror is pure waste — Broder's original use).

    The union-find runs on the PAIR table, which is host-pair-bounded
    (the frontier's dimension-table scale, ≪ corpus — the same bound that
    lets mirror_sources return it at all); per-source doc counts are a
    distributed combiner groupby."""
    from ray.data.aggregate import Sum

    pairs = mirror_sources(sf_dir)
    pairs = pairs[pairs["resemblance"] >= MIRROR_COLLAPSE_MIN]

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["src_a"], pairs["src_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    counts = (
        _read(sf_dir, ["source"])
        .map_batches(
            lambda df: df.groupby("source", as_index=False)
            .size()
            .rename(columns={"size": "n_part"}),
            batch_format="pandas",
        )
        .groupby("source")
        .aggregate(Sum("n_part", alias_name="n_docs"))
        .to_pandas()
    )
    counts["n_docs"] = counts["n_docs"].astype("int64")
    counts["representative"] = counts["source"].map(find)
    counts["kept"] = counts["representative"] == counts["source"]
    return (
        counts[["source", "representative", "n_docs", "kept"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


MIRROR_COLLAPSE_SQL = rf"""
WITH RECURSIVE w AS (
  SELECT source, regexp_extract_all(lower(text), '\S+') AS w FROM documents
),
g AS (
  SELECT DISTINCT source,
         unnest(list_transform(
           generate_series(1, len(w) - {MIRROR_K} + 1),
           i -> array_to_string(w[i::INT : i::INT + {MIRROR_K} - 1], ' ')
         )) AS gram
  FROM w WHERE len(w) >= {MIRROR_K}
),
ok AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= {MIRROR_MAXSRC}),
gg AS (SELECT g.source, g.gram FROM g JOIN ok USING (gram)),
n AS (SELECT source, COUNT(*) AS ng FROM gg GROUP BY source),
p AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
  FROM gg a JOIN gg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
),
mp AS (
  SELECT p.src_a, p.src_b
  FROM p
  JOIN n na ON na.source = p.src_a
  JOIN n nb ON nb.source = p.src_b
  WHERE p.shared >= {MIRROR_MIN_SHARED}
    AND ROUND(p.shared::DOUBLE / (na.ng + nb.ng - p.shared), 6)
          >= {MIRROR_COLLAPSE_MIN}
),
edges AS (SELECT src_a AS u, src_b AS v FROM mp
          UNION SELECT src_b, src_a FROM mp),
reach(x, r) AS (
  SELECT u, v FROM edges
  UNION
  SELECT reach.x, e.v FROM reach JOIN edges e ON e.u = reach.r
),
rep AS (
  SELECT x AS source, LEAST(x, MIN(r)) AS representative
  FROM reach GROUP BY x
)
SELECT d.source,
       COALESCE(rep.representative, d.source) AS representative,
       COUNT(*)::BIGINT AS n_docs,
       (COALESCE(rep.representative, d.source) = d.source) AS kept
FROM documents d LEFT JOIN rep ON rep.source = d.source
GROUP BY 1, 2 ORDER BY d.source
"""
