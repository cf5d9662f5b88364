"""Fuzzy string-similarity self-join over the corpus vocabulary — the
typo/variant unification step of query-log and vocabulary normalization
(OCR noise, tokenizer near-misses), expressed with FastSS
deletion-neighborhood blocking (Bocek, Hunt & Stiller, "Fast Similarity
Search in Large Dictionaries", 2007): if ed(x, y) <= k then the
k-deletion neighborhoods of x and y intersect, so candidate generation is
a hash join on deletion variants instead of a vocabulary cross product.

Scale shape: the vocabulary comes from the corpus_stats combiner (token
stream never exchanges); each term fans out to its <= 1 + L + C(L,2)
deletion variants (map-side, bounded by term length, independent of
corpus size); ONE variant-keyed groupby forms candidate pairs inside each
variant bucket; a pair-keyed groupby dedups candidates that share several
variants; the exact Levenshtein DP then verifies only the candidates —
at a 10^8-term web vocabulary this touches ~|pairs| strings, never
|vocab|^2. The oracle IS the cross product (levenshtein in DuckDB), so a
blocking recall bug (a missed pair) fails the row count, and a verify bug
(a false pair) fails the hash.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

FUZZY_K = 2  # maximum edit distance


def _del_variants(term: str, k: int = FUZZY_K) -> set[str]:
    """All strings obtained by deleting at most k characters."""
    out = {term}
    for d in range(1, min(k, len(term)) + 1):
        for pos in combinations(range(len(term)), d):
            keep = [c for i, c in enumerate(term) if i not in pos]
            out.add("".join(keep))
    return out


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (matches DuckDB's ``levenshtein``)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_term_pairs(sf_dir: str) -> pd.DataFrame:
    """All unordered vocabulary pairs with edit distance <= FUZZY_K:
    (term_a, term_b, dist), term_a < term_b, sorted."""
    from ray.data.aggregate import Count

    from .corpus_stats import _corpus_term_stats

    def fan(df: pd.DataFrame) -> pa.Table:
        var, term = [], []
        for t in df["term"]:
            for v in _del_variants(t):
                var.append(v)
                term.append(t)
        return pa.table(
            {"variant": pa.array(var, pa.string()), "term": pa.array(term, pa.string())}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        terms = sorted(set(g["term"]))
        a, b = [], []
        for x, y in combinations(terms, 2):
            a.append(x)
            b.append(y)
        return pd.DataFrame(
            {"term_a": pd.Series(a, dtype="string"),
             "term_b": pd.Series(b, dtype="string")}
        )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        d = np.array(
            [_levenshtein(x, y) for x, y in zip(df["term_a"], df["term_b"])],
            dtype=np.int64,
        )
        out = df.loc[d <= FUZZY_K, ["term_a", "term_b"]].copy()
        out["dist"] = d[d <= FUZZY_K]
        return out.astype({"term_a": "string", "term_b": "string", "dist": "int64"})

    out = (
        _corpus_term_stats(sf_dir)
        .map_batches(fan, batch_format="pandas")
        .groupby("variant")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["term_a", "term_b"])  # dedup shared-variant candidates
        .aggregate(Count(alias_name="n_var"))
        .map_batches(verify, batch_format="pandas")
        .to_pandas()
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    return out


FUZZY_TERM_PAIRS_SQL = rf"""
WITH t AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
)
SELECT a.term AS term_a, b.term AS term_b,
       levenshtein(a.term, b.term)::BIGINT AS dist
FROM t a JOIN t b
  ON a.term < b.term AND levenshtein(a.term, b.term) <= {FUZZY_K}
ORDER BY term_a, term_b
"""


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection -------------------------------------
# Achlioptas (JCSS 2003) database-friendly JL: project the 64-dim embedding
# to JL_DIM dims with a {+1, -1} sign matrix instead of Gaussians — the
# cheap first stage in front of clustering / near-dup at 100 TB, where
# shrinking the vector bytes 8x shrinks every downstream exchange 8x.
#
# Scale shape: pure map — the (64 x JL_DIM) sign matrix is a deterministic
# function of (dim, j) via the repo-wide md5 contract (no RNG state to
# ship; any worker, any engine, any year regenerates it bit-identically),
# so the pass is one vectorized map_batches with zero exchange.
# Determinism: Y = X @ R / sqrt(JL_DIM) rounded half-away at 6 dp; the
# oracle regenerates R in SQL from the same md5 and applies the same
# half-away 6-dp rounding. KNOWN REPO-WIDE CONVENTION (shared with
# ann_sq_topk / ann_pq_topk cosines): the pre-round double is a 64-term
# float sum — numpy matmul may associate pairwise/BLAS-order while DuckDB
# SUM folds sequentially, so a sum landing within an ulp of a 6-dp
# boundary could in principle flip the rounded digit. Accepted risk: the
# synthetic embeddings are ~1-ulp-stable at 6 dp (verified oracle-green
# at sf0.001/0.01/0.1); pinning the accumulation order would force a
# scalar Python fold in the hot map, a 50x slowdown not worth the
# theoretical tie.

JL_DIM = 8


def _jl_sign(d: int, j: int) -> int:
    import hashlib

    hx = hashlib.md5(f"jl:{d}:{j}".encode()).hexdigest()
    return 1 if int(hx[:8], 16) % 2 == 0 else -1


def _jl_matrix(dim: int, k: int = JL_DIM) -> "np.ndarray":
    return np.array(
        [[_jl_sign(d, j) for j in range(k)] for d in range(dim)], dtype=np.float64
    )


def random_projection(sf_dir: str, k: int = JL_DIM) -> pd.DataFrame:
    """(vec_id, p0..p{k-1}): the JL-projected embedding, 6-dp rounded."""
    from fundamental_ray.sources.parquet import read_parquet_clean

    from ..pipelines.analytics import r2

    def block(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        R = _jl_matrix(mat.shape[1], k)
        proj = r2(mat @ R / np.sqrt(float(k)), 6)
        out = {"vec_id": df["vec_id"].astype("int64")}
        for j in range(k):
            out[f"p{j}"] = proj[:, j]
        return pd.DataFrame(out)

    return (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(block, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def random_projection_sql(k: int = JL_DIM) -> str:
    cols = ",\n       ".join(
        f"ROUND(SUM(v * CASE WHEN ('0x' || substr(md5('jl:' || (d - 1)::VARCHAR"
        f" || ':{j}'), 1, 8))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)"
        f" / sqrt({k}.0), 6) AS p{j}"
        for j in range(k)
    )
    return f"""
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
)
SELECT vec_id, {cols}
FROM u GROUP BY vec_id ORDER BY vec_id
"""


RANDOM_PROJECTION_SQL = random_projection_sql()
