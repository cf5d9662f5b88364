"""Deduplication suite over the documents table: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Corpus-scale generalization of the engine's URL-seen exact dedup (D1-D3):
*exact* uses the same hash-partition + per-group-first shape; the near-dup
family follows the standard sketch pipeline (shingle → minhash → band →
bucket groupby → verified candidate pairs — the mergeable-sketch pattern of
the MinHash/LSH literature). Every stage is map_batches / groupby; candidate
verification is exact, so emitted pairs have **exact precision** and the
sketch only bounds recall.

Determinism: all hash seeds fixed; pair output is (a < b) ordered and
sorted. No wall-clock, no RNG state.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

WORD_RE = re.compile(r"\S+")

N_PERM = 64
BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // BANDS
_MERSENNE = (1 << 61) - 1


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ------------------------------------------------------------------ exact
def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash(text) partition → keep min doc_id per group.
    The reduction is a groupby.aggregate(Min, Count) — a vectorized,
    combiner-style shuffle; a map_groups here would build one pandas frame
    per distinct hash (billions of tiny groups at corpus scale)."""
    from ray.data.aggregate import Count, Min

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_hash"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"].fillna("")
        ]
        return df[["doc_id", "text_hash"]]

    out = (
        _read_docs(sf_dir)
        .map_batches(key, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="dup_count"))
        .to_pandas()
    )
    return out.astype({"keep_doc_id": "int64", "dup_count": "int64"})


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id)::BIGINT AS keep_doc_id,
       COUNT(*)::BIGINT AS dup_count
FROM documents GROUP BY 1
"""


# ------------------------------------------------------- shingles/minhash
def _shingles(text: str, k: int = 3) -> set[bytes]:
    toks = WORD_RE.findall(text.lower())
    if len(toks) < k:
        return {(" ".join(toks)).encode()} if toks else set()
    return {" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)}


_PERM_A = np.array(
    [struct.unpack(">Q", hashlib.blake2b(f"a{i}".encode(), digest_size=8).digest())[0]
     % _MERSENNE or 1 for i in range(N_PERM)],
    dtype=np.uint64,
)
_PERM_B = np.array(
    [struct.unpack(">Q", hashlib.blake2b(f"b{i}".encode(), digest_size=8).digest())[0]
     % _MERSENNE for i in range(N_PERM)],
    dtype=np.uint64,
)


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    if not sh:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array([zlib.crc32(s) for s in sh], dtype=np.uint64)  # (S,)
    # (S, P) affine hash family; uint64 multiply wraps mod 2^64 (deterministic,
    # well-mixed), then reduced mod the Mersenne prime
    vals = (base[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.6) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs: signature per doc → explode to
    (band, band_hash, doc_id) → groupby band bucket → candidate pairs →
    exact-Jaccard verification (precision 1.0 by construction).

    Verification re-reads the two texts via a broadcast doc map — fine while
    the candidate set is small; at 10^10 docs the verify stage becomes a
    hash-join of candidates against the corpus on doc_id."""
    import ray

    docs = _read_docs(sf_dir)

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "band_hash": [], "doc_id": []}
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            sig = minhash_signature(text)
            for b in range(BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                rows["band"].append(b)
                rows["band_hash"].append(zlib.crc32(chunk.tobytes()))
                rows["doc_id"].append(doc_id)
        return pd.DataFrame(rows)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        out = {"a": [], "b": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out["a"].append(ids[i])
                out["b"].append(ids[j])
        return pd.DataFrame(out)

    cand = (
        docs.map_batches(bands, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )
    cand = cand.drop_duplicates().astype({"a": "int64", "b": "int64"})
    text_map = dict(
        zip(*(lambda d: (d["doc_id"], d["text"]))(_read_docs(sf_dir).to_pandas()))
    )
    sims = [jaccard(text_map[a], text_map[b]) for a, b in zip(cand["a"], cand["b"])]
    cand["jaccard"] = np.round(sims, 6)
    out = cand[cand["jaccard"] >= threshold].sort_values(["a", "b"]).reset_index(drop=True)
    return out


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.6, max_docs: int | None = None
) -> pd.DataFrame:
    """Exact n-gram Jaccard over all pairs — the brute-force oracle for the
    sketch path, distributed as: broadcast shingle-set list, one map_batches
    task per row-block computing its pair-block (O(n²) total, blocked)."""
    import ray

    pdf = _read_docs(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    if max_docs is not None:
        pdf = pdf.head(max_docs)
    sh = [_shingles(t) for t in pdf["text"].fillna("")]
    ids = pdf["doc_id"].to_numpy()
    ref = ray.put((ids, sh))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_sh = ray.get(ref)
        pos = {d: i for i, d in enumerate(all_ids)}
        out = {"a": [], "b": [], "jaccard": []}
        for d in batch["doc_id"]:
            i = pos[d]
            si = all_sh[i]
            for j in range(i + 1, len(all_ids)):
                sj = all_sh[j]
                if not si and not sj:
                    sim = 1.0
                else:
                    inter = len(si & sj)
                    sim = inter / (len(si) + len(sj) - inter) if (si or sj) else 1.0
                if sim >= threshold:
                    out["a"].append(all_ids[i])
                    out["b"].append(all_ids[j])
                    out["jaccard"].append(round(sim, 6))
        return pd.DataFrame(out)

    res = (
        ray.data.from_pandas(pdf[["doc_id"]])
        .map_batches(block, batch_format="pandas", batch_size=64)
        .to_pandas()
    )
    return res.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------- simhash
SIMHASH_BITS = 63  # fits in int64 → survives Arrow/pandas round-trips intact


def simhash64(text: str) -> int:
    toks = WORD_RE.findall(text.lower())
    if not toks:
        return 0
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    v = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for t in toks:
        h = np.uint64(
            struct.unpack(">Q", hashlib.blake2b(t.encode(), digest_size=8).digest())[0]
        )
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits.astype(bool), 1, -1)
    return int(((v > 0).astype(np.uint64) << shifts).sum())


def simhash_pairs(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup: 64-bit signature, 4×16-bit band blocking.
    Pigeonhole guarantees full recall for hamming ≤ 3 (4 bands, ≤3 flipped
    bits → some band untouched); above that recall is probabilistic.
    Verification is exact hamming, so precision is exact."""

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": [simhash64(t) for t in df["text"].fillna("")],
            }
        )

    sigs = _read_docs(sf_dir).map_batches(sig, batch_format="pandas").to_pandas()

    rows = {"band": [], "band_val": [], "doc_id": [], "simhash": []}
    for doc_id, h in zip(sigs["doc_id"].astype("int64"), sigs["simhash"].astype("int64")):
        h = int(h)
        for b in range(4):  # 16+16+16+15-bit bands over the 63-bit signature
            rows["band"].append(b)
            rows["band_val"].append((h >> (16 * b)) & 0xFFFF)
            rows["doc_id"].append(int(doc_id))
            rows["simhash"].append(h)
    bdf = pd.DataFrame(rows)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        hs = g["simhash"].tolist()
        out = {"a": [], "b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["hamming"].append(d)
        return pd.DataFrame(out)

    cand = (
        ray.data.from_pandas(bdf)
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


# ------------------------------------------------------------- embeddings
def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.92) -> pd.DataFrame:
    """Embedding-cosine near-dup: normalized matrix broadcast once
    (ray.put), each task computes its row-block × full-matrix product —
    blocked brute force (exact). The scale path replaces the full broadcast
    with IVF coarse buckets (see ops/ann.py)."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    matn = mat / np.clip(norms, 1e-30, None)
    ids = emb["vec_id"].to_numpy()
    ref = ray.put((ids, matn))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m = ray.get(ref)
        pos = {d: i for i, d in enumerate(all_ids)}
        idx = np.array([pos[d] for d in batch["vec_id"]])
        sims = m[idx] @ m.T  # (block, N)
        out = {"a": [], "b": [], "cosine": []}
        for row, i in enumerate(idx):
            js = np.nonzero(sims[row] >= threshold)[0]
            for j in js:
                if j > i:
                    out["a"].append(int(all_ids[i]))
                    out["b"].append(int(all_ids[j]))
                    out["cosine"].append(round(float(sims[row, j]), 4))
        return pd.DataFrame(out)

    res = (
        ray.data.from_pandas(emb[["vec_id"]])
        .map_batches(block, batch_format="pandas", batch_size=256)
        .to_pandas()
    )
    if len(res) == 0:
        return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
            {"a": "int64", "b": "int64", "cosine": "float64"}
        )
    return res.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_neardup_sql(threshold: float = 0.92) -> str:
    return f"""
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
"""
