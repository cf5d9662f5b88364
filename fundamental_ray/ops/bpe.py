"""BPE tokenizer training over the documents table (Sennrich, Haddow,
Birch 2016 — "Neural Machine Translation of Rare Words with Subword
Units"): iteratively merge the most frequent adjacent symbol pair,
starting from characters + an end-of-word marker.

Scale shape (how production trainers — sentencepiece, HF tokenizers —
actually run at corpus scale): the ONLY corpus-proportional work is the
word-frequency count, here a per-batch (term → tf) combiner + driver fold
(vocab-bounded by Heaps' law, the vocab_topk shape); every merge iteration
then runs on the WORD-FREQUENCY TABLE, never the corpus. The corpus text
crosses no exchange.

Determinism contract: best pair = (count desc, left asc, right asc) —
integer count + codepoint string order, no floats anywhere; merge
application is the standard greedy left-to-right non-overlapping scan,
which equals the "keep every other match within a run of consecutive
matches" parity rule the SQL oracle implements (after merging at j, the
scan resumes at j+2, so runs of overlapping matches keep positions
run_start, run_start+2, …).

Oracle: the full training loop UNROLLED — per iteration a pair-count CTE,
a top-1 CTE, a match-position CTE, a run-parity CTE and a rebuild CTE
(MATERIALIZED: chained CTEs re-expand exponentially otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .text import WORD_RE, _read_docs

BPE_MERGES = 10
END_MARK = "</w>"


def _word_freqs(sf_dir: str) -> pd.DataFrame:
    """(word, freq) via the distributed combiner + driver fold."""

    def partial_tf(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        tf: dict[str, int] = {}
        for ts in toks:
            for t in ts:
                tf[t] = tf.get(t, 0) + 1
        terms = sorted(tf)
        return pd.DataFrame(
            {"word": terms,
             "tf": np.array([tf[t] for t in terms], dtype=np.int64)}
        )

    return (
        _read_docs(sf_dir)
        .map_batches(partial_tf, batch_format="pandas")
        .to_pandas()  # vocab × n_blocks rows — Heaps-bounded
        .groupby("word", as_index=False)
        .sum()
    )


def _apply_merge(syms: list, left: str, right: str) -> list:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train(sf_dir: str, n_merges: int = BPE_MERGES):
    """(merge table, final per-word symbol lists, word list) — one
    distributed word-frequency pass; shared by train and encode."""
    freqs = _word_freqs(sf_dir)
    vocab = [
        (list(w) + [END_MARK], int(f))
        for w, f in zip(freqs["word"], freqs["tf"])
    ]
    rows = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for syms, f in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rows.append(
            {"step": step, "l_sym": left, "r_sym": right,
             "merged": left + right, "pair_count": cnt}
        )
        vocab = [(_apply_merge(s, left, right), f) for s, f in vocab]
    merges = pd.DataFrame(rows).astype({"step": "int64", "pair_count": "int64"})
    return merges, [s for s, _ in vocab], list(freqs["word"])


def bpe_train(sf_dir: str, n_merges: int = BPE_MERGES) -> pd.DataFrame:
    """(step, l_sym, r_sym, merged, pair_count) for each learned merge."""
    return _train(sf_dir, n_merges)[0]


def _bpe_ctes(n_merges: int = BPE_MERGES) -> list:
    """The unrolled training CTEs (toks, v0, then x/b/k/v per iteration)
    — shared by the train oracle and the encode oracle."""
    ctes = [
        r"""toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
)""",
        f"""v0 AS MATERIALIZED (
  SELECT word, COUNT(*)::BIGINT AS freq,
         array_to_string(string_split(word, ''), ' ') || ' {END_MARK}' AS sym
  FROM toks GROUP BY word
)""",
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(f"""x{i} AS MATERIALIZED (
  SELECT word, freq, unnest(string_split(sym, ' ')) AS s,
         unnest(range(len(string_split(sym, ' ')))) AS j
  FROM v{p}
)""")
        ctes.append(f"""b{i} AS MATERIALIZED (
  SELECT a.s AS l, b.s AS r, SUM(a.freq)::BIGINT AS cnt
  FROM x{i} a JOIN x{i} b ON a.word = b.word AND b.j = a.j + 1
  GROUP BY a.s, b.s
  ORDER BY cnt DESC, l, r LIMIT 1
)""")
        ctes.append(f"""k{i} AS MATERIALIZED (
  SELECT word, j FROM (
    SELECT word, j, run, MIN(j) OVER (PARTITION BY word, run) AS run0
    FROM (
      SELECT a.word, a.j,
             a.j - ROW_NUMBER() OVER (PARTITION BY a.word ORDER BY a.j) AS run
      FROM x{i} a JOIN x{i} nb ON nb.word = a.word AND nb.j = a.j + 1, b{i}
      WHERE a.s = b{i}.l AND nb.s = b{i}.r
    )
  ) WHERE (j - run0) % 2 = 0
)""")
        ctes.append(f"""v{i} AS MATERIALIZED (
  SELECT x.word, x.freq,
         string_agg(
           CASE WHEN kh.j IS NOT NULL THEN x.s || xn.s
                WHEN kp.j IS NOT NULL THEN NULL
                ELSE x.s END, ' ' ORDER BY x.j) AS sym
  FROM x{i} x
  LEFT JOIN x{i} xn ON xn.word = x.word AND xn.j = x.j + 1
  LEFT JOIN k{i} kh ON kh.word = x.word AND kh.j = x.j
  LEFT JOIN k{i} kp ON kp.word = x.word AND kp.j = x.j - 1
  GROUP BY x.word, x.freq
)""")
    return ctes


def bpe_train_sql(n_merges: int = BPE_MERGES) -> str:
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS step, l AS l_sym, r AS r_sym, l || r AS merged, "
        f"cnt AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + f"\n{union}\nORDER BY step"


BPE_TRAIN_SQL = bpe_train_sql()


# ---------------------------------------------------------------- encode
# The apply half: tokenize the corpus with the learned merge table. Every
# word's final symbol count is a pure function of the merge list, so the
# encoder is a vocab-bounded (word → n_sym) dict broadcast + a vectorized
# per-doc gather-sum — the corpus streams through one map_batches and
# never shuffles. Oracle: reuse the unrolled training CTEs' final vocab
# state v{N} (word → sym) and join it back to the exploded corpus.


def bpe_encode(sf_dir: str, n_merges: int = BPE_MERGES) -> pd.DataFrame:
    """(doc_id, n_words, n_bpe_tokens) under the learned merges — training
    (and its one distributed word-count pass) runs once; only the
    vocab-bounded (word → n_sym) table is broadcast."""
    _, final_syms, words = _train(sf_dir, n_merges)
    n_sym = {w: len(s) for w, s in zip(words, final_syms)}
    ref = ray.put(n_sym)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_words": toks.str.len().astype("int64"),
                "n_bpe_tokens": toks.map(
                    lambda ts: sum(table[t] for t in ts)
                ).astype("int64"),
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(encode, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def bpe_encode_sql(n_merges: int = BPE_MERGES) -> str:
    return (
        "WITH " + ",\n".join(_bpe_ctes(n_merges))
        + f""",
wlen AS (SELECT word, len(string_split(sym, ' '))::BIGINT AS n_sym FROM v{n_merges}),
dt AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS word
  FROM documents
)
SELECT dt.doc_id, COUNT(*)::BIGINT AS n_words,
       SUM(wlen.n_sym)::BIGINT AS n_bpe_tokens
FROM dt JOIN wlen USING (word)
GROUP BY dt.doc_id
"""
    )


BPE_ENCODE_SQL = bpe_encode_sql()
