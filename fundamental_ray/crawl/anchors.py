"""Anchor-text aggregation over the page table — the in-link signal a
web-scale crawler/indexer derives while parsing.

Every anchor ``<a href=...>text</a>`` a crawler parses carries two signals
beyond the frontier candidate itself: the in-link COUNT per target (the
authority input OPIC/PageRank consume — ops/graph.py takes this table's
shape as its edge input at 100 TB) and the anchor TEXT, the
highest-precision relevance description of the target page in classic web
search (it describes the target, not the source). The reference's list
pages carry exactly these anchors (M1's HTML tier parses them,
funda_spider.py:118-131; our synthetic list pages reproduce the layout,
synth/corpus.py:106-140); this op aggregates them per TARGET.

Semantics (mirrored exactly by the SQL oracle):
  * anchors = every ``<a [attrs] href="H">T</a>`` in the page html
    (detail pages have none; list pages have listing anchors with
    RELATIVE hrefs, a relative noise anchor, and an ABSOLUTE next-page
    anchor — both resolution branches are exercised);
  * resolution = ``H`` when absolute (``http…``), else
    ``https://{page host}{H}`` (the urljoin case for root-relative hrefs,
    the only relative form the corpus — like funda — emits);
  * per target: total in-links, distinct linking pages, distinct anchor
    texts, and the ``|``-joined sorted distinct text list (GROUP_CONCAT).

Scale shape: one pruned read (url + html only), vectorized regex findall
per batch with an IN-BATCH combiner (a page's anchors live in its own
row, so per-(target, text, source) counts are complete per batch), then
ONE target-keyed exchange where counts merge and the distinct-text list
folds — html never crosses an exchange, and the exchange moves
(target, text, source) partials, bounded by the link graph, not the
corpus bytes.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

ANCHOR_RE = re.compile(r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>')


def anchor_texts(sf_dir: str) -> pd.DataFrame:
    """(target_url, n_links, n_pages, n_texts, anchor_texts) per anchor
    target across the whole page table."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner: counts per (target, text, source page)
        tgt, txt, src = [], [], []
        for url, html in zip(df["url"], df["html"]):
            h = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else str(html)
            if "<a " not in h:
                continue
            host = url.split("://", 1)[1].split("/", 1)[0]
            for href, text in ANCHOR_RE.findall(h):
                tgt.append(href if href.startswith("http") else f"https://{host}{href}")
                txt.append(text)
                src.append(url)
        part = pd.DataFrame({"target_url": tgt, "txt": txt, "src": src})
        out = (
            part.groupby(["target_url", "txt", "src"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        # Arrow out: keeps the groupby shuffle's schemas metadata-free
        return pa.table(
            {
                "target_url": pa.array(out["target_url"], pa.string()),
                "txt": pa.array(out["txt"], pa.string()),
                "src": pa.array(out["src"], pa.string()),
                "cnt": pa.array(out["cnt"].to_numpy(dtype="int64")),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        texts = sorted(set(g["txt"]))
        return pd.DataFrame(
            {
                "target_url": [g["target_url"].iloc[0]],
                "n_links": [int(g["cnt"].sum())],
                "n_pages": [int(g["src"].nunique())],
                "n_texts": [len(texts)],
                "anchor_texts": ["|".join(texts)],
            }
        )

    return (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url", "html"])
        .map_batches(extract, batch_format="pandas")
        .groupby("target_url")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .astype({"n_links": "int64", "n_pages": "int64", "n_texts": "int64"})
        .sort_values("target_url")
        .reset_index(drop=True)
    )


def host_graph(sf_dir: str) -> pd.DataFrame:
    """(src_host, tgt_host, n_links, n_src_pages) — the page-level anchor
    edges collapsed to the HOST level, the graph web-scale link analysis
    actually runs on (host/domain PageRank, spam-farm detection, mirror
    discovery all operate on this collapse, not the 10^10-node page graph).

    Scale shape: same pruned read + in-batch anchor extraction as
    ``anchor_texts``, but the per-batch combiner groups straight down to
    (src_host, tgt_host, src_page) partial counts, so the single exchange
    is bounded by the HOST graph (quadratic in hosts at worst, tiny vs the
    corpus) plus the distinct linking pages per edge."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        sh, th, src = [], [], []
        for url, html in zip(df["url"], df["html"]):
            h = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else str(html)
            if "<a " not in h:
                continue
            host = url.split("://", 1)[1].split("/", 1)[0]
            for href, _text in ANCHOR_RE.findall(h):
                tgt = href if href.startswith("http") else f"https://{host}{href}"
                sh.append(host)
                th.append(tgt.split("://", 1)[1].split("/", 1)[0])
                src.append(url)
        part = pd.DataFrame({"src_host": sh, "tgt_host": th, "src": src})
        out = (
            part.groupby(["src_host", "tgt_host", "src"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        # Arrow out: keeps the groupby shuffle's schemas metadata-free
        return pa.table(
            {
                "src_host": pa.array(out["src_host"], pa.string()),
                "tgt_host": pa.array(out["tgt_host"], pa.string()),
                "src": pa.array(out["src"], pa.string()),
                "cnt": pa.array(out["cnt"].to_numpy(dtype="int64")),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src_host": [g["src_host"].iloc[0]],
                "tgt_host": [g["tgt_host"].iloc[0]],
                "n_links": [int(g["cnt"].sum())],
                "n_src_pages": [int(g["src"].nunique())],
            }
        )

    return (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url", "html"])
        .map_batches(extract, batch_format="pandas")
        .groupby(["src_host", "tgt_host"])
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .astype({"n_links": "int64", "n_src_pages": "int64"})
        .sort_values(["src_host", "tgt_host"])
        .reset_index(drop=True)
    )


def host_graph_sql(corpus: str) -> str:
    pat = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    return f"""
WITH p AS (
  SELECT url, decode(html) AS h
  FROM read_parquet('{corpus}/pages.parquet')
  WHERE contains(decode(html), '<a ')
), m AS (
  SELECT url,
         split_part(split_part(url, '://', 2), '/', 1) AS src_host,
         unnest(regexp_extract_all(h, '{pat}', 1)) AS href
  FROM p
), r AS (
  SELECT src_host,
         split_part(split_part(
           CASE WHEN href LIKE 'http%' THEN href
                ELSE 'https://' || src_host || href END,
           '://', 2), '/', 1) AS tgt_host,
         url FROM m
)
SELECT src_host, tgt_host,
       COUNT(*)::BIGINT AS n_links,
       COUNT(DISTINCT url)::BIGINT AS n_src_pages
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""


def anchor_texts_sql(corpus: str) -> str:
    pat = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    return f"""
WITH p AS (
  SELECT url, decode(html) AS h
  FROM read_parquet('{corpus}/pages.parquet')
  WHERE contains(decode(html), '<a ')
), m AS (
  SELECT url,
         split_part(split_part(url, '://', 2), '/', 1) AS host,
         regexp_extract_all(h, '{pat}', 1) AS hrefs,
         regexp_extract_all(h, '{pat}', 2) AS txts
  FROM p
), z AS (
  SELECT url, host, unnest(hrefs) AS href, unnest(txts) AS txt FROM m
), r AS (
  SELECT CASE WHEN href LIKE 'http%' THEN href
              ELSE 'https://' || host || href END AS target_url,
         txt, url FROM z
)
SELECT target_url,
       COUNT(*)::BIGINT AS n_links,
       COUNT(DISTINCT url)::BIGINT AS n_pages,
       COUNT(DISTINCT txt)::BIGINT AS n_texts,
       array_to_string(list_sort(list_distinct(list(txt))), '|') AS anchor_texts
FROM r GROUP BY target_url ORDER BY target_url
"""


# --------------------------------------------------------------------------
# Focused (best-first) crawl prioritization ----------------------------------
# The classic anchor-relevance frontier ordering (Cho, Garcia-Molina & Page,
# "Efficient crawling through URL ordering", WWW 1998; Chakrabarti et al.'s
# focused crawler): rather than BFS depth or OPIC cash, score every anchor
# TARGET by how well the text of the links pointing at it matches a topic
# term set, and schedule the frontier best-first. This is the third crawl-
# ordering policy in the repo next to priority/seq (reference semantics) and
# crawl_opic_priorities (importance-driven) — the one a vertical crawl at
# 10^10 URLs uses to spend fetch budget on-topic.
#
# Scale shape: anchor extraction + per-(target) topic scoring is the
# anchor_texts per-batch combiner (counts collapse within the batch before
# the one groupby exchange); the ranked cut is a per-block top-k over the
# aggregated table, so only k rows per block reach the driver — the target
# universe itself is never collected.

FOCUS_TERMS = (
    "prinsengracht",
    "keizersgracht",
    "herengracht",
    "singel",
    "rozengracht",
)
FOCUS_TOPK = 25


def focused_priorities(sf_dir: str) -> pd.DataFrame:
    """Top-``FOCUS_TOPK`` frontier schedule (rank, target_url, score,
    n_links): score = Σ over inbound links of |distinct topic terms among
    the link text's lowercase tokens|; ties broken by target_url."""
    from ray.data.aggregate import Sum

    corpus = materialize_corpus(scale_tag_of(sf_dir))
    terms = set(FOCUS_TERMS)

    def extract(df: pd.DataFrame) -> pa.Table:
        tgt, sc = [], []
        for url, html in zip(df["url"], df["html"]):
            h = (
                html.decode("utf-8", "replace")
                if isinstance(html, (bytes, bytearray))
                else str(html)
            )
            if "<a " not in h:
                continue
            host = url.split("://", 1)[1].split("/", 1)[0]
            for href, text in ANCHOR_RE.findall(h):
                tgt.append(href if href.startswith("http") else f"https://{host}{href}")
                sc.append(len(set(text.lower().split(" ")) & terms))
        part = pd.DataFrame({"target_url": tgt, "score": sc})
        out = part.groupby("target_url", as_index=False).agg(
            score=("score", "sum"), n_links=("score", "size")
        )
        return pa.table(
            {
                "target_url": pa.array(out["target_url"], pa.string()),
                "score": pa.array(out["score"].to_numpy(dtype="int64")),
                "n_links": pa.array(out["n_links"].to_numpy(dtype="int64")),
            }
        )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["score"] > 0]
        return df.sort_values(
            ["score", "target_url"], ascending=[False, True]
        ).head(FOCUS_TOPK)

    cand = (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url", "html"])
        .map_batches(extract, batch_format="pandas")
        .groupby("target_url")
        .aggregate(Sum("score", alias_name="score"), Sum("n_links", alias_name="n_links"))
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
    )
    final = (
        cand.sort_values(["score", "target_url"], ascending=[False, True])
        .head(FOCUS_TOPK)
        .reset_index(drop=True)
    )
    final.insert(0, "rank", np.arange(1, len(final) + 1, dtype=np.int64))
    return final.astype({"score": "int64", "n_links": "int64"})


def focused_priorities_sql(corpus: str) -> str:
    pat = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    terms = ", ".join(f"'{t}'" for t in FOCUS_TERMS)
    return f"""
WITH p AS (
  SELECT url, decode(html) AS h
  FROM read_parquet('{corpus}/pages.parquet')
  WHERE contains(decode(html), '<a ')
), m AS (
  SELECT url,
         split_part(split_part(url, '://', 2), '/', 1) AS host,
         regexp_extract_all(h, '{pat}', 1) AS hrefs,
         regexp_extract_all(h, '{pat}', 2) AS txts
  FROM p
), z AS (
  SELECT host, unnest(hrefs) AS href, unnest(txts) AS txt FROM m
), r AS (
  SELECT CASE WHEN href LIKE 'http%' THEN href
              ELSE 'https://' || host || href END AS target_url,
         len(list_intersect(string_split(lower(txt), ' '),
                            [{terms}])) AS hits
  FROM z
), s AS (
  SELECT target_url, SUM(hits)::BIGINT AS score, COUNT(*)::BIGINT AS n_links
  FROM r GROUP BY target_url
), ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY score DESC, target_url)::BIGINT AS rank,
         target_url, score, n_links
  FROM s WHERE score > 0
)
SELECT rank, target_url, score, n_links
FROM ranked WHERE rank <= {FOCUS_TOPK} ORDER BY rank
"""
