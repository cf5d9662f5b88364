"""WET extraction: page html → visible text — the corpus-production step
between the crawl store and every text op.

Common Crawl ships three artifacts per capture: WARC (raw bytes), WAT
(metadata), WET (extracted plain text); the WET conversion — strip
script/style subtrees, drop tags, collapse whitespace — is the single
stage that turns a crawl into a TEXT corpus, and everything in ops/text.py
/ corpus_stats.py consumes its output shape. The reference extracts typed
FIELDS from known layouts (extraction/fields.py parity family); this op is
the generic fallback a web-scale pipeline runs on every OTHER page. The
synthetic corpus's own ``visible_text`` (synth/corpus.py:146) defines the
exact semantics, so extraction here is oracle-checkable end to end.

Deterministic definition (mirrored exactly by the SQL oracle):
  * drop ``<script …>…</script>`` and ``<style …>…</style>`` subtrees
    (dotall — scripts span lines), then every remaining tag, each
    replaced by one space;
  * collapse runs of whitespace to single spaces and trim;
  * html_bytes = raw page bytes, text_bytes = UTF-8 bytes of the text,
    text_ratio = text_bytes / html_bytes — UNROUNDED: the same int64
    division is IEEE-identical in both engines, where a rounded value
    could straddle a half-ulp boundary differently.

Scale shape: ONE pruned read (url + html), a per-batch compiled-regex
transform, zero exchanges — embarrassingly parallel, the ideal Ray Data
stage. At 100 TB this is the stage worth the most cores; everything
downstream reads its (much smaller) text output.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

_TAG_RE = re.compile(
    r"<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>", re.S
)
_WS_RE = re.compile(r"\s+")


def wet_extract(sf_dir: str) -> pd.DataFrame:
    """(url, text, html_bytes, text_bytes, text_ratio) per page."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def extract(df: pd.DataFrame) -> pa.Table:
        urls, texts, hb, tb = [], [], [], []
        for url, html in zip(df["url"], df["html"]):
            raw = html if isinstance(html, (bytes, bytearray)) else str(html).encode()
            text = _WS_RE.sub(" ", _TAG_RE.sub(" ", raw.decode("utf-8", "replace"))).strip()
            urls.append(url)
            texts.append(text)
            hb.append(len(raw))
            tb.append(len(text.encode("utf-8")))
        ratio = [t / h for t, h in zip(tb, hb)]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.string()),
                "html_bytes": pa.array(hb, pa.int64()),
                "text_bytes": pa.array(tb, pa.int64()),
                "text_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url", "html"])
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def web_corpus(sf_dir: str) -> pd.DataFrame:
    """The Common-Crawl corpus-PRODUCTION composite: pages → WET text →
    language/length gate → exact text dedup (earliest capture wins) —
    i.e. raw crawl in, training-ready document table out, the end-to-end
    path C4/CCNet run before any quality model sees a byte.

    Deterministic definition (mirrored exactly by the SQL oracle):
      * WET conversion as in :func:`wet_extract`;
      * keep pages with ``lang = 'nl'`` (the reference crawls one market,
        funda_spider.py — the CCNet per-language split reduced to its
        binary form) and ``n_words >= 15`` (C4's min-length gate; WET
        text is single-space-collapsed so words = spaces + 1);
      * exact dedup on md5(text): the earliest capture by
        ``(warc_ts, url)`` is the keeper (same canonical-capture rule as
        crawl/revisit.py — text-level here, byte-level there).

    Scale shape: WET + gates are per-batch over a pruned read (html never
    leaves the read stage); the survivor rows pay exactly ONE exchange —
    the digest-keyed dedup — carrying the (much smaller) extracted text.
    No driver dict, no second pass over the corpus: the keep-first fold
    happens where the digest group lands. Per-group cost is O(captures
    of that text); the hot-digest caveat and its combiner+join-back
    escape hatch are the same as revisit.py's.
    """
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def wet_gate(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        texts = [
            _WS_RE.sub(
                " ",
                _TAG_RE.sub(
                    " ",
                    (h if isinstance(h, (bytes, bytearray)) else str(h).encode()).decode(
                        "utf-8", "replace"
                    ),
                ),
            ).strip()
            for h in df["html"]
        ]
        out = pd.DataFrame(
            {
                "url": df["url"],
                "warc_ts": df["warc_ts"],
                "lang": df["lang"],
                "text": texts,
            }
        )
        out["n_words"] = out["text"].str.count(" ") + 1
        out = out[(out["lang"] == "nl") & (out["n_words"] >= 15)]
        out["digest"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in out["text"]
        ]
        return out

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["warc_ts", "url"], kind="mergesort")
        return g.head(1)

    return (
        read_parquet_clean(
            f"{corpus}/pages.parquet", columns=["url", "warc_ts", "lang", "html"]
        )
        .map_batches(wet_gate, batch_format="pandas")
        .groupby("digest")
        .map_groups(keep_first, batch_format="pandas")
        .to_pandas()[["url", "warc_ts", "lang", "n_words", "text"]]
        .astype({"n_words": "int64"})
        .sort_values("url")
        .reset_index(drop=True)
    )


def web_corpus_sql(corpus: str) -> str:
    pat = r"(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>"
    return f"""
WITH w AS (
  SELECT url, warc_ts, lang,
         trim(regexp_replace(regexp_replace(decode(html), '{pat}', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS text
  FROM read_parquet('{corpus}/pages.parquet')
  WHERE lang = 'nl'
), f AS (
  SELECT url, warc_ts, lang, text,
         array_length(string_split(text, ' '))::BIGINT AS n_words
  FROM w
), g AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text)
                               ORDER BY warc_ts, url) AS rn
  FROM f WHERE n_words >= 15
)
SELECT url, warc_ts, lang, n_words, text FROM g WHERE rn = 1 ORDER BY url
"""


def wet_extract_sql(corpus: str) -> str:
    pat = r"(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>"
    return f"""
WITH p AS (
  SELECT url, html, decode(html) AS h
  FROM read_parquet('{corpus}/pages.parquet')
), t AS (
  SELECT url,
         trim(regexp_replace(regexp_replace(h, '{pat}', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS text,
         octet_length(html)::BIGINT AS html_bytes
  FROM p
)
SELECT url, text, html_bytes,
       octet_length(encode(text))::BIGINT AS text_bytes,
       octet_length(encode(text))::DOUBLE / html_bytes AS text_ratio
FROM t ORDER BY url
"""


# --------------------------------------------------------------------------
# WAT metadata records --------------------------------------------------------
# The third Common-Crawl artifact (WARC raw ✓ revisit.py, WET text ✓ above,
# WAT metadata — this op): per-capture structural metadata without the
# payload — title, link counts split internal/external, byte size. Link
# analysis, seed discovery and crawl QA run on WAT files precisely so they
# never have to re-scan the WARC bytes; at 100 TB the WAT table is the
# cheap index into the expensive corpus.
#
# Scale shape: one pruned (url, warc_ts, html) read, per-batch compiled
# regexes, zero exchange. Internal/external mirrors the anchor resolver:
# absolute hrefs compare hosts, relative hrefs are internal by definition.

_TITLE_RE = re.compile(r"<title>([^<]*)</title>")
_HREF_RE = re.compile(r'<a [^>]*href="([^"]*)"')


def wat_records(sf_dir: str) -> pd.DataFrame:
    """(url, warc_ts, title, n_links, n_internal, n_external, html_bytes)."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def extract(df: pd.DataFrame) -> pa.Table:
        out = {"url": [], "warc_ts": [], "title": [], "n_links": [],
               "n_internal": [], "n_external": [], "html_bytes": []}
        for url, ts, html in zip(df["url"], df["warc_ts"], df["html"]):
            raw = html if isinstance(html, (bytes, bytearray)) else str(html).encode()
            h = raw.decode("utf-8", "replace")
            host = url.split("://", 1)[1].split("/", 1)[0]
            m = _TITLE_RE.search(h)
            hrefs = _HREF_RE.findall(h)
            # Guard on '://' (not startswith('http')): a scheme-less href like
            # "httpdocs/x" counts as internal on both sides, matching the SQL
            # oracle's split_part (which returns '' for no-delimiter input).
            internal = sum(
                (href.split("://", 1)[1].split("/", 1)[0] == host)
                if "://" in href
                else True
                for href in hrefs
            )
            out["url"].append(url)
            out["warc_ts"].append(ts)
            out["title"].append(m.group(1) if m else "")
            out["n_links"].append(len(hrefs))
            out["n_internal"].append(int(internal))
            out["n_external"].append(len(hrefs) - int(internal))
            out["html_bytes"].append(len(raw))
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.array(out["warc_ts"]),
                "title": pa.array(out["title"], pa.string()),
                "n_links": pa.array(out["n_links"], pa.int64()),
                "n_internal": pa.array(out["n_internal"], pa.int64()),
                "n_external": pa.array(out["n_external"], pa.int64()),
                "html_bytes": pa.array(out["html_bytes"], pa.int64()),
            }
        )

    return (
        read_parquet_clean(
            f"{corpus}/pages.parquet", columns=["url", "warc_ts", "html"]
        )
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def wat_records_sql(corpus: str) -> str:
    href = r'<a [^>]*href="([^"]*)"'
    return f"""
WITH p AS (
  SELECT url, warc_ts, html, decode(html) AS h,
         split_part(split_part(url, '://', 2), '/', 1) AS host
  FROM read_parquet('{corpus}/pages.parquet')
), links AS (
  SELECT url,
         unnest(regexp_extract_all(h, '{href}', 1)) AS href
  FROM p
), cls AS (
  SELECT url,
         CASE WHEN href LIKE '%://%'
              THEN split_part(split_part(href, '://', 2), '/', 1)
                   = (SELECT host FROM p p2 WHERE p2.url = cls0.url)
              ELSE TRUE END AS internal
  FROM links cls0
), agg AS (
  SELECT url, COUNT(*)::BIGINT AS n_links,
         COUNT(*) FILTER (internal)::BIGINT AS n_internal
  FROM cls GROUP BY url
)
SELECT p.url, p.warc_ts,
       regexp_extract(p.h, '<title>([^<]*)</title>', 1) AS title,
       COALESCE(a.n_links, 0)::BIGINT AS n_links,
       COALESCE(a.n_internal, 0)::BIGINT AS n_internal,
       COALESCE(a.n_links - a.n_internal, 0)::BIGINT AS n_external,
       octet_length(p.html)::BIGINT AS html_bytes
FROM p LEFT JOIN agg a ON a.url = p.url
ORDER BY p.url
"""
