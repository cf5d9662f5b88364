"""SURT (Sort-friendly URI Reordering Transform) keys over the page table.

The Common-Crawl / Heritrix index keys every capture by its SURT form —
host labels reversed and comma-joined (so one registrable domain is one
contiguous key range), ``www.`` dropped, query parameters sorted — which
turns per-domain scans, prefix dedup and politeness grouping into RANGE
operations on a sorted key instead of a hash of the raw URL. The reference
dedupes on raw listing URLs scoped to one site (funda_spider.py:118-120);
at the 10^10-URL frontier of BASELINE.json the SURT key is what makes
"all URLs of this host/domain" a contiguous Parquet row-group range
rather than a full scan.

Deterministic definition (mirrored exactly by the SQL oracles):
  * scheme is dropped; the part before the first ``/`` is host[:port];
  * the port is dropped, the host lowercased, a single leading ``www.``
    stripped, labels reversed and joined with ``,``;
  * the path follows after ``)``; query parameters (full ``k=v`` strings)
    are sorted lexicographically and re-joined with ``&``.

``surt_keys`` is a pure vectorized per-row transform (one pruned read of
the ``url`` column, no exchange). ``surt_domain_counts`` groups by the
2-label registrable-domain prefix — in-batch combiners then ONE
host-bounded exchange, the standard pre-aggregation shape.
"""

from __future__ import annotations

import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of


def _surt_parts(urls: pd.Series) -> pd.DataFrame:
    """Vectorized decomposition: (surt_host, path, sorted_query)."""
    full = urls.str.split("://", n=1).str[1]
    slash = full.str.find("/")
    hostport = full.where(slash < 0, full.str.split("/", n=1).str[0])
    host = hostport.str.split(":", n=1).str[0].str.lower()
    host = host.str.replace(r"^www\.", "", regex=True, n=1)
    surt_host = host.str.split(".").map(lambda ls: ",".join(reversed(ls)))
    rest = ("/" + full.str.split("/", n=1).str[1].fillna("")).where(slash >= 0, "/")
    path = rest.str.split("?", n=1).str[0]
    qs = rest.str.split("?", n=1).str[1]  # NaN when no query
    sorted_qs = qs.map(
        lambda q: ""
        if not isinstance(q, str) or q == ""
        else "?" + "&".join(sorted(q.split("&")))
    )
    return pd.DataFrame({"surt_host": surt_host, "path": path, "sq": sorted_qs})


def surt_keys(sf_dir: str) -> pd.DataFrame:
    """(url, surt) for every page — the CDX-style index key column."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        p = _surt_parts(df["url"])
        return pd.DataFrame(
            {"url": df["url"], "surt": p["surt_host"] + ")" + p["path"] + p["sq"]}
        )

    return (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url"])
        .map_batches(shape, batch_format="pandas")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def surt_domain_counts(sf_dir: str) -> pd.DataFrame:
    """Pages and distinct paths (query stripped) per registrable domain —
    the first two reversed labels of the SURT key, i.e. the contiguous
    scan unit of a CDX index."""
    from ray.data.aggregate import Count, Sum

    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def dom_path(df: pd.DataFrame) -> pd.DataFrame:
        p = _surt_parts(df["url"])
        dom = p["surt_host"].str.split(",").str[:2].str.join(",")
        return pd.DataFrame({"domain": dom, "path": p["path"]})

    # pages: in-batch combiner then one domain-bounded exchange
    pages = (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url"])
        .map_batches(
            lambda df: dom_path(df)
            .groupby("domain", as_index=False)
            .size()
            .rename(columns={"size": "pages_part"}),
            batch_format="pandas",
        )
        .groupby("domain")
        .aggregate(Sum("pages_part", alias_name="pages"))
        .to_pandas()
    )
    # distinct paths: per-batch distinct (combiner), global distinct via
    # the (domain, path) exchange, then a count per domain
    paths = (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url"])
        .map_batches(
            lambda df: dom_path(df).drop_duplicates(), batch_format="pandas"
        )
        .groupby(["domain", "path"])
        .aggregate(Count(alias_name="_n"))
        .groupby("domain")
        .aggregate(Count(alias_name="distinct_paths"))
        .to_pandas()
    )
    return (
        pages.merge(paths, on="domain")
        .astype({"pages": "int64", "distinct_paths": "int64"})
        .sort_values("domain")
        .reset_index(drop=True)
    )


def _surt_sql_exprs() -> tuple[str, str]:
    """(host_labels_expr, rest_expr) shared by both oracles."""
    return (
        """list_reverse(
       CASE WHEN string_split(h, '.')[1] = 'www'
            THEN string_split(h, '.')[2:]
            ELSE string_split(h, '.') END)""",
        """CASE WHEN strpos(fu, '/') = 0 THEN '/'
            ELSE substr(fu, strpos(fu, '/')) END""",
    )


def surt_keys_sql(corpus: str) -> str:
    labels, rest = _surt_sql_exprs()
    return f"""
WITH u AS (
  SELECT url, split_part(url, '://', 2) AS fu FROM read_parquet('{corpus}/pages.parquet')
), p AS (
  SELECT url,
         lower(split_part(split_part(fu, '/', 1), ':', 1)) AS h,
         {rest} AS rest
  FROM u
), q AS (
  SELECT url, h,
         split_part(rest, '?', 1) AS path,
         CASE WHEN strpos(rest, '?') = 0 THEN ''
              ELSE '?' || array_to_string(
                     list_sort(string_split(substr(rest, strpos(rest, '?') + 1), '&')),
                     '&') END AS sq
  FROM p
)
SELECT url,
       array_to_string({labels}, ',') || ')' || path || sq AS surt
FROM q ORDER BY url
"""


def surt_domain_counts_sql(corpus: str) -> str:
    labels, rest = _surt_sql_exprs()
    return f"""
WITH u AS (
  SELECT url, split_part(url, '://', 2) AS fu FROM read_parquet('{corpus}/pages.parquet')
), p AS (
  SELECT lower(split_part(split_part(fu, '/', 1), ':', 1)) AS h,
         {rest} AS rest
  FROM u
), s AS (
  SELECT array_to_string(({labels})[1:2], ',') AS domain,
         split_part(rest, '?', 1) AS path
  FROM p
)
SELECT domain, COUNT(*)::BIGINT AS pages,
       COUNT(DISTINCT path)::BIGINT AS distinct_paths
FROM s GROUP BY domain ORDER BY domain
"""
