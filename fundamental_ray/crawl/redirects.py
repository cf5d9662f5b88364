"""Redirect-chain resolution over the page table — the frontier's
301-collapse step.

Every production crawler resolves redirect chains before scheduling:
scheme upgrades (http→https), mobile/alias hosts (m.example.com →
example.com) and tracking-parameter strips each cost one 3xx hop, and the
frontier must claim the TERMINAL url, not the alias, or the same page is
fetched once per alias (Scrapy's RedirectMiddleware with
``REDIRECT_MAX_TIMES``; the reference inherits it via default settings —
settings.py has no override, so funda requests follow up to 20 hops).

Synthetic-but-deterministic edge table (a pure string function of each
corpus url ``u``, mirrored exactly by the SQL oracle): with
``t = last-hex-digit(md5(u)) mod 4`` and ``rest = u`` minus its
``https://`` prefix,

  t = 0 → 3-hop chain  a3 → a2 → a1 → u
  t = 1 → 1-hop        a1 → u
  else   no aliases

where ``a1 = https://m.{rest}`` (mobile-host alias), ``a2 = http://m.{rest}``
(scheme downgrade), and ``a3 = a2 + utm_source=news`` (tracking param,
``&``-appended when the url already has a query). Chains are acyclic by
construction and ≤ 3 hops, the production-typical depth (crawlers cap at
~10-20).

Scale shape — **pointer doubling** (the classic log-round shortcut): the
alias-edge table (src, dst, hops) is alias-bounded, not corpus-bounded;
each round every row (u, v, h) looks up v in the SAME table via ONE
key-hash exchange (union + groupby cogroup, the set_ops idiom) and jumps
to (u, w, h+h') when v is itself an alias. Chains of length L resolve in
⌈log₂ L⌉ rounds — 2 here, ≤ 5 for any real ≤ 20-hop cap — each round a
single alias-scale exchange; the corpus' pages/html never participate at
all (the url column is the only thing read). A hop cap (REDIRECT_MAX_HOPS)
bounds the loop exactly like the middleware it models.

Oracle: DuckDB recursive CTE walking the identically-derived edge table —
an independent O(L)-step evaluation of the same fixed point.
"""

from __future__ import annotations

import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

REDIRECT_MAX_HOPS = 16  # Scrapy REDIRECT_MAX_TIMES=20-ish cap → ≤ 4 doubling rounds
_HEX = "0123456789abcdef"


def _edges_of(urls: pd.Series) -> pd.DataFrame:
    """Vectorized alias-edge derivation: (src, dst, hops=1) rows."""
    import hashlib

    u = urls.drop_duplicates()
    tier = u.map(lambda s: int(hashlib.md5(s.encode()).hexdigest()[-1], 16) % 4)
    rest = u.str.slice(8)  # every corpus url is https://
    a1 = "https://m." + rest
    a2 = "http://m." + rest
    sep = rest.str.contains("?", regex=False).map({True: "&", False: "?"})
    a3 = a2 + sep + "utm_source=news"
    full = tier.eq(0)
    one = tier.eq(1)
    src = pd.concat([a3[full], a2[full], a1[full], a1[one]]).to_numpy(dtype=object)
    dst = pd.concat([a2[full], a1[full], u[full], u[one]]).to_numpy(dtype=object)
    return pd.DataFrame(
        {"src": pd.Series(src, dtype="object"),
         "dst": pd.Series(dst, dtype="object"),
         "hops": pd.Series([1] * len(src), dtype="int64")}
    )


def resolve_redirects(sf_dir: str) -> pd.DataFrame:
    """(url, resolved_url, hops) for every alias url — the terminal target
    the frontier should claim, via log-round pointer doubling."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))
    f = (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url"])
        .map_batches(
            lambda df: _edges_of(df["url"]), batch_format="pandas"
        )
    )

    max_rounds = max(1, (REDIRECT_MAX_HOPS - 1).bit_length())  # ⌈log2 cap⌉
    for _ in range(max_rounds):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            # each f row serves as probe (key = its dst, kind 0) AND as a
            # build-side mapping (key = its src, kind 1) of the SAME f —
            # one emit pass, one exchange: f' = f∘f
            import numpy as np

            s = df["src"].to_numpy(dtype=object)
            d = df["dst"].to_numpy(dtype=object)
            h = df["hops"].to_numpy(dtype="int64")
            return pd.DataFrame(
                {
                    "key": pd.Series(np.concatenate([d, s]), dtype="object"),
                    "kind": pd.Series(
                        [0] * len(df) + [1] * len(df), dtype="int64"
                    ),
                    "src": pd.Series(np.concatenate([s, s]), dtype="object"),
                    "dst": pd.Series(np.concatenate([d, d]), dtype="object"),
                    "hops": pd.Series(np.concatenate([h, h]), dtype="int64"),
                }
            )

        def jump(g: pd.DataFrame):
            # per key: ≤1 build row (each alias has one outgoing edge);
            # probe rows whose dst is itself an alias jump over it.
            # Arrow output with an explicit schema so 0-row groups don't
            # become null-typed blocks (which break the next sort).
            import pyarrow as pa

            build = g[g["kind"] == 1]
            probe = g[g["kind"] == 0]
            if len(build) == 0 or len(probe) == 0:
                out, jumped = probe, 0
            else:
                b = build.iloc[0]
                out = probe.assign(dst=b["dst"], hops=probe["hops"] + b["hops"])
                jumped = 1
            return pa.table(
                {
                    "src": pa.array(out["src"], type=pa.string()),
                    "dst": pa.array(out["dst"], type=pa.string()),
                    "hops": pa.array(
                        out["hops"].astype("int64"), type=pa.int64()
                    ),
                    "jumped": pa.array([jumped] * len(out), type=pa.int64()),
                }
            )

        nxt = (
            f.map_batches(tag, batch_format="pandas")
            .groupby("key")
            .map_groups(jump, batch_format="pandas")
            .materialize()
        )
        jumped = nxt.sum("jumped")
        f = nxt  # 'jumped' rides along; tag() rebuilds columns explicitly
        if not jumped:
            break

    out = (
        f.to_pandas()[["src", "dst", "hops"]]
        .rename(columns={"src": "url", "dst": "resolved_url"})
        .astype({"hops": "int64"})
        .sort_values("url")
        .reset_index(drop=True)
    )
    return out[["url", "resolved_url", "hops"]]


def _edges_sql(corpus: str) -> str:
    return f"""
  base AS (
    SELECT DISTINCT url,
           strpos('{_HEX}', substr(md5(url), 32, 1)) - 1 AS hx,
           substr(url, 9) AS rest
    FROM read_parquet('{corpus}/pages.parquet')
  ), al AS (
    SELECT url, hx % 4 AS tier,
           'https://m.' || rest AS a1,
           'http://m.' || rest AS a2,
           'http://m.' || rest ||
             (CASE WHEN strpos(rest, '?') > 0 THEN '&' ELSE '?' END) ||
             'utm_source=news' AS a3
    FROM base
  ), e AS (
    SELECT a3 AS src, a2 AS dst FROM al WHERE tier = 0
    UNION ALL SELECT a2, a1 FROM al WHERE tier = 0
    UNION ALL SELECT a1, url FROM al WHERE tier = 0
    UNION ALL SELECT a1, url FROM al WHERE tier = 1
  )"""


def resolve_redirects_sql(corpus: str) -> str:
    return f"""
WITH RECURSIVE {_edges_sql(corpus)},
walk(url, cur, hops) AS (
  SELECT src, dst, 1 FROM e
  UNION ALL
  SELECT w.url, e.dst, w.hops + 1
  FROM walk w JOIN e ON w.cur = e.src
)
SELECT url, cur AS resolved_url, hops::BIGINT AS hops
FROM walk
WHERE cur NOT IN (SELECT src FROM e)
ORDER BY url
"""
