"""URL canonicalization — the first stage of every web-corpus dedup.

Common-Crawl-style corpora carry the same logical page under many
spellings: scheme/host case, default ports, ``www.`` prefixes, trailing
slashes, fragments, tracking parameters, and query-parameter order.
``canonicalize_url`` collapses those to one canonical string so exact
dedup (dedup.py:28) and the recrawl change series (recrawl.py) key on
the logical page, not the spelling.

Rules (the usual crawler set — RFC 3986 normalization plus the
pragmatic extras):
  * scheme and host lowercased; ``www.`` prefix dropped
  * default ports stripped (http:80, https:443); other ports kept
  * fragment dropped
  * empty path -> ``/``; trailing slashes trimmed off non-root paths
    (path CASE is preserved — only the authority is case-insensitive)
  * query: tracking params (utm_*, gclid, fbclid by default) and empty
    pairs dropped, the rest sorted bytewise; empty query dropped

Everything is a single Catalyst expression tree (regexp_extract +
higher-order array functions) — whole-stage-codegen'd, zero Python, so
at 100 TB it rides the scan with no extra stage, and the canonical
column is a stable partitioning/bucketing key for the downstream
groupBy.  The same logic is expressible verbatim in DuckDB (the driver
oracle), which pins the semantics engine-independently.

No reference analog (AcousticFeatures.jl has no string surface).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_TRACKING_PREFIXES = ("utm_", "gclid", "fbclid")


def _any_of(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def canonicalize_url(
    url: Column,
    tracking_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).

    Pure-expression: safe to use inside filters/joins; Catalyst will
    collapse the shared regexp subtrees via common-subexpression reuse.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([^:/?#]+)://", 1))
    hostport = F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1)
    host = F.lower(F.get(F.split(hostport, ":"), 0))
    host = F.regexp_replace(host, r"^www\.", "")
    # F.get (not getItem): ANSI mode throws on missing index, get -> NULL
    port = F.get(F.split(hostport, ":"), 1)
    default_port = (
        port.isNull()
        | (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))

    raw_path = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)

    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    keep = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "")
        & ~_any_of([p.startswith(pre) for pre in tracking_prefixes]),
    )
    qsorted = F.array_join(F.array_sort(keep), "&")
    q_part = F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted))

    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
