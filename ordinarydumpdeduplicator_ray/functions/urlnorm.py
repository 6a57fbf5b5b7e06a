"""URL canonicalization for crawl dedup.

The webtext analog of the reference's path algebra
(``Common/FsEntity.cs:38-51`` derives identity from normalized paths):
two crawl records of the same resource differ by host case, trailing
slash, fragment, tracking parameters and query-parameter order. The
normal form here matches the DuckDB oracle expression token for token:

- scheme and host lowercased
- path with trailing slashes stripped ('' and '/' both normalize to '')
- fragment dropped
- query parameters split on '&', empties and ``utm_*`` dropped,
  remainder sorted and rejoined (omitted entirely when none survive)
"""

from __future__ import annotations

import re

_HOST_RE = re.compile(r"^[a-zA-Z]+://[^/?#]+")


def normalize_url(url: str) -> str:
    m = _HOST_RE.match(url)
    if not m:
        return url
    base = url[: m.end()].lower()
    rest = url[m.end():]
    # split off fragment, then query
    rest = rest.split("#", 1)[0]
    if "?" in rest:
        path, query = rest.split("?", 1)
    else:
        path, query = rest, ""
    path = path or "/"
    path = re.sub(r"/+$", "", path)
    params = sorted(
        p for p in query.split("&") if p and not p.startswith("utm_")
    )
    return base + path + ("?" + "&".join(params) if params else "")
