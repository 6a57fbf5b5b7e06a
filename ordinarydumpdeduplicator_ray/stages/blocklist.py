"""Domain-blocklist URL filtering (UT1-style curation gate).

Production webtext pipelines drop documents whose url host matches a
blocklist of registered domains (adult/spam/malware lists run to ~4M
entries): a host is blocked when it EQUALS a listed domain or is a
SUBDOMAIN of one (``ads.tracker.example`` matches listed
``tracker.example``). The reference's analogue is its path-prefix
ancestry predicate (``Common/FsEntity.cs:38-51`` — "is this entity
under that directory"), re-expressed for url label hierarchies.

Scale shape: the blocklist groups by label depth and broadcasts once
(``ray.put``); each batch then runs ONE vectorized regex suffix-extract
plus ONE ``pc.index_in`` hash lookup PER DISTINCT DEPTH (real lists
hold 2-4 depths), so the per-batch cost is O(rows x depths) with no
Python loop and no shuffle — a 4M-domain list is ~100 MB in plasma,
read zero-copy by every task. Matches resolve most-specific-first
(longest listed suffix wins), which equals depth-descending coalesce
because two matches for one host at different depths are nested
suffixes of each other.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/:?#]+)"


def _suffix_pattern(depth: int) -> str:
    """Regex capturing the last ``depth`` dot-separated labels."""
    if depth == 1:
        return r"(?P<suf>[^.]+)$"
    return r"(?P<suf>(?:[^.]+\.){%d}[^.]+)$" % (depth - 1)


def block_verdicts(
    ds: ray.data.Dataset,
    domains: list[str],
    url_col: str = "url",
) -> ray.data.Dataset:
    """Append ``host``, ``blocked`` and ``matched_domain`` to every row.

    ``matched_domain`` is the most specific (deepest) listed domain the
    host equals or is a subdomain of; null (and ``blocked`` false) when
    nothing matches. Unparseable urls are never blocked.
    """
    by_depth: dict[int, list[str]] = {}
    for d in domains:
        d = d.strip().lower().strip(".")
        if d:
            by_depth.setdefault(d.count(".") + 1, []).append(d)
    # depth-descending: deepest (most specific) match wins the coalesce
    depth_sets = [
        (depth, pa.array(sorted(set(ds_)), type=pa.string()))
        for depth, ds_ in sorted(by_depth.items(), reverse=True)
    ]
    sets_ref = ray.put(depth_sets)

    def verdict(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        sets = _get_broadcast(sets_ref)
        host = pc.struct_field(
            pc.extract_regex(pc.utf8_lower(t[url_col]), _HOST_RE), "host"
        )
        matched = pa.nulls(len(t), type=pa.string())
        for depth, dom_arr in sets:
            suf = pc.struct_field(
                pc.extract_regex(host, _suffix_pattern(depth)), "suf"
            )
            hit = pc.take(dom_arr, pc.index_in(suf, dom_arr))
            matched = pc.coalesce(matched, hit)
        return t.append_column("host", host).append_column(
            "blocked", pc.is_valid(matched)
        ).append_column("matched_domain", matched)

    return ds.map_batches(verdict, batch_format="pyarrow")
