"""Deterministic text extraction + tokenization.

The north rule requires the extracted ``text`` to be **byte-identical per
url** across runs, partitionings and parallelism levels. The reference has
no HTML handling (it hashes raw file bytes,
``Common/FsUtils.cs:39-54``); the extraction rule below is therefore
*defined here once* and frozen — every stage and every oracle uses this
exact function. It is pure (regex only, no library variance).

Extraction rule (fixed, v1):
1. decode bytes as UTF-8 with ``errors="replace"`` (deterministic);
2. drop ``<script>``/``<style>``/``<!-- -->`` blocks;
3. replace every remaining tag with a single space;
4. unescape the five XML entities (&amp; &lt; &gt; &quot; &#39;) and
   ``&nbsp;``;
5. collapse all whitespace runs to one space and strip the ends.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; -> &lt; (literal), not <
]

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def extract_text(html: bytes | None) -> str | None:
    """html bytes -> extracted text. ``None``/undecodable-as-bytes -> None.

    Deterministic: same bytes always produce the same string.
    """
    if html is None:
        return None
    raw = _SCRIPT_RE.sub(b" ", html)
    raw = _COMMENT_RE.sub(b" ", raw)
    raw = _TAG_RE.sub(b" ", raw)
    s = raw.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def tokenize(text: str, lowercase: bool = True) -> list[str]:
    """Word tokens: maximal ``\\w+`` runs, optionally case-folded.

    This is the single tokenizer used by shingling, MinHash, SimHash,
    suffix-array spans, token counting and the brute-force oracle.
    """
    if lowercase:
        text = text.lower()
    return _TOKEN_RE.findall(text)
