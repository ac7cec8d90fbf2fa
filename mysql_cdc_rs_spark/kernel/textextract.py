"""Deterministic text extraction from (decoded) HTML.

This is the byte-identical hot-path transform: decoded events must yield the
same text string whether computed by the pandas UDF on an executor or by the
pytest oracle on the driver.  Only stdlib ``re`` + explicit entity table —
no html.parser, no bs4, nothing whose behavior could drift between versions.
"""

from __future__ import annotations

import re

# Drop script/style/noscript wholesale (content is not page text).
_DROP_BLOCK_RE = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Fixed entity table — deliberately small and explicit so the mapping is
# stable forever (html.unescape's table grows across Python versions).
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def extract_text(html: str) -> str:
    """HTML string -> canonical whitespace-collapsed page text."""
    s = _DROP_BLOCK_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    return _WS_RE.sub(" ", s).strip()


def extract_plain(text: str) -> str:
    """text/plain bodies: whitespace canonicalization only."""
    return _WS_RE.sub(" ", text).strip()
