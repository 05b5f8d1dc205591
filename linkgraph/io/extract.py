"""HTML text/href extraction — the pure kernel shared by the single-node
reference path and the vectorized Arrow UDF path.

The north rule's per-row invariant (BASELINE.json:15) is that the text
extracted distributively is **byte-identical per url** to the single-node
reference extraction. We guarantee it by construction: one pure function
(:func:`extract_text`) defines the semantics; the vectorized twin
(:func:`extract_text_series`) is the same regexes applied through pandas'
Arrow-batched string kernels; a property test asserts equality row by row.

The extraction itself is deliberately simple and total (never raises on
malformed bytes): decode UTF-8 with replacement, take ``<a href="...">``
values, strip tags, collapse whitespace.
"""

from __future__ import annotations

import re

import pandas as pd

HREF_RE = re.compile(r'<a\s[^>]*href="([^"]*)"', re.IGNORECASE)
SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
TAG_RE = re.compile(r"<[^>]*>")
WS_RE = re.compile(r"\s+")


def _decode(html: bytes | str | None) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="replace")
    return html


def extract_text(html: bytes | str) -> str:
    """Single-node reference extraction: drop script/style blocks, strip
    tags, collapse whitespace, trim."""
    s = _decode(html)
    s = SCRIPT_STYLE_RE.sub(" ", s)
    s = TAG_RE.sub(" ", s)
    return WS_RE.sub(" ", s).strip()


def extract_hrefs(html: bytes | str) -> list[str]:
    """Single-node reference extraction of ``<a href>`` targets, in document
    order, duplicates preserved (multigraph edges coalesce later)."""
    return HREF_RE.findall(_decode(html))


def _decode_series(s: pd.Series) -> pd.Series:
    """NULL html decodes to "" (extraction is total, like the scalar twin)."""
    return s.map(_decode)


def extract_text_series(s: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`extract_text` (same regexes, pandas string
    kernels over Arrow batches)."""
    t = _decode_series(s)
    t = t.str.replace(SCRIPT_STYLE_RE, " ", regex=True)
    t = t.str.replace(TAG_RE, " ", regex=True)
    return t.str.replace(WS_RE, " ", regex=True).str.strip()


def extract_hrefs_series(s: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`extract_hrefs`; each element a list[str]."""
    return _decode_series(s).str.findall(HREF_RE)
