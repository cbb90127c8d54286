"""Byte-stable HTML -> text extraction (the per-row invariant,
BASELINE.json:16).

A pure function of the html bytes, built only from Spark string builtins
(decode / regexp_replace / trim), so the same bytes give the same text on
every executor, every run, every cluster size -- no environment-dependent
parser. The pipeline-level contract `extract_text(html) == text` is pinned
byte-for-byte in tests/test_pages_pipeline.py.

Rules (deliberately simple and versioned):
1. decode UTF-8;
2. drop <script>/<style> elements entirely;
3. replace every remaining tag with a single space;
4. collapse whitespace runs to one space; strip ends.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["extract_text_col", "extract_text_py", "EXTRACTOR_VERSION"]

EXTRACTOR_VERSION = 1

_SCRIPT_RE = r"(?s)<(script|style)[^>]*>.*?</\1>"
_TAG_RE = r"<[^>]*>"
_WS_RE = r"\s+"


def extract_text_col(html_col):
    """Column-level extraction (JVM regex, codegen-friendly)."""
    s = F.decode(html_col, "UTF-8")
    s = F.regexp_replace(s, _SCRIPT_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    s = F.regexp_replace(s, _WS_RE, " ")
    return F.trim(s)


def extract_text_py(html: bytes) -> str:
    """Python twin of :func:`extract_text_col` for oracle checks; must stay
    byte-identical (same regex semantics for these patterns)."""
    import re

    s = html.decode("utf-8")
    s = re.sub(r"<(script|style)[^>]*>.*?</\1>", " ", s, flags=re.S)
    s = re.sub(r"<[^>]*>", " ", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()
