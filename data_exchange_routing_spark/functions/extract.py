"""Deterministic vectorized text extraction (SURVEY.md §2.3 P9 slot).

The reference's only nontrivial scalar transform is HTML-encoding report
fields (FnStoreReportingEvent.kt:68-70); our payload-facing analog is
html(binary) -> text(string) extraction, required byte-identical per url by
BASELINE.json. The algorithm is therefore pinned, pure-Python, stdlib-only
(no environment-dependent parser libs), and exposed both as an Arrow pandas
UDF (engine path) and as a plain function (oracle path) — the tests compare
the two byte-for-byte.

Decode policy (pinned): UTF-8 with errors='replace' — invalid byte sequences
become U+FFFD deterministically; a fraction of the synthetic corpus carries
non-UTF8 bytes to keep this honest (FIXTURES.md §1).
"""

from __future__ import annotations

import html as _html
import unicodedata
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Pure deterministic html->text. Single source of truth for the byte-
    identity contract; the pandas oracle imports THIS function."""
    if html_bytes is None:
        return None
    s = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    # byte-identical to `_WS_RE.sub(" ", s).strip()` — regex \s and str
    # whitespace are the same character set on this interpreter (asserted at
    # import and property-tested) — but C-speed: the regex sub walks every
    # inter-word gap through a Python-level match loop (~380 us/12 KB doc,
    # >half the whole extraction); split/join collapses runs natively (~9x).
    return " ".join(s.split())


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-batched vectorized wrapper (no per-row Python at the Spark row
    level: one Python invocation per Arrow batch)."""
    return html.map(extract_text_py)


def detect_lang_py(text: str | None) -> str | None:
    """Deterministic n-gram/stopword language heuristic over a small fixed set.

    Public-knowledge approach (stopword hit counting); intentionally simple —
    the contract is determinism, not linguistic accuracy.
    """
    if text is None:
        return None
    words = set(text.lower().split())
    scores = {
        "en": len(words & {"the", "and", "of", "to", "in", "is", "it", "that"}),
        "es": len(words & {"el", "la", "de", "que", "y", "en", "los", "se"}),
        "fr": len(words & {"le", "la", "de", "et", "les", "des", "un", "une"}),
        "de": len(words & {"der", "die", "und", "das", "ist", "von", "den", "ein"}),
    }
    best = max(scores, key=lambda k: (scores[k], -ord(k[0])))
    return best if scores[best] > 0 else "zz"


@F.pandas_udf(T.StringType())
def detect_lang(text: pd.Series) -> pd.Series:
    return text.map(detect_lang_py)


@F.pandas_udf(T.StringType())
def html_escape(text: pd.Series) -> pd.Series:
    """P9: HTML-encode scalar (reference Encode.forHtml on report fields,
    FnStoreReportingEvent.kt:68-70) — vectorized stdlib html.escape."""
    return text.map(lambda s: _html.escape(s, quote=True) if s is not None else None)


# ------------------------------------------------------ rolling fingerprints
# Winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — public algorithm):
# polynomial rolling hash over every k-gram of the normalized text, then keep
# the minimum hash in each window of w consecutive k-grams. Near-identical
# documents share most selected fingerprints, and local edits perturb only
# the windows they touch — the document-fingerprinting contract md5 of the
# whole text cannot give.

_FP_BASE = 257
_FP_MOD = (1 << 61) - 1  # Mersenne prime: cheap mod, no collisions in practice
_FP_NORM_RE = re.compile(r"[^a-z0-9]+")


def rolling_fingerprints_py(text: str | None, k: int = 8, window: int = 4) -> list[int] | None:
    """Sorted distinct winnowed fingerprints of ``text`` (None -> None)."""
    if text is None:
        return None
    s = _FP_NORM_RE.sub(" ", text.lower()).strip()
    if len(s) < k:
        return []
    # rolling hash of every k-gram
    pow_k = pow(_FP_BASE, k - 1, _FP_MOD)
    h = 0
    hashes = []
    for i, ch in enumerate(s):
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        if i >= k - 1:
            hashes.append(h)
            h = (h - ord(s[i - k + 1]) * pow_k) % _FP_MOD
    # winnow: min per window, right-most wins ties (standard rule)
    selected = set()
    for start in range(0, max(1, len(hashes) - window + 1)):
        win = hashes[start : start + window]
        m = min(win)
        selected.add(m)
    return sorted(selected)


@F.pandas_udf(T.ArrayType(T.LongType()))
def rolling_fingerprints(text: pd.Series) -> pd.Series:
    """Arrow-vectorized winnowing fingerprints (engine path; the plain
    function above is the oracle path — tests compare element-wise)."""
    return text.map(lambda t: rolling_fingerprints_py(t))


def nfc_normalize_py(text: str | None) -> str | None:
    """Unicode NFC canonical composition (stdlib unicodedata) — the standard
    first curation stage for web text so byte-level dedup/fingerprints treat
    'e'+U+0301 and U+00E9 as the same document. Deterministic: NFC is a
    pinned Unicode algorithm, identical across engines (DuckDB twin:
    nfc_normalize())."""
    if text is None:
        return None
    return unicodedata.normalize("NFC", text)


@F.pandas_udf(T.StringType())
def nfc_normalize(text: pd.Series) -> pd.Series:
    """Arrow-batched NFC normalization (one Python call per Arrow batch)."""
    return text.map(nfc_normalize_py)
