"""PII redaction for web-text curation: emails, IPv4 addresses,
international phone numbers, and SSN-shaped ids are replaced with typed
placeholder tokens — the standard scrub (C4/Dolma-style) applied before a
corpus is used for training.

Everything is JVM-side ``regexp_replace``/``regexp_count`` inside
whole-stage codegen — zero Python in the hot path, no shuffle at all (pure
narrow map), so the operator runs at scan speed on 100 TB. Patterns are
deliberately restricted to the regex subset Java and RE2 interpret
identically (no backrefs, no lookaround) so the DuckDB oracle is exact.

Reference parity: the reference's HL7 redactor spike is an unimplemented
TODO (spikes/hl7-orchestration/fns/main/kotlin/hl7v2/fn-redactor/
Function.kt:14-23 returns "Completed" unconditionally); this supplies the
real semantics for the web-text payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: emails first (their domains could otherwise feed the IP/phone
# patterns), then IPs, then +-prefixed intl phones, then SSN-shaped ids.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}(?:[ -]?\d{2,4}){2,3}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    with_counts: bool = True,
) -> DataFrame:
    """Replace every PII match with its placeholder; optionally add an
    ``n_<kind>`` count column per pattern (counted on the pre-redaction
    text, so overlapping kinds report what each pattern saw)."""
    out = df
    if with_counts:
        for kind, pat, _ in PII_PATTERNS:
            out = out.withColumn(
                f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint")
            )
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)
