"""Pure-pandas/Python replay oracle (FIXTURES.md §7).

Independent re-implementation of the CDC semantics with no Spark involved:
group events by destination, per url keep the max-(warc_ts, lsn) event, apply
op semantics, run the SAME pinned extraction function. Used to assert
final-table-state equality, with `text` compared exactly (byte-identity
contract: extract_text_py is the single source of truth).
"""

from __future__ import annotations

import pandas as pd

from data_exchange_routing_spark.functions.extract import extract_text_py
from data_exchange_routing_spark.schemas import (
    ERR_EMPTY_META,
    ERR_MISSING_STREAM_ID,
    ERR_MISSING_STREAM_ROUTE,
)
from data_exchange_routing_spark.sources.configs import DEFAULT_ROUTES

ROUTES = {k: t for (k, t, _p, _m, v) in DEFAULT_ROUTES if v}
INVALID_ROUTE_KEYS = {k for (k, _t, _p, _m, v) in DEFAULT_ROUTES if not v}


def _as_dict(meta) -> dict:
    if meta is None:
        return {}
    if isinstance(meta, dict):
        return dict(meta)
    return {k: v for k, v in meta}  # pyarrow map -> list of tuples


def validation_error(meta: dict) -> str | None:
    m = {str(k).lower(): v for k, v in meta.items()}
    if not m:
        return ERR_EMPTY_META
    if not m.get("data_stream_id"):
        return ERR_MISSING_STREAM_ID
    if not m.get("data_stream_route"):
        return ERR_MISSING_STREAM_ROUTE
    return None


def oracle_final_states(events: pd.DataFrame, promote: tuple[str, ...] = ("charset",)) -> dict[str, pd.DataFrame]:
    """Return {destination_table: final_state_df(url, warc_ts, text, lang, *promote)}."""
    per_dest: dict[str, dict[str, tuple]] = {t: {} for t in set(ROUTES.values())}
    for row in events.itertuples(index=False):
        meta = _as_dict(row.meta)
        if validation_error(meta) is not None:
            continue
        dest = ROUTES.get(row.content_type)
        if dest is None:
            continue  # no route or invalid route -> dead-letter
        key = (row.warc_ts, row.lsn)
        cur = per_dest[dest].get(row.url)
        if cur is None or key > cur[0]:
            per_dest[dest][row.url] = (key, row)
    out = {}
    for dest, state in per_dest.items():
        rows = []
        for url, (_key, row) in state.items():
            if row.op == "D":
                continue
            meta = {str(k).lower(): v for k, v in _as_dict(row.meta).items()}
            html = bytes(row.html) if row.html is not None else None
            rec = {
                "url": url,
                "warc_ts": row.warc_ts,
                "html": html,
                "text": extract_text_py(html),
                "lang": row.lang,
            }
            for k in promote:
                rec[k] = meta.get(k)
            rows.append(rec)
        out[dest] = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang", *promote])
    return out


def oracle_dead_letter_counts(events: pd.DataFrame) -> dict[str, int]:
    """{stage: n_rows} expected in dead_letter (duplicates included —
    at-least-once dead-lettering, like the reference)."""
    counts = {"validate": 0, "route": 0}
    for row in events.itertuples(index=False):
        meta = _as_dict(row.meta)
        if validation_error(meta) is not None:
            counts["validate"] += 1
        elif row.content_type not in ROUTES:
            counts["route"] += 1
    return counts
