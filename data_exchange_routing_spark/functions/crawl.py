"""Crawl-politeness operators: robots-rule URL filtering and per-host
frontier scheduling.

A web-corpus pipeline does not only consume crawls — it plans them. Two
operators every crawler control loop needs, both expressed as pure
DataFrame plans:

- ``robots_filter``: REP (robots-exclusion, RFC 9309) longest-prefix-match
  allow/disallow resolution of a URL set against a per-host rule table.
  Google's published semantics: the most specific (longest) matching rule
  wins, ``allow`` wins length ties, no matching rule means allowed.
- ``frontier_schedule``: per-host politeness waves — each host fetches at
  most ``concurrency`` URLs per wave, highest-priority first, so the
  frontier is emitted as (wave, slot) coordinates a fetch fleet can drain
  without hammering any origin.

Scale shape: the rule table is control-plane sized (crawler configs are
KB–MB) and broadcast, so the URL side NEVER shuffles for the filter; the
rule resolution is one map-side-combinable ``max_by`` aggregation keyed by
URL. Scheduling is one window shuffle keyed by host — the same exchange a
per-host cap already pays — and priorities use deterministic orderings so
replanning on a different cluster size yields identical waves.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Resolve REP rules for each URL row.

    ``rules`` columns: (host, rule in {'allow', 'disallow'}, prefix).
    Appends ``allowed`` (boolean), ``matched_rule``, ``matched_prefix``
    (NULL when no rule matched). Longest prefix wins; 'allow' beats
    'disallow' on equal length; rows whose host has no matching rule are
    allowed.

    Plan: broadcast left join on host + startswith (rules are tiny), then
    ONE max_by agg per URL row over (prefix length, is-allow) — map-side
    combinable, no window, no second shuffle.
    """
    r = rules.select(
        F.col("host").alias("_r_host"),
        F.col("rule").alias("_r_rule"),
        F.col("prefix").alias("_r_prefix"),
    )
    joined = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("_r_host"))
        & F.col(path_col).startswith(F.col("_r_prefix")),
        "left",
    )
    # total deterministic preference order: longer prefix first, allow over
    # disallow on ties (is_allow is 1/0), then the prefix string itself so
    # duplicate-length distinct rules cannot flip nondeterministically
    pref = F.struct(
        F.length("_r_prefix").alias("l"),
        (F.col("_r_rule") == "allow").cast("int").alias("a"),
        F.col("_r_prefix").alias("p"),
        F.col("_r_rule").alias("r"),
    )
    key_cols = [c for c in urls.columns]
    won = (
        joined.groupBy(*key_cols)
        .agg(F.max_by(F.struct("_r_rule", "_r_prefix"), pref).alias("_win"))
    )
    return won.select(
        *key_cols,
        F.coalesce(F.col("_win._r_rule") == "allow", F.lit(True)).alias("allowed"),
        F.col("_win._r_rule").alias("matched_rule"),
        F.col("_win._r_prefix").alias("matched_prefix"),
    )


def _dns_suffixes(host_col: str):
    """All DNS suffixes of a host as an array column: "a.b.c" ->
    ["a.b.c", "b.c", "c"]. Shared by blocklist_filter and
    registered_domains so suffix-handling fixes land in one place."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def blocklist_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Category blocklist filtering (UT1/URLhaus-style list shape): mark each
    URL row with the blocklist categories it falls under.

    ``rules`` columns: ``(category, domain, path_prefix)`` — a rule matches
    when the URL's host IS the domain or is a subdomain of it (DNS suffix
    match), and, if ``path_prefix`` is non-empty, the path starts with it.
    Appends ``blocked`` (any rule matched) and ``categories`` (sorted
    distinct matched categories; empty array when clean).

    Scale shape: real blocklists are MILLIONS of domains (UT1's adult list
    alone is ~4M), so suffix matching must NOT be an endswith theta-join
    (nested-loop against every rule). Instead each host explodes into its
    DNS suffixes (bounded by label count, ~4-6 rows) and equi-joins the rule
    table on suffix = domain — a plain broadcast/shuffle HASH join that
    scales to arbitrarily large lists; one groupBy over the URL row's
    columns folds multi-rule hits back to one row.
    """
    sufs = _dns_suffixes(host_col)
    r = rules.select(
        F.col("category").alias("_b_cat"),
        F.col("domain").alias("_b_dom"),
        F.col("path_prefix").alias("_b_pfx"),
    )
    # a failed path-prefix check nulls the match rather than dropping the
    # row — every exploded suffix row survives, so a URL can never vanish
    # from the output however many rules its suffixes touch
    path_ok = (
        F.col("_b_pfx").isNull()
        | (F.col("_b_pfx") == "")
        | F.col(path_col).startswith(F.col("_b_pfx"))
    )
    # explode_outer: a NULL/empty host still yields one (null-suffix) row,
    # so malformed URLs come back blocked=false instead of vanishing
    joined = (
        urls.withColumn("_suf", F.explode_outer(sufs))
        .join(F.broadcast(r), F.col("_suf") == F.col("_b_dom"), "left")
        .withColumn("_b_match", F.when(path_ok, F.col("_b_cat")))
    )
    key_cols = list(urls.columns)
    return (
        joined.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_set("_b_match")).alias("categories"))
        .withColumn("blocked", F.size("categories") > 0)
    )


def registered_domains(
    urls: DataFrame,
    suffixes: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Registered-domain (eTLD+1) extraction with Public-Suffix-List
    semantics: the LONGEST suffix of the host present in ``suffixes``
    (column ``suffix``) is the public suffix; the registered domain is one
    label more. Hosts with no listed suffix fall back to the PSL's implicit
    ``*`` rule (last label is the suffix). A host that IS a public suffix
    outright gets NULL (you cannot register "co.uk"). This is what
    per-domain caps and politeness budgets should key on — "a.example.co.uk"
    and "b.example.co.uk" are the same owner, "a.co.uk" and "b.co.uk" are
    not.

    Appends ``public_suffix`` and ``registered_domain``. Scale shape:
    identical to blocklist_filter — hosts explode into their DNS suffixes
    and hash-equi-join the (broadcast) suffix list; the full PSL is ~9k
    rows, a classic broadcast dimension. One groupBy folds the candidates
    to the longest match; NULL hosts survive via explode_outer."""
    # candidate rows: (position i 1-based, suffix labels[i:]) — suffix
    # construction shared with blocklist_filter via _dns_suffixes
    cands = F.transform(
        _dns_suffixes(host_col),
        lambda suf, i: F.struct((i + 1).alias("pos"), suf.alias("suf")),
    )
    s = suffixes.select(F.col("suffix").alias("_ps_suf"))
    joined = urls.withColumn("_c", F.explode_outer(cands)).join(
        F.broadcast(s), F.col("_c.suf") == F.col("_ps_suf"), "left"
    )
    # longest matched suffix = smallest pos with a match; fall back to the
    # implicit * rule (pos = n, the bare last label) when nothing matched
    hit = F.when(F.col("_ps_suf").isNotNull(), F.col("_c.pos"))
    key_cols = list(urls.columns)
    won = joined.groupBy(*key_cols).agg(
        F.min(hit).alias("_pos"), F.max(F.size(F.split(F.col(host_col), r"\."))).alias("_n")
    )
    pos = F.coalesce(F.col("_pos"), F.col("_n"))  # * rule fallback
    lbl = F.split(F.col(host_col), r"\.")
    out = won.select(
        *key_cols,
        F.when(
            F.col(host_col).isNotNull() & (F.col(host_col) != ""),
            F.array_join(F.slice(lbl, pos, F.col("_n")), "."),
        ).alias("public_suffix"),
        F.when(
            F.col(host_col).isNotNull() & (F.col(host_col) != "") & (pos > 1),
            F.array_join(F.slice(lbl, pos - 1, F.col("_n")), "."),
        ).alias("registered_domain"),
    )
    return out


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve HTTP-redirect chains: follow ``src -> dst`` hops until a
    terminal URL (no outgoing redirect) or the ``max_hops`` budget — the
    bounded-redirect policy every fetcher implements (browsers/libcurl cap
    around 20; loops and over-long chains are failures, not infinite walks).

    Returns one row per distinct ``src``: ``(src, final_url, n_hops,
    resolved)``. ``resolved`` is true iff a terminal was reached within
    ``max_hops`` hops; loops and longer chains yield ``resolved=false`` with
    NULL ``final_url``/``n_hops`` (a fetcher treats both identically, and
    the landing node mid-loop is not meaningful). Duplicate out-edges for a
    src resolve deterministically to ``min(dst)``.

    Scale shape: POINTER DOUBLING, not hop-by-hop walking — each round
    composes the partial walk with itself (one self-equi-join keyed by src),
    so ``ceil(log2(max_hops))`` rounds cover the full budget: 4 joins for 16
    hops where the naive walk pays 16. Every round eagerly localCheckpoints
    (the connected-components lineage rule), keeping round k at O(1) jobs
    over stored blocks. For a done row ``hops`` is the exact chain length
    (undone rows carry exactly 2^k, so compositions stay exact).
    """
    m = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    m = m.groupBy("src").agg(F.min("dst").alias("dst"))
    srcs = m.select(F.col("src").alias("_s"))
    state = (
        m.alias("a")
        .join(srcs.alias("b"), F.col("a.dst") == F.col("b._s"), "left")
        .select(
            F.col("a.src").alias("src"),
            F.col("a.dst").alias("cur"),
            F.lit(1).cast("long").alias("hops"),
            F.col("b._s").isNull().alias("done"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = max(0, math.ceil(math.log2(max_hops))) if max_hops > 1 else 0
    for _round in range(rounds):
        undone = state.filter(~F.col("done"))
        if undone.isEmpty():
            break
        # "no b row" (a.cur is terminal -> done, stay) is distinct from a b
        # row CARRYING a NULL cur (walked into a malformed NULL-dst edge —
        # the NULL must propagate so the chain ends unresolved, not be
        # coalesced back to the pre-step node)
        no_b = F.col("b.src").isNull()
        stepped = undone.alias("a").join(
            state.alias("b"), F.col("a.cur") == F.col("b.src"), "left"
        ).select(
            F.col("a.src").alias("src"),
            F.when(no_b, F.col("a.cur")).otherwise(F.col("b.cur")).alias("cur"),
            (F.col("a.hops") + F.when(no_b, F.lit(0)).otherwise(F.col("b.hops"))).alias("hops"),
            F.when(no_b, F.lit(True)).otherwise(F.col("b.done")).alias("done"),
        )
        state = (
            state.filter(F.col("done")).unionByName(stepped).localCheckpoint(eager=True)
        )
    # a NULL dst (malformed Location) walks to "done" with cur NULL — that
    # is NOT a resolved terminal; require a real landing URL
    ok = F.col("done") & (F.col("hops") <= max_hops) & F.col("cur").isNotNull()
    return state.select(
        "src",
        F.when(ok, F.col("cur")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("n_hops"),
        ok.alias("resolved"),
    )


def frontier_schedule(
    urls: DataFrame,
    host_col: str = "host",
    priority_cols: list | None = None,
    concurrency: int = 2,
) -> DataFrame:
    """Assign (wave, slot) politeness coordinates per host.

    Within each host, rows are ranked by ``priority_cols`` (a deterministic
    total order — callers should end it with the URL itself); rank r maps to
    wave = r // concurrency, slot = r % concurrency. Wave w of every host
    can be fetched concurrently while no host sees more than ``concurrency``
    in-flight requests.
    """
    order = priority_cols if priority_cols is not None else [F.col("url").asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    rk = F.row_number().over(w) - 1
    return urls.withColumn("wave", (rk / concurrency).cast("long")).withColumn(
        "slot", (rk % concurrency).cast("long")
    )
