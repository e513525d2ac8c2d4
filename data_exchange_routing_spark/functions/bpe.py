"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the vocabulary-learning step
of an LLM data pipeline, expressed entirely as DataFrame aggregations and
windows so the learned merge table is exact and oracle-checkable.

Semantics (the original BPE trainer, applied corpus-wide):

1. collapse the corpus to its distinct-word frequency table;
2. start every word as its character sequence;
3. for each of ``n_merges`` rounds, count adjacent symbol pairs weighted by
   word frequency, pick the most frequent pair (ties break on ascending
   (left, right) — symbols are ASCII ``[a-z0-9]+`` after the pinned
   normalization, so binary string order agrees across engines), and merge
   that pair greedily LEFT-TO-RIGHT inside every word.

Greedy left-to-right matters only when left == right (a run of the same
symbol): in a run of n candidates the surviving merge starts are those at
even offset within the run, so a run of 4 'a's becomes (aa, aa), never
(a, aa, a). Runs are resolved relationally with a gaps-and-islands window —
candidate starts can be adjacent ONLY in the left==right case (a candidate
at pos i+1 needs sym[i+1] == left, but a candidate at i forces
sym[i+1] == right), so parity-within-island is exactly the greedy rule.

Shape at 100 TB: the word-frequency collapse is one map-side-combinable agg
that shrinks the corpus to its vocabulary — every later pass touches the
vocab table (orders of magnitude smaller), never the corpus. Each round is
one pair-count agg (map-side combined; the argmax is a 1-row broadcast, no
driver data path beyond the k-row model itself) plus windows/joins
hash-partitioned on the word key; ``localCheckpoint`` per round truncates
lineage so round k costs O(1) rounds, not O(k) (the connected-components
lesson). Skewed word frequencies are irrelevant: freq is a payload column,
the partition key is the word itself.

Reference parity: the reference repo has no tokenizer; this is one of the
training-data operators the build brief adds beyond CDCgov/data-exchange-routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.textstats import normalize_text

MERGES_SCHEMA = "rank int, lhs string, rhs string, merged string, pair_count bigint"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table of the normalized corpus."""
    return (
        df.select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(df: DataFrame, n_merges: int = 8, text_col: str = "text") -> DataFrame:
    """Learn the top ``n_merges`` BPE merges from the corpus.

    Returns (rank, lhs, rhs, merged, pair_count) — the merge table IS the
    model (k rows on the driver, like any trained-model broadcast)."""
    spark = df.sparkSession
    words = word_freqs(df, text_col)
    # initial symbol table: (w, freq, pos, sym) — one char per row
    # split(w, "(?!^)") keeps one trailing empty string (limit -1); drop it —
    # it sits past the last real position, so positions stay contiguous
    tok = words.select(
        "w", "freq", F.posexplode(F.split(F.col("w"), "(?!^)")).alias("pos", "sym")
    ).filter(F.col("sym") != "")
    byw = Window.partitionBy("w").orderBy("pos")
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = tok.withColumn("nxt", F.lead("sym").over(byw))
        pc = (
            pairs.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("c"))
        )
        top = pc.orderBy(F.col("c").desc(), "sym", "nxt").limit(1).collect()
        if not top:
            break
        lhs, rhs, cnt = top[0]["sym"], top[0]["nxt"], int(top[0]["c"])
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        # greedy left-to-right starts: candidates -> islands -> even offsets
        starts = (
            pairs.filter((F.col("sym") == F.lit(lhs)) & (F.col("nxt") == F.lit(rhs)))
            .withColumn("grp", F.col("pos") - F.row_number().over(byw))
            .withColumn(
                "off",
                F.row_number().over(Window.partitionBy("w", "grp").orderBy("pos")) - 1,
            )
            .filter(F.col("off") % 2 == 0)
            .select("w", "pos")
        )
        vstart = starts.withColumn("_st", F.lit(1))
        vabs = starts.select("w", (F.col("pos") + 1).alias("pos"), F.lit(1).alias("_ab"))
        tok = (
            tok.join(vstart, ["w", "pos"], "left")
            .join(vabs, ["w", "pos"], "left")
            .filter(F.col("_ab").isNull())
            .select(
                "w",
                "freq",
                F.col("pos").alias("_opos"),
                F.when(F.col("_st") == 1, F.lit(lhs + rhs)).otherwise(F.col("sym")).alias("sym"),
            )
            .withColumn("pos", F.row_number().over(Window.partitionBy("w").orderBy("_opos")))
            .select("w", "freq", "pos", "sym")
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_oracle_sql(n_merges: int = 8, norm_sql: str | None = None) -> str:
    """The exact DuckDB twin: the same trainer unrolled to ``n_merges``
    iteration blocks (every multiply-referenced CTE MATERIALIZED — DuckDB
    inlines CTEs by default, measured 4^k blowup on iterative oracles).
    Assumes every round finds at least one pair (true for any corpus whose
    vocab still has multi-symbol words after n_merges rounds; the Spark side
    stops early instead)."""
    assert norm_sql is not None
    blocks = [
        f"""
words AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS freq FROM (
    SELECT unnest({norm_sql}) AS w FROM documents) WHERE w <> '' GROUP BY 1),
tok0 AS MATERIALIZED (
  SELECT w, freq, i AS pos, substr(w, i, 1) AS sym
  FROM words, UNNEST(range(1, len(w) + 1)) AS t(i))"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        blocks.append(
            f"""
pr{i} AS MATERIALIZED (
  SELECT w, freq, pos, sym,
         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM tok{p}),
best{i} AS MATERIALIZED (
  SELECT sym AS lhs, nxt AS rhs, sum(freq) AS c FROM pr{i}
  WHERE nxt IS NOT NULL GROUP BY 1, 2
  ORDER BY c DESC, lhs, rhs LIMIT 1),
st{i} AS MATERIALIZED (
  SELECT w, pos FROM (
    SELECT w, pos,
           row_number() OVER (PARTITION BY w, grp ORDER BY pos) - 1 AS off
    FROM (
      SELECT p.w, p.pos,
             p.pos - row_number() OVER (PARTITION BY p.w ORDER BY p.pos) AS grp
      FROM pr{i} p, best{i} b
      WHERE p.sym = b.lhs AND p.nxt = b.rhs))
  WHERE off % 2 = 0),
tok{i} AS MATERIALIZED (
  SELECT w, freq,
         row_number() OVER (PARTITION BY w ORDER BY opos) AS pos, sym
  FROM (
    SELECT t.w, t.freq, t.pos AS opos,
           CASE WHEN s.pos IS NOT NULL THEN b.lhs || b.rhs ELSE t.sym END AS sym
    FROM tok{p} t
    CROSS JOIN best{i} b
    LEFT JOIN st{i} s ON t.w = s.w AND t.pos = s.pos
    LEFT JOIN (SELECT w, pos + 1 AS pos FROM st{i}) a
      ON t.w = a.w AND t.pos = a.pos
    WHERE a.pos IS NULL))"""
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, lhs, rhs, lhs || rhs AS merged,"
        f" CAST(c AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(blocks) + "\n" + finals


def bpe_encode_oracle_sql(n_merges: int = 4, norm_sql_text: str | None = None,
                          norm_sql_arr: str | None = None) -> str:
    """DuckDB twin of train-then-encode: the trainer blocks (for best{i})
    plus a document-level symbol table that applies each merge with the same
    islands-parity rule, spaces riding along as boundary blockers."""
    assert norm_sql_text is not None and norm_sql_arr is not None
    sql = bpe_oracle_sql(n_merges, norm_sql=norm_sql_arr)
    # trainer CTE body: everything between "WITH " and the top-level finals
    # (inner SELECTs are indented, so "\nSELECT" only matches the finals)
    with_body = sql[len("WITH "):sql.index("\nSELECT")]
    blocks = [
        with_body,
        f"""
dtok0 AS MATERIALIZED (
  SELECT doc_id, i AS pos, substr(txt, i, 1) AS sym
  FROM (SELECT doc_id, {norm_sql_text} AS txt FROM documents),
       UNNEST(range(1, len(txt) + 1)) AS t(i))""",
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        blocks.append(
            f"""
dpr{i} AS MATERIALIZED (
  SELECT doc_id, pos, sym,
         lead(sym) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM dtok{p}),
dst{i} AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY doc_id, grp ORDER BY pos) - 1 AS off
    FROM (
      SELECT p.doc_id, p.pos,
             p.pos - row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS grp
      FROM dpr{i} p, best{i} b
      WHERE p.sym = b.lhs AND p.nxt = b.rhs))
  WHERE off % 2 = 0),
dtok{i} AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY opos) AS pos, sym
  FROM (
    SELECT t.doc_id, t.pos AS opos,
           CASE WHEN s.pos IS NOT NULL THEN b.lhs || b.rhs ELSE t.sym END AS sym
    FROM dtok{p} t
    CROSS JOIN best{i} b
    LEFT JOIN dst{i} s ON t.doc_id = s.doc_id AND t.pos = s.pos
    LEFT JOIN (SELECT doc_id, pos + 1 AS pos FROM dst{i}) a
      ON t.doc_id = a.doc_id AND t.pos = a.pos
    WHERE a.pos IS NULL))"""
        )
    final = f"""
SELECT d.doc_id,
       CAST(coalesce(x.n, 0) AS BIGINT) AS n_pieces,
       coalesce(x.h, md5('')) AS pieces_hash
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n,
         md5(string_agg(sym, '|' ORDER BY pos)) AS h
  FROM dtok{n_merges} WHERE sym <> ' ' GROUP BY 1) x USING (doc_id)"""
    return "WITH " + ",".join(blocks) + final


def bpe_encode_arrow(df: DataFrame, merges: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched encoder — the 100 TB hot path. The k-row merge table is
    the model: collected once, closed over, and applied per document inside
    ``mapInPandas`` (embarrassingly parallel, zero shuffles, zero state). The
    relational ``bpe_encode`` is its exact twin and the oracle gate; this
    path exists because tokenization is inherently per-doc sequential work
    that belongs in one vectorized batch pass, not k windowed table passes.

    Output schema and values are byte-identical to ``bpe_encode``
    (gated in tests/test_functions.py)."""
    import hashlib
    import re as _re

    ranked = [(m["lhs"], m["rhs"], m["merged"]) for m in
              sorted(merges.collect(), key=lambda r: r["rank"])]
    out_schema = "doc_id long, n_pieces long, pieces_hash string"

    def encode_batches(batches):
        import pandas as pd

        def norm(t):
            t = _re.sub(r"[^a-z0-9 ]", " ", (t or "").lower())
            return _re.sub(r" +", " ", t).strip()

        def enc(t):
            words = [list(w) for w in norm(t).split(" ") if w]
            for lhs, rhs, merged in ranked:
                for wi, syms in enumerate(words):
                    out, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                            out.append(merged)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    words[wi] = out
            pieces = [s for w in words for s in w]
            return len(pieces), hashlib.md5("|".join(pieces).encode()).hexdigest()

        for pdf in batches:
            res = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_pieces": [n for n, _ in res],
                    "pieces_hash": [h for _, h in res],
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode_batches, out_schema)


def bpe_encode(df: DataFrame, merges: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge table: tokenize each document with the merges
    in rank order (the standard BPE encoder). Returns (doc_id, n_pieces,
    pieces_hash) — the hash makes the full segmentation oracle-checkable
    without hauling every piece through the comparator.

    The merge table is tiny (k rows) and is collected + applied inside ONE
    vectorized pass per round over the symbol table, reusing the trainer's
    merge machinery — no per-row Python."""
    spark = df.sparkSession
    ranked = sorted(merges.collect(), key=lambda r: r["rank"])
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(normalize_text(F.col(text_col)), "(?!^)")
        ).alias("pos", "sym"),
    ).filter(F.col("sym") != "")  # drop split()'s trailing empty string
    byd = Window.partitionBy("doc_id").orderBy("pos")
    for m in ranked:
        lhs, rhs = m["lhs"], m["rhs"]
        pairs = tok.withColumn("nxt", F.lead("sym").over(byd))
        starts = (
            pairs.filter((F.col("sym") == F.lit(lhs)) & (F.col("nxt") == F.lit(rhs)))
            .withColumn("grp", F.col("pos") - F.row_number().over(byd))
            .withColumn(
                "off",
                F.row_number().over(Window.partitionBy("doc_id", "grp").orderBy("pos")) - 1,
            )
            .filter(F.col("off") % 2 == 0)
            .select("doc_id", "pos")
        )
        vstart = starts.withColumn("_st", F.lit(1))
        vabs = starts.select(
            "doc_id", (F.col("pos") + 1).alias("pos"), F.lit(1).alias("_ab")
        )
        tok = (
            tok.join(vstart, ["doc_id", "pos"], "left")
            .join(vabs, ["doc_id", "pos"], "left")
            .filter(F.col("_ab").isNull())
            .select(
                "doc_id",
                F.col("pos").alias("_opos"),
                F.when(F.col("_st") == 1, F.lit(lhs + rhs)).otherwise(F.col("sym")).alias("sym"),
            )
            .withColumn(
                "pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("_opos"))
            )
            .select("doc_id", "pos", "sym")
            .localCheckpoint(eager=True)
        )
    # spaces rode along as boundary-blocking symbols (a merge can never span
    # a word gap because the gap occupies a position); drop them from output
    agg = tok.filter(F.col("sym") != " ").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pieces"),
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                    lambda s: s["sym"],
                ),
            )
        ).alias("pieces_hash"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pieces", F.lit(0)).cast("bigint").alias("n_pieces"),
            F.coalesce("pieces_hash", F.md5(F.lit(""))).alias("pieces_hash"),
        )
    )
