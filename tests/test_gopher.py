"""Gopher quality-rule bundle: edge semantics the oracle query can't reach
(the synthetic corpus has no bullets/ellipses/symbols), asserted on
hand-built rows. Value parity with DuckDB is covered per-document by the
oracle-backed `doc_gopher_filters` registry query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions import textstats as TS

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs to the "
    "river where it is seen by a man that waits in the reeds with a net "
    "and a long rope made of straw while the sun sets slowly over the hills "
    "and the night comes down soft with the wind moving in the tall grass"
)


def _row(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        TS.n_words(F.col("text")).alias("nw"),
        TS.symbol_word_ratio(F.col("text")).alias("sym"),
        TS.bullet_line_frac(F.col("text")).alias("bullet"),
        TS.ellipsis_line_frac(F.col("text")).alias("ellipsis"),
        TS.alpha_word_frac(F.col("text")).alias("alpha"),
        TS.passes_gopher(F.col("text")).alias("passes"),
    ).collect()[0]


def test_good_doc_passes(spark):
    r = _row(spark, GOOD)
    assert r.passes and r.nw >= 50 and r.sym == 0.0 and r.alpha == 1.0


def test_bullet_lines_counted(spark):
    text = "- one\n- two\n* three\n• four\nplain line"
    r = _row(spark, text)
    assert r.bullet == 0.8


def test_ellipsis_lines_counted(spark):
    text = "read more...\nfull text here\nto be continued…\nanother"
    r = _row(spark, text)
    assert r.ellipsis == 0.5


def test_symbol_ratio_rejects_tag_soup(spark):
    # normalization strips '#' and '.', so words = the 10 letters;
    # symbols = 2 '#' + 1 '...' -> ratio 3/10 = 0.3 > 0.1
    text = "a b c d e f g h i j ## ..."
    r = _row(spark, text)
    assert r.sym == pytest.approx(0.3)
    assert not r.passes


def test_empty_and_numeric_docs_fail(spark):
    assert not _row(spark, "").passes
    assert not _row(spark, "12 34 56 78 90 " * 20).passes  # alpha_frac = 0
