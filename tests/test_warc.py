"""WARC codec: byte-exact round trips (pure Python) and the Spark
binaryFile → parse_warc_records source path."""

from __future__ import annotations

import pytest

from data_exchange_routing_spark.sources.warc import (
    build_warc_record,
    encode_warc_files,
    parse_warc,
    parse_warc_records,
    scan_warc,
)


def _roundtrip(payloads_uris):
    buf = b"".join(build_warc_record(u, p) for u, p in payloads_uris)
    return list(parse_warc(buf))


def test_roundtrip_multi_record_exact_bytes():
    recs = _roundtrip([("https://a.example/x", b"hello"), ("https://b.example/y", b"")])
    assert [(h["WARC-Target-URI"], p) for h, p in recs] == [
        ("https://a.example/x", b"hello"),
        ("https://b.example/y", b""),
    ]
    assert all(h["WARC-Type"] == "response" for h, _ in recs)


def test_framing_is_by_length_not_delimiter():
    # payload embeds the record magic AND the header terminator — only
    # Content-Length framing survives this
    evil = b"WARC/1.0\r\n\r\nContent-Length: 999\r\n\r\n" * 3
    (h, p), = _roundtrip([("https://evil.example/", evil)])
    assert p == evil
    assert int(h["Content-Length"]) == len(evil)


def test_unicode_uri_and_payload():
    uri = "https://example.org/café?q=日本"
    payload = "résumé — \U0001f600".encode("utf-8")
    (h, p), = _roundtrip([(uri, payload)])
    assert h["WARC-Target-URI"] == uri and p == payload


def test_record_id_is_content_derived_and_deterministic():
    a = build_warc_record("https://x/", b"same")
    b = build_warc_record("https://x/", b"same")
    c = build_warc_record("https://x/", b"diff")
    assert a == b and a != c


@pytest.mark.parametrize(
    "buf",
    [
        b"HTTP/1.1 200 OK\r\n\r\n",  # bad magic
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n",  # no Content-Length
        build_warc_record("https://x/", b"abc")[:-3],  # truncated trailer
    ],
)
def test_malformed_raises(buf):
    with pytest.raises(ValueError):
        list(parse_warc(buf))


def test_spark_encode_parse_roundtrip(spark):
    df = spark.createDataFrame(
        [(f"https://example.org/doc/{i}", f"text {i} é") for i in range(37)],
        "uri string, text string",
    ).repartition(4)
    files = encode_warc_files(df)
    recs = parse_warc_records(files).toPandas()
    assert len(recs) == 37
    got = sorted((r.uri, bytes(r.payload).decode()) for r in recs.itertuples())
    assert got == sorted((f"https://example.org/doc/{i}", f"text {i} é") for i in range(37))
    assert (recs["content_length"] == recs["payload"].map(len)).all()


def test_scan_warc_from_disk(spark, tmpdir_path):
    raw = [(f"https://example.org/{i}", f"body-{i}".encode()) for i in range(10)]
    for fi in range(2):
        chunk = b"".join(build_warc_record(u, p) for u, p in raw[fi * 5 : fi * 5 + 5])
        with open(f"{tmpdir_path}/part-{fi}.warc", "wb") as f:
            f.write(chunk)
    out = scan_warc(spark, tmpdir_path).toPandas()
    assert sorted((r.uri, bytes(r.payload)) for r in out.itertuples()) == sorted(raw)


def test_warc_gz_member_spans_roundtrip_fuzz():
    """Property test (no Spark): for arbitrary binary payloads — including
    ones containing CRLF CRLF and gzip magic — member-per-record .warc.gz
    framing yields spans that (a) tile the file exactly, (b) each decompress
    STANDALONE to the one original record. This is the invariant ranged CDX
    reads depend on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_exchange_routing_spark.sources.warc import (
        build_warc_record_gz,
        iter_warc_gz_spans,
        maybe_gunzip,
        parse_warc,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        payloads=st.lists(
            st.binary(max_size=300) | st.just(b"\r\n\r\nWARC/1.0\r\n" + b"\x1f\x8b"),
            min_size=1,
            max_size=8,
        )
    )
    def prop(payloads):
        members = [
            build_warc_record_gz(f"u://{i}", p) for i, p in enumerate(payloads)
        ]
        blob = b"".join(members)
        spans = list(iter_warc_gz_spans(blob))
        assert len(spans) == len(payloads)
        pos = 0
        for (off, nb, uri), member, (i, payload) in zip(
            spans, members, enumerate(payloads)
        ):
            assert off == pos and nb == len(member)
            assert uri == f"u://{i}"
            recs = list(parse_warc(maybe_gunzip(blob[off : off + nb])))
            assert len(recs) == 1
            assert recs[0][1] == payload
            pos += nb
        assert pos == len(blob)

    prop()


def test_warc_gz_span_walk_rejects_garbage():
    import pytest as _pytest

    from data_exchange_routing_spark.sources.warc import iter_warc_gz_spans

    with _pytest.raises(ValueError, match="not a gzip member"):
        list(iter_warc_gz_spans(b"plain not gz"))


# ------------------------------------------------------------------ WET

def test_wet_grammar_roundtrip_plain_and_gz(spark):
    """WET derivative: warcinfo + conversion records, text and the
    WARC-Refers-To provenance header survive byte-exactly, plain and
    member-per-record gzip."""
    from data_exchange_routing_spark.sources.warc import (
        encode_wet_files,
        parse_wet_records,
    )

    rows = [
        (f"https://example.org/p/{i}", f"extracted text {i} — é\n\nWARC/1.0", f"<urn:md5:ref{i}>")
        for i in range(23)
    ]
    df = spark.createDataFrame(rows, "uri string, text string, refers_to string").repartition(3)
    for comp in (None, "gzip"):
        out = parse_wet_records(
            encode_wet_files(df, refers_col="refers_to", compression=comp)
        ).toPandas()
        assert sorted(zip(out["uri"], out["text"], out["refers_to"])) == sorted(rows)
        assert (out["content_length"] == out["text"].map(lambda t: len(t.encode()))).all()


def test_wet_refers_to_joins_against_written_response_records(spark):
    """Regression (round-3 ADVICE): the registry's WET query derives
    refers_to with the same '\\x00'-separated md5 build_warc_record uses
    for WARC-Record-ID, so the provenance link actually joins against the
    record_id of response records this library writes for (uri, text)."""
    from pyspark.sql import functions as F

    from data_exchange_routing_spark.plans.queries import QUERIES
    from data_exchange_routing_spark.sources.warc import (
        encode_warc_files,
        parse_warc_records,
    )

    sf = "/root/testdata/sf0.001"
    wet = QUERIES["web_wet_roundtrip"](spark, sf).select("uri", "refers_to")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.concat(F.lit("https://example.org/doc/"), F.col("doc_id").cast("string")).alias("uri"),
        "text",
    )
    resp = parse_warc_records(encode_warc_files(docs)).select("uri", "record_id")
    n_docs = docs.count()
    joined = wet.join(resp, "uri").filter(F.col("refers_to") == F.col("record_id"))
    assert joined.count() == n_docs == wet.count()


def test_wet_warcinfo_leads_every_file(spark):
    """Each encoded WET file starts with exactly one warcinfo record (no
    Target-URI, warc-fields payload); a file NOT led by warcinfo is rejected
    loudly by the WET parser."""
    import pandas as pd
    import pytest as _pytest

    from data_exchange_routing_spark.sources.warc import (
        WET_WARCINFO_PAYLOAD,
        build_warc_record,
        encode_wet_files,
        parse_warc,
        parse_wet_records,
    )

    df = spark.createDataFrame([("u://1", "t")], "uri string, text string").coalesce(1)
    buf = bytes(encode_wet_files(df).toPandas()["warc_file"][0])
    recs = list(parse_warc(buf))
    assert recs[0][0]["WARC-Type"] == "warcinfo"
    assert "WARC-Target-URI" not in recs[0][0]
    assert recs[0][1] == WET_WARCINFO_PAYLOAD
    assert [h["WARC-Type"] for h, _ in recs[1:]] == ["conversion"]

    # a conversion record with no warcinfo leader dead-letters loudly
    bad = build_warc_record(
        "u://1", b"t", rec_type="conversion", content_type="text/plain"
    )
    bad_df = spark.createDataFrame(
        pd.DataFrame({"warc_file": [bad], "n_records": [1]})
    )
    with _pytest.raises(Exception, match="warcinfo"):
        parse_wet_records(bad_df).collect()


def test_wet_reads_through_registered_warc_source(spark, tmpdir_path):
    """A WET file IS a WARC file: the registered `warc` Data Source scans it
    unchanged and the conversion records carry their text payloads."""
    from data_exchange_routing_spark.sources.pyds import register_sources
    from data_exchange_routing_spark.sources.warc import encode_wet_files

    register_sources(spark)
    df = spark.createDataFrame(
        [(f"u://{i}", f"txt {i}") for i in range(6)], "uri string, text string"
    ).coalesce(1)
    buf = encode_wet_files(df).toPandas()["warc_file"][0]
    with open(f"{tmpdir_path}/part-0.warc", "wb") as f:
        f.write(bytes(buf))
    got = (
        spark.read.format("warc").load(str(tmpdir_path))
        .filter("rec_type = 'conversion'")
        .toPandas()
    )
    assert sorted(bytes(p).decode() for p in got["payload"]) == sorted(
        f"txt {i}" for i in range(6)
    )
