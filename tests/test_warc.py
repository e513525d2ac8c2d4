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
