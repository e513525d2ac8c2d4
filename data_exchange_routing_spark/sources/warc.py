"""WARC (Web ARChive, ISO 28500) source: the native input format of web-scale
text pipelines (Common Crawl et al.). Pure-stdlib writer + parser, wired into
Spark as mapInPandas over binary columns — the same plumbing contract as the
BMP/WAV/GIF codecs in functions/multimodal.py.

Reference analog: the reference routes opaque received payloads by metadata
(fns-routing/.../RouteIngestedFile.kt blob dispatch); a web-crawl deployment
of the same pipeline receives WARC — this module is that ingest edge.

Format (WARC/1.0): each record is a CRLF-terminated header block
(`WARC/1.0`, `WARC-Type`, `WARC-Record-ID`, `WARC-Date`, `WARC-Target-URI`,
`Content-Length`), a blank line, `Content-Length` payload bytes, and a
`\r\n\r\n` trailer. Framing is BY LENGTH, never by delimiter scan, so
payloads containing `WARC/1.0` or blank lines round-trip exactly.

Scale shape: one WARC file per Arrow batch on encode (no shuffle); parse is
1→N per file row, embarrassingly parallel across files. A 100 TB crawl is
millions of ~1 GB WARC files — Spark's binaryFile source splits by FILE, so
per-file parse parallelism matches the native layout. Record IDs are
content-derived (md5 of URI + payload), keeping the encode deterministic for
replay/retry idempotency.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

CRLF = b"\r\n"
_FIXED_DATE = "2024-01-01T00:00:00Z"  # deterministic encode (replay-stable)


def build_warc_record(
    uri: str | None,
    payload: bytes,
    rec_type: str = "response",
    date: str = _FIXED_DATE,
    content_type: str = "text/html",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One WARC/1.0 record as bytes. Record-ID is content-derived
    (deterministic across retries), Content-Length frames the payload.
    ``uri=None`` omits WARC-Target-URI (warcinfo records carry none);
    ``extra_headers`` adds named headers (e.g. WARC-Refers-To) verbatim."""
    rid = hashlib.md5((uri or "").encode("utf-8") + b"\x00" + payload).hexdigest()
    head = (
        b"WARC/1.0" + CRLF
        + f"WARC-Type: {rec_type}".encode() + CRLF
        + f"WARC-Record-ID: <urn:md5:{rid}>".encode() + CRLF
        + f"WARC-Date: {date}".encode() + CRLF
    )
    if uri is not None:
        head += f"WARC-Target-URI: {uri}".encode("utf-8") + CRLF
    for k, v in (extra_headers or {}).items():
        head += f"{k}: {v}".encode("utf-8") + CRLF
    head += (
        f"Content-Type: {content_type}".encode() + CRLF
        + f"Content-Length: {len(payload)}".encode() + CRLF
        + CRLF
    )
    return head + payload + CRLF + CRLF


def _iter_warc(buf: bytes) -> Iterator[tuple[int, int, dict[str, str], bytes]]:
    """Walk a WARC buffer record by record, yielding
    (record_offset, record_nbytes, headers, payload). Real framing: headers
    end at the first blank line, the payload is exactly Content-Length bytes,
    then the mandatory CRLF CRLF trailer. Raises ValueError on malformed
    input (bad magic, missing length, short file) — a corrupt crawl file
    should dead-letter loudly, not truncate silently."""
    pos = 0
    end = len(buf)
    while pos < end:
        head_end = buf.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError(f"WARC: unterminated header block at byte {pos}")
        lines = buf[pos:head_end].split(CRLF)
        if lines[0] != b"WARC/1.0":
            raise ValueError(f"WARC: bad version line {lines[0]!r} at byte {pos}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
        if "Content-Length" not in headers:
            raise ValueError(f"WARC: record at byte {pos} lacks Content-Length")
        n = int(headers["Content-Length"])
        body_start = head_end + 4
        body_end = body_start + n
        if buf[body_end : body_end + 4] != CRLF + CRLF:
            raise ValueError(f"WARC: record at byte {pos} missing CRLFCRLF trailer")
        yield pos, body_end + 4 - pos, headers, buf[body_start:body_end]
        pos = body_end + 4


def parse_warc(buf: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Parse a WARC file: yields (headers, payload) per record (framing and
    error contract: see _iter_warc)."""
    for _off, _nb, headers, payload in _iter_warc(buf):
        yield headers, payload


def record_columns(recs: "Iterator[tuple[dict, bytes]]") -> dict[str, list]:
    """(headers, payload) records -> the six standard output columns.
    The ONE place the header->column mapping lives: the legacy
    mapInPandas parser and the registered `warc` Data Source both call it
    (the suite asserts they match byte-identically — keep it that way)."""
    cols: dict[str, list] = {
        "uri": [], "rec_type": [], "warc_date": [], "record_id": [],
        "content_length": [], "payload": [],
    }
    for headers, payload in recs:
        cols["uri"].append(headers.get("WARC-Target-URI"))
        cols["rec_type"].append(headers.get("WARC-Type"))
        cols["warc_date"].append(headers.get("WARC-Date"))
        cols["record_id"].append(headers.get("WARC-Record-ID"))
        cols["content_length"].append(int(headers["Content-Length"]))
        cols["payload"].append(payload)
    return cols


def iter_warc_spans(buf: bytes) -> Iterator[tuple[int, int, str]]:
    """Yield (record_offset, record_nbytes, uri) per record — the byte-exact
    record framing a CDX index stores so readers can split WITHIN a WARC file
    on record boundaries."""
    for off, nb, headers, _payload in _iter_warc(buf):
        yield off, nb, headers.get("WARC-Target-URI")


WARC_FILE_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.BinaryType(), False),
        T.StructField("n_records", T.IntegerType(), False),
    ]
)

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), True),
        T.StructField("rec_type", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def encode_warc_files(
    df: DataFrame, uri_col: str = "uri", text_col: str = "text"
) -> DataFrame:
    """N rows → one WARC file per Arrow batch (mapInPandas, no shuffle).
    Payload is the utf-8 encoding of ``text_col``."""

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            chunks = [
                build_warc_record(u, t.encode("utf-8"))
                for u, t in zip(pdf[uri_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {"warc_file": [b"".join(chunks)], "n_records": [len(chunks)]}
            )

    return df.mapInPandas(op, WARC_FILE_SCHEMA)


def parse_warc_records(df: DataFrame, file_col: str = "warc_file") -> DataFrame:
    """1→N: each WARC file row explodes into its records (mapInPandas)."""

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "uri": [], "rec_type": [], "warc_date": [],
                "record_id": [], "content_length": [], "payload": [],
            }
            for buf in pdf[file_col]:
                for k, v in record_columns(parse_warc(bytes(buf))).items():
                    out[k].extend(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(op, WARC_RECORD_SCHEMA)


def scan_warc(spark, path: str) -> DataFrame:
    """Read WARC files from disk (binaryFile source — splits per file, the
    native crawl layout) and explode into records."""
    files = spark.read.format("binaryFile").load(path).select(
        F.col("content").alias("warc_file")
    )
    return parse_warc_records(files)


WARC_CDX_SCHEMA = T.StructType(
    [
        T.StructField("warc_path", T.StringType(), False),
        T.StructField("rec_offset", T.LongType(), False),
        T.StructField("rec_bytes", T.LongType(), False),
        T.StructField("uri", T.StringType(), True),
    ]
)


def build_warc_cdx(spark, warc_dir: str, out_dir: str, suffix: str = ".warc") -> None:
    """Distributed byte-offset CDX sidecar: one row per WARC record with its
    exact (offset, nbytes) framing. This is what makes ~1 GB crawl files
    splittable — the `warc` Data Source's ``cdxPath`` option plans ranged
    InputPartitions from it (sources/pyds.py), so intra-file parallelism no
    longer depends on file count. Built executor-side: one task parses one
    file's framing (header walk only — payload bytes are never copied out),
    emitting Arrow batches; no shuffle, no driver collect.

    Reference analog: a CDX capture index is the standard web-archive
    companion file (publicly documented format family); here it carries the
    minimal split-planning columns.
    """

    def op(batches):
        import pandas as pd
        from urllib.parse import urlparse

        for pdf in batches:
            rows: dict[str, list] = {"warc_path": [], "rec_offset": [], "rec_bytes": [], "uri": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                parsed = urlparse(path)
                local = parsed.path if parsed.scheme else path
                data = bytes(content)
                # magic-sniffed: .warc.gz spans are COMPRESSED member offsets
                it = (
                    iter_warc_gz_spans(data)
                    if data[:2] == GZIP_MAGIC
                    else iter_warc_spans(data)
                )
                for off, nb, uri in it:
                    rows["warc_path"].append(local)
                    rows["rec_offset"].append(off)
                    rows["rec_bytes"].append(nb)
                    rows["uri"].append(uri)
            yield pd.DataFrame(rows)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{suffix}*")  # matches .warc and .warc.gz
        .option("recursiveFileLookup", "true")
        .load(warc_dir)
    )
    (
        files.select("path", "content")
        .mapInPandas(op, WARC_CDX_SCHEMA)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


# --------------------------------------------------------------------------
# .warc.gz: the Common Crawl wire format — ONE gzip member PER RECORD, so a
# compressed crawl file stays record-splittable at COMPRESSED byte offsets
# (this is precisely why CC ships member-per-record gzip + CDX side files).
# Pure stdlib (zlib/gzip), deterministic members (mtime=0).
# --------------------------------------------------------------------------

GZIP_MAGIC = b"\x1f\x8b"


def build_warc_record_gz(
    uri: str,
    payload: bytes,
    rec_type: str = "response",
    date: str = _FIXED_DATE,
    content_type: str = "text/html",
) -> bytes:
    """One WARC record as a single deterministic gzip member."""
    import gzip as _gzip

    return _gzip.compress(
        build_warc_record(uri, payload, rec_type, date, content_type), mtime=0
    )


def maybe_gunzip(buf: bytes) -> bytes:
    """Transparently decompress a (possibly multi-member) gzip buffer; pass
    plain WARC bytes through untouched. Detection is by magic bytes, not file
    name, so renamed files can't silently parse as garbage."""
    if buf[:2] == GZIP_MAGIC:
        import gzip as _gzip

        return _gzip.decompress(buf)  # handles concatenated members
    return buf


# --------------------------------------------------------------------------
# WET: the extracted-text DERIVATIVE of a crawl (Common Crawl's *.warc.wet.gz
# sidecar family). A WET file IS a WARC file whose first record is `warcinfo`
# (file-level provenance, application/warc-fields payload) followed by one
# `conversion` record per page: text/plain payload = the extracted text,
# WARC-Refers-To = the source response record's id. Because framing is plain
# WARC, the registered `warc` Data Source and the CDX/span machinery read WET
# files unchanged — this layer only fixes the record grammar.
# --------------------------------------------------------------------------

WET_WARCINFO_PAYLOAD = (
    b"software: data-exchange-routing-spark" + CRLF
    + b"format: WET File Format 1.0" + CRLF
)

WET_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), True),
        T.StructField("refers_to", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def encode_wet_files(
    df: DataFrame,
    uri_col: str = "uri",
    text_col: str = "text",
    refers_col: str | None = None,
    compression: str | None = None,
) -> DataFrame:
    """N (uri, extracted-text) rows → one WET file per Arrow batch
    (mapInPandas, no shuffle): a leading ``warcinfo`` record then one
    ``conversion`` record per row. ``refers_col`` (optional) carries the
    source response record id into ``WARC-Refers-To``.
    ``compression='gzip'`` emits member-per-record gzip (the Common Crawl
    wire layout — stays record-splittable at compressed offsets)."""
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression {compression!r}")

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import gzip as _gzip

        import pandas as pd

        comp = (lambda b: _gzip.compress(b, mtime=0)) if compression else (lambda b: b)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            refers = pdf[refers_col] if refers_col else [None] * len(pdf)
            chunks = [
                comp(
                    build_warc_record(
                        None,
                        WET_WARCINFO_PAYLOAD,
                        rec_type="warcinfo",
                        content_type="application/warc-fields",
                    )
                )
            ]
            for u, t, r in zip(pdf[uri_col], pdf[text_col], refers):
                chunks.append(
                    comp(
                        build_warc_record(
                            u,
                            t.encode("utf-8"),
                            rec_type="conversion",
                            content_type="text/plain",
                            extra_headers={"WARC-Refers-To": r} if r is not None else None,
                        )
                    )
                )
            yield pd.DataFrame(
                {"warc_file": [b"".join(chunks)], "n_records": [len(chunks)]}
            )

    return df.mapInPandas(op, WARC_FILE_SCHEMA)


def parse_wet_records(df: DataFrame, file_col: str = "warc_file") -> DataFrame:
    """1→N: each WET file row explodes into its ``conversion`` records with
    the text decoded back to a string column. Enforces the WET grammar
    loudly: first record MUST be ``warcinfo``, every following record MUST be
    ``conversion`` — a mis-typed file dead-letters, never half-parses.
    Transparently handles member-per-record gzip (magic-sniffed)."""

    def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "uri": [], "refers_to": [], "content_length": [], "text": [],
            }
            for buf in pdf[file_col]:
                recs = list(parse_warc(maybe_gunzip(bytes(buf))))
                if not recs or recs[0][0].get("WARC-Type") != "warcinfo":
                    raise ValueError("WET: file must start with a warcinfo record")
                for headers, payload in recs[1:]:
                    if headers.get("WARC-Type") != "conversion":
                        raise ValueError(
                            f"WET: unexpected record type {headers.get('WARC-Type')!r}"
                        )
                    out["uri"].append(headers.get("WARC-Target-URI"))
                    out["refers_to"].append(headers.get("WARC-Refers-To"))
                    out["content_length"].append(int(headers["Content-Length"]))
                    out["text"].append(payload.decode("utf-8"))
            yield pd.DataFrame(out)

    return df.mapInPandas(op, WET_RECORD_SCHEMA)


def iter_warc_gz_spans(buf: bytes) -> Iterator[tuple[int, int, str]]:
    """Yield (member_offset, member_nbytes, uri) per gzip member of a
    .warc.gz buffer — COMPRESSED offsets, the coordinates a real CDX stores.
    Each member must hold >= 1 well-formed record (its first URI is the
    span's); a member-per-record writer yields exactly one."""
    import zlib as _zlib

    pos = 0
    end = len(buf)
    while pos < end:
        if buf[pos : pos + 2] != GZIP_MAGIC:
            raise ValueError(f"warc.gz: not a gzip member at byte {pos}")
        d = _zlib.decompressobj(wbits=31)
        raw = d.decompress(buf[pos:]) + d.flush()
        consumed = (end - pos) - len(d.unused_data)
        recs = list(_iter_warc(raw))
        if not recs:
            raise ValueError(f"warc.gz: empty member at byte {pos}")
        yield pos, consumed, recs[0][2].get("WARC-Target-URI")
        pos += consumed
