"""WARC source: framing, gzip members, documents adapter."""

import gzip


def _record(rid: str, wtype: str, uri: str, body: bytes, ctype: str = "application/http; msgtype=response") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


_HTML = (
    b"<html><head><title>t</title><script>var x = 1;</script></head>"
    b"<body><p>This paragraph is long enough to survive the block filter.</p>"
    b"<p>ok</p>"
    b"<p>Another sufficiently long paragraph with &amp; one entity inside.</p>"
    b"</body></html>"
)
_HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _HTML


def _warc_bytes() -> bytes:
    return (
        _record("aaa", "warcinfo", "", b"software: test\r\n", "application/warc-fields")
        + _record("bbb", "request", "http://example.com/", b"GET / HTTP/1.1\r\n")
        + _record("ccc", "response", "http://example.com/", _HTTP)
        + _record("ddd", "response", "http://example.com/empty", b"HTTP/1.1 204 No Content\r\n\r\n")
    )


def test_read_warc_plain_and_gzip(spark, tmp_path):
    from sentiment_analysis_vector_search_spark.sources.warc import read_warc

    raw = _warc_bytes()
    (tmp_path / "a.warc").write_bytes(raw)
    # per-record gzip members, the Common Crawl layout
    members = b"".join(
        gzip.compress(_record(*args))
        for args in (
            ("eee", "response", "http://example.com/gz", _HTTP),
            ("fff", "request", "http://example.com/gz", b"GET /gz HTTP/1.1\r\n"),
        )
    )
    (tmp_path / "b.warc.gz").write_bytes(members)

    df = read_warc(spark, str(tmp_path)).cache()
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 6
    resp = rows["<urn:uuid:ccc>"]
    assert resp["warc_type"] == "response"
    assert resp["target_uri"] == "http://example.com/"
    assert resp["payload_length"] == len(_HTTP)
    assert bytes(resp["payload"]) == _HTTP
    gz = rows["<urn:uuid:eee>"]
    assert bytes(gz["payload"]) == _HTTP  # survived member-gzip round trip
    assert rows["<urn:uuid:aaa>"]["warc_type"] == "warcinfo"


def test_warc_documents_text_extraction(spark, tmp_path):
    from sentiment_analysis_vector_search_spark.sources.warc import warc_documents

    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    docs = warc_documents(spark, str(tmp_path)).collect()
    # only the non-empty response record becomes a document
    assert len(docs) == 1
    d = docs[0]
    assert d["source"] == "http://example.com/"
    lines = d["text"].split("\n")
    # long paragraphs kept, short "ok" block and script content dropped
    # (the <title> text joins the first block: title is not a block tag
    # in the shared html_to_text pipeline)
    assert lines[0].endswith("long enough to survive the block filter.")
    assert lines[1].startswith("Another sufficiently long paragraph with & one")
    assert "var x" not in d["text"] and "ok" not in lines
    assert d["n_chars"] == len(d["text"]) and d["doc_id"] >= 0


def test_warc_documents_feed_downstream_operator(spark, tmp_path):
    """The adapter's output is the canonical documents schema — a stock
    operator (language id) must run on it unchanged."""
    from sentiment_analysis_vector_search_spark.sources import DOCUMENTS_SCHEMA
    from sentiment_analysis_vector_search_spark.sources.warc import warc_documents

    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    docs = warc_documents(spark, str(tmp_path))
    assert [f.name for f in docs.schema.fields] == [
        f.name for f in DOCUMENTS_SCHEMA.fields
    ]
    from sentiment_analysis_vector_search_spark.functions import sentiment as S

    scored = docs.select("doc_id", S.pos_hits(docs["text"]).alias("p"))
    assert scored.count() == 1
