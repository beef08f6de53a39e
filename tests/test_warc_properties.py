"""Property tests for the WARC parser (curator_spark/warc.py): any
well-formed archive round-trips exactly; any byte-level truncation or
corruption yields at most one error row and never loses the records
before it; gzip framing is transparent. Pure-Python — no Spark."""

from __future__ import annotations

import gzip

from hypothesis import given, settings, strategies as st

from curator_spark.warc import _charset_of, parse_warc_bytes

# bodies may contain ANYTHING — including CRLFs, gzip magic, and the
# literal "WARC/1.0" — framing must rely on Content-Length alone
body = st.binary(min_size=0, max_size=300)
wtype = st.sampled_from(["warcinfo", "request", "response", "metadata",
                         "resource", "conversion"])
uri = st.from_regex(r"http://[a-z]{1,10}\.com/[a-z0-9]{0,8}",
                    fullmatch=True)


def frame(wtype_: str, block: bytes, uri_: str, rid: int) -> bytes:
    return (b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype_}\r\n".encode()
            + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
            + f"WARC-Target-URI: {uri_}\r\n".encode()
            + f"Content-Length: {len(block)}\r\n\r\n".encode()
            + block + b"\r\n\r\n")


records = st.lists(st.tuples(wtype, body, uri), min_size=1, max_size=8)


@given(records, st.booleans())
@settings(max_examples=150, deadline=None)
def test_roundtrip_any_bodies(recs, use_gzip):
    raw = b"".join(frame(t, b, u, i) for i, (t, b, u) in enumerate(recs))
    data = (b"".join(gzip.compress(frame(t, b, u, i))
                     for i, (t, b, u) in enumerate(recs))
            if use_gzip else raw)
    out = list(parse_warc_bytes(data, archive="x"))
    assert len(out) == len(recs)
    for got, (t, b, u) in zip(out, recs):
        assert got["warc_error"] is None
        assert got["warc_type"] == t
        assert got["target_uri"] == u
        # non-response blocks pass through byte-exact; a response whose
        # body HAPPENS to start with b"HTTP/" gets its header peeled —
        # either way the payload is a suffix of the original block
        assert b.endswith(got["payload"]) or got["payload"] == b


@given(records, st.data())
@settings(max_examples=150, deadline=None)
def test_truncation_never_crashes_and_keeps_prior_records(recs, data):
    frames = [frame(t, b, u, i) for i, (t, b, u) in enumerate(recs)]
    raw = b"".join(frames)
    cut = data.draw(st.integers(min_value=0, max_value=len(raw) - 1))
    out = list(parse_warc_bytes(raw[:cut], archive="x"))
    errors = [r for r in out if r["warc_error"] is not None]
    assert len(errors) <= 1
    # every record whose full frame fits before the cut is recovered
    # intact (the scan may stop at the first damaged frame after them)
    whole = 0
    off = 0
    for f in frames:
        if off + len(f) <= cut:
            whole += 1
            off += len(f)
        else:
            break
    clean = [r for r in out if r["warc_error"] is None]
    assert len(clean) >= whole
    for got, (t, b, u) in zip(clean[:whole], recs[:whole]):
        assert got["warc_type"] == t and got["target_uri"] == u


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_arbitrary_bytes_never_crash(blob):
    out = list(parse_warc_bytes(blob, archive="x"))
    # parser always terminates with a bounded result: one error row at
    # most, and only clean rows otherwise
    assert sum(1 for r in out if r["warc_error"] is not None) <= 1


@given(st.sampled_from([
    ("text/html; charset=utf-8", "utf-8"),
    ("text/html; charset=ISO-8859-1", "ISO-8859-1"),
    ('text/html; charset="windows-1252"', "windows-1252"),
    ("text/html", "utf-8"),
    (None, "utf-8"),
    ("application/json;charset=UTF-16", "UTF-16"),
]))
def test_charset_extraction(case):
    ct, want = case
    assert _charset_of(ct) == want
