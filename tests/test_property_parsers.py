"""Property-based tests (hypothesis) for the round-3 parsers: whatever the
generator produces, the parser must recover exactly — no fixture bias."""

from hypothesis import given, settings
from hypothesis import strategies as st

from versatiles_rs_spark.multimodal.mp4 import (
    encode_minimal_mp4,
    parse_mp4,
    sample_byte_ranges,
)
from versatiles_rs_spark.sources.warc import (
    _gzip_member,
    _parse_record,
    _split_members,
    _warc_record,
)

frames_strategy = st.lists(
    st.binary(min_size=1, max_size=300), min_size=1, max_size=24
)


@settings(max_examples=40, deadline=None)
@given(frames=frames_strategy, w=st.integers(16, 4096), h=st.integers(16, 4096))
def test_mp4_roundtrip_any_frames(frames, w, h):
    blob = encode_minimal_mp4(frames, width=w, height=h)
    meta = parse_mp4(blob)
    (track,) = meta["tracks"]
    assert (track["width"], track["height"]) == (w, h)
    assert track["n_samples"] == len(frames)
    ranges = sample_byte_ranges(track)
    assert [blob[o : o + n] for o, n in ranges] == frames


@settings(max_examples=40, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=500), min_size=1, max_size=10),
    urls=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters="\r\n"),
            min_size=1,
            max_size=60,
        ),
        min_size=10,
        max_size=10,
    ),
)
def test_warc_member_framing_any_payloads(payloads, urls):
    """Concatenated gzip members split back exactly; records parse to the
    original (url, payload)."""
    recs = [
        _warc_record(u, "2024-01-01T00:00:00Z", p)
        for u, p in zip(urls, payloads)
    ]
    blob = b"".join(_gzip_member(r) for r in recs)
    out = list(_split_members(blob))
    assert len(out) == len(payloads)
    for (off, length, raw), u, p in zip(out, urls, payloads):
        parsed = _parse_record(raw)
        assert parsed is not None
        assert parsed[0] == u
        assert parsed[2] == p
        assert blob[off : off + length].startswith(b"\x1f\x8b")


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_canonical_url_total_and_idempotent(s):
    """canonical_url's SQL mirror (same rules, checked in DuckDB elsewhere)
    must be TOTAL: never raise, always idempotent — here via the python
    regex equivalent of the shared rule chain."""
    import re

    def canon(u: str) -> str:
        u2 = re.sub("#.*", "", u.strip())
        m = re.match("^([A-Za-z][A-Za-z0-9+.-]*)://", u2)
        if not m:
            return u.strip()
        scheme = m.group(1).lower()
        rest = u2[m.end() :]
        am = re.match("^([^/?]*)", rest)
        authority = am.group(1)
        pathq = rest[len(authority) :]
        host = re.sub("^[^@]*@", "", authority).lower()
        if scheme == "http":
            host = re.sub(":80$", "", host)
        elif scheme == "https":
            host = re.sub(":443$", "", host)
        path = re.match("^([^?]*)", pathq).group(1)
        path = "/" if path == "" else re.sub("//+", "/", path)
        qm = re.search(r"\?(.*)$", pathq)
        q = qm.group(1) if qm else ""
        qs = "&".join(sorted(x for x in q.split("&") if x))
        return scheme + "://" + host + path + (("?" + qs) if qs else "")

    once = canon(s)
    assert canon(once) == once
