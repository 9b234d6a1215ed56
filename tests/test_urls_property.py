"""Property tests (hypothesis) for URL canonicalization.

Two independent implementations of the same spec exist —
``warcsum_spark.functions.urls.canonicalize_one`` (the engine kernel's
per-row tail) and ``warcsum_spark.oracle.canonicalize_url`` (the
executable spec). Properties: they agree on EVERY generated input, and
canonicalization is idempotent (canon(canon(u)) == canon(u)). Runs at
the pure-Python level — no Spark session — so hypothesis can afford
thousands of examples.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from warcsum_spark.functions.urls import _host_of, canonicalize_one
from warcsum_spark.oracle import canonicalize_url as oracle_canon

scheme = st.sampled_from(["http", "https", "HTTP", "Https", "ftp", "file"])
label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_",
    min_size=1,
    max_size=8,
)
host = st.one_of(
    st.lists(label, min_size=1, max_size=4).map(".".join),
    st.lists(label, min_size=1, max_size=3).map(lambda p: ".".join(p) + "."),
    st.sampled_from(["[::1]", "[2001:DB8::1]", "[zz", ""]),
)
port = st.one_of(
    st.none(),
    st.integers(min_value=0, max_value=70000).map(str),
    st.sampled_from(["", "080", "0443", "abc"]),
)
seg = st.one_of(
    st.sampled_from([".", "..", "", "%41", "%2f", "%zz", "a%20b", "..."]),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789-._~%!$&'()*+,;=:@",
        max_size=6,
    ),
)
path = st.lists(seg, max_size=5).map(lambda s: "/" + "/".join(s) if s else "")
query = st.one_of(st.none(), st.sampled_from(["", "a=1", "a=%41&b", "q=%zz"]))
frag = st.one_of(st.none(), st.sampled_from(["", "frag", "a/b?c"]))
userinfo = st.one_of(st.none(), st.sampled_from(["user", "user:pass", "@", ""]))


@st.composite
def urlish(draw):
    s = draw(scheme)
    u = draw(userinfo)
    h = draw(host)
    p = draw(port)
    auth = (f"{u}@" if u is not None else "") + h + (f":{p}" if p is not None else "")
    rest = draw(path)
    q = draw(query)
    f = draw(frag)
    out = f"{s}://{auth}{rest}"
    if q is not None:
        out += "?" + q
    if f is not None:
        out += "#" + f
    return out


@given(urlish())
@settings(max_examples=2000, deadline=None)
def test_engine_matches_oracle_on_urlish(u):
    assert canonicalize_one(u) == oracle_canon(u), u


@given(st.text(max_size=40))
@settings(max_examples=500, deadline=None)
def test_engine_matches_oracle_on_noise(u):
    assert canonicalize_one(u) == oracle_canon(u), u


@given(urlish())
@settings(max_examples=1000, deadline=None)
def test_canonicalization_idempotent(u):
    c = canonicalize_one(u)
    if c is not None:
        assert canonicalize_one(c) == c, (u, c)


@given(urlish())
@settings(max_examples=500, deadline=None)
def test_host_of_canonical_is_stable(u):
    c = canonicalize_one(u)
    if c is not None:
        h = _host_of(c)
        assert h is not None and h == h.lower() and not h.endswith("."), (u, c, h)