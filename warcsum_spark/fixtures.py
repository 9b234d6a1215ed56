"""Deterministic synthetic fixtures (FIXTURES.md; seed=42).

The reference ships no test archives (SURVEY.md §5.1), so these generators
produce branch-covering inputs from its documented formats:

* ``write_warc_archives`` — multi-member ``.warc.gz`` files, one gzip member
  per WARC record (warcsum.h:20–21), covering every filter/digest branch.
* ``gen_web_pages`` — the ``input_hint`` table
  (url, warc_ts, html, text, lang) with Zipf-skewed hosts, byte-duplicate
  html clusters, and non-canonical URL variants.
* frontier fixtures — seeds, link graph, robots, politeness budgets.

Everything is derived from a seeded PRNG; no wall clock, no external data.
"""

from __future__ import annotations

import gzip
import os
import random
from base64 import b32encode
from datetime import datetime, timedelta, timezone
from hashlib import sha1

from warcsum_spark.oracle import extract_text

EPOCH = datetime(2015, 1, 1, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# WARC archive fixtures
# ---------------------------------------------------------------------------

def _warc_member(
    warc_type: str = "response",
    uri: str = "http://example.org/",
    date: str = "2015-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    payload: bytes = b"hello",
    stored_digest: str | None = None,  # "sha1" → correct b32; "md5:junk" literal
    http_status: bytes = b"HTTP/1.1 200 OK",
) -> bytes:
    http_block = http_status + b"\r\nContent-Type: text/html\r\n\r\n"
    body = http_block + payload
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: " + content_type.encode(),
    ]
    if stored_digest == "sha1":
        b32 = b32encode(sha1(payload).digest()).decode().rstrip("=")
        lines.append(b"WARC-Payload-Digest: sha1:" + b32.encode())
    elif stored_digest is not None:
        lines.append(b"WARC-Payload-Digest: " + stored_digest.encode())
    lines.append(b"Content-Length: " + str(len(body)).encode())
    record = b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"
    return record


def _gz(member: bytes) -> bytes:
    return gzip.compress(member, compresslevel=6, mtime=0)


def write_warc_archives(outdir: str, seed: int = 42) -> list[str]:
    """Write branch-covering .warc.gz fixtures; return their paths."""
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    dup_payload = b"<html><body>shared duplicate payload</body></html>"
    big_payload = bytes(rng.getrandbits(8) for _ in range(262144))
    long_uri = "http://example.org/" + "verylongsegment/" * 250

    archives: dict[str, list[bytes]] = {
        "fixture_a.warc.gz": [
            _warc_member(uri="http://a.example/1", payload=b"payload-one", stored_digest="sha1"),
            _warc_member(uri="http://a.example/2", payload=b"payload-two"),
            _warc_member(warc_type="request", uri="http://a.example/req", payload=b"reqbody"),
            _warc_member(uri="http://a.example/3", payload=dup_payload, stored_digest="sha1"),
            _warc_member(
                uri="http://a.example/4",
                payload=b"mismatched-algo",
                stored_digest="md5:ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ",
            ),
            _warc_member(uri="http://a.example/empty", payload=b""),
        ],
        "fixture_b.warc.gz": [
            _warc_member(warc_type="metadata", uri="http://b.example/meta", payload=b"meta"),
            _warc_member(uri="http://b.example/1", payload=dup_payload),
            _warc_member(
                uri="http://b.example/plain",
                content_type="text/plain",
                payload=b"not-http",
            ),
            _warc_member(uri=long_uri, payload=b"long-url-payload"),
            _warc_member(uri="http://b.example/big", payload=big_payload),
            _warc_member(uri="http://b.example/2", payload=dup_payload, stored_digest="sha1"),
        ],
        "fixture_single.warc.gz": [
            _warc_member(uri="http://c.example/only", payload=b"single member file"),
        ],
    }
    # a pile of random members so batches span >1 Arrow chunk in tests
    bulk = []
    for i in range(200):
        payload = f"bulk page {i} ".encode() * rng.randint(1, 60)
        if rng.random() < 0.25:
            payload = dup_payload
        bulk.append(
            _warc_member(
                uri=f"http://bulk{rng.randint(0, 5)}.example/p/{i}",
                date=f"2015-01-{(i % 27) + 1:02d}T00:00:00Z",
                payload=payload,
                stored_digest="sha1" if rng.random() < 0.5 else None,
            )
        )
    archives["fixture_bulk.warc.gz"] = bulk

    paths = []
    for name, members in archives.items():
        path = os.path.join(outdir, name)
        with open(path, "wb") as f:
            for mbytes in members:
                f.write(_gz(mbytes))
        paths.append(path)
    return sorted(paths)


# ---------------------------------------------------------------------------
# web_pages table (input_hint schema)
# ---------------------------------------------------------------------------

_HOST_POOL_SIZE = 64


def _zipf_host(rng: random.Random) -> str:
    # rank ~ Zipf(s≈1): a few hot hosts + long tail, exercises salting (R7)
    r = rng.random()
    rank = int(min(_HOST_POOL_SIZE - 1, (1.0 / max(r, 1e-9)) - 1))
    return f"host{rank}.example"


def _page_html(rng: random.Random, i: int, dup_of: int | None) -> bytes:
    if dup_of is not None:
        rng2 = random.Random(10_000 + dup_of)
        return _page_html(rng2, dup_of, None)
    title = f"Page {i}"
    paras = " ".join(
        f"<p>para {j} word{rng.randint(0, 99)} &amp; more</p>" for j in range(rng.randint(1, 8))
    )
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x={i};</script><style>p{{color:red}}</style></head>"
        f"<body><!-- c{i} --><h1>{title}</h1>{paras}</body></html>"
    ).encode()


def gen_web_pages(n: int, seed: int = 42) -> list[dict]:
    """Rows of the input_hint table. ~10% exact-duplicate html across
    distinct urls, ~2% empty html, ~10% non-canonical URL variants."""
    rng = random.Random(seed)
    langs = ["en", "ar", "fr", "de"]
    rows = []
    for i in range(n):
        host = _zipf_host(rng)
        path = f"/{rng.choice(['a', 'b', 'c'])}/{i}"
        url = f"http://{host}{path}"
        roll = rng.random()
        if roll < 0.04:
            url = f"HTTP://{host.upper()}:80{path}#frag"  # non-canonical variant
        elif roll < 0.08:
            url = f"http://{host}/x/../{path.lstrip('/')}"
        if rng.random() < 0.02:
            html = b""
        elif rng.random() < 0.10 and i > 10:
            html = _page_html(rng, i, dup_of=rng.randint(0, i - 1))
        else:
            rng2 = random.Random(10_000 + i)
            html = _page_html(rng2, i, None)
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + timedelta(seconds=i * 7),
                "html": html,
                "text": extract_text(html),
                "lang": langs[hash_host(host) % len(langs)],
            }
        )
    return rows


def hash_host(host: str) -> int:
    return int.from_bytes(sha1(host.encode()).digest()[:4], "big")


def write_web_pages_parquet(path: str, n: int, seed: int = 42) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = gen_web_pages(n, seed)
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    pq.write_table(table, path)
    return path


# ---------------------------------------------------------------------------
# frontier fixtures
# ---------------------------------------------------------------------------

def gen_frontier_fixture(seed: int = 42, n_hosts: int = 8, pages_per_host: int = 12):
    """(seeds, link_graph, budgets, robots) — a small deterministic web.

    Includes one hot host (most links point at it) with a tiny budget, and
    one host with robots disallow rules, so politeness + gating + skew are
    all exercised.
    """
    rng = random.Random(seed)
    hosts = [f"site{i}.test" for i in range(n_hosts)]
    urls = [f"http://{h}/p/{j}" for h in hosts for j in range(pages_per_host)]
    hot = hosts[0]

    link_graph: dict[str, list[str]] = {}
    for u in urls:
        outs = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.5:
                target_host = hot  # skew: half of all links hit the hot host
            else:
                target_host = rng.choice(hosts)
            outs.append(f"http://{target_host}/p/{rng.randint(0, pages_per_host - 1)}")
        if rng.random() < 0.2:
            outs.append(f"HTTP://{rng.choice(hosts).upper()}:80/p/{rng.randint(0, 5)}#x")
        link_graph[u] = outs

    seeds = [(f"http://{h}/p/0", 1.0) for h in hosts[:4]]
    seeds.append((f"http://{hosts[4].upper()}/p/0", 0.9))  # non-canonical seed
    budgets = {hot: 1, hosts[1]: 3}
    robots = {hosts[2]: [(False, "/p/1"), (True, "/p/10")]}
    return seeds, link_graph, budgets, robots
