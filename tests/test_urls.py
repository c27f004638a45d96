"""URL canonicalization (functions/urls.py): expected values on
adversarial inputs, and exact Ray ↔ DuckDB parity (both engines run
the same RE2 programs)."""

import duckdb
import pyarrow as pa

from log_analysis_ai_ray.functions.urls import (canonicalize_urls,
                                                oracle_canon_sql)

ADVERSARIAL = [
    "https://Example.COM/Path/To/Page",
    "HTTPS://WWW.EXAMPLE.COM/a/",
    "http://example.com:80/x",
    "https://example.com:443/x",
    "http://example.com:8080/x",          # non-default port kept
    "https://example.com/a?utm_source=tw&b=1&utm_medium=m#frag",
    "https://example.com/a?utm_source=tw",
    "https://example.com/a?gclid=x&fbclid=y&msclkid=z",
    "https://example.com/a?b=1&gclid=x&c=2",
    "https://example.com/#just-frag",
    "https://example.com///",
    "https://example.com/CaseSensitivePath?Q=UPPER",
    "example.com/no-scheme?utm_campaign=c",
    "ftp://Host.Example/File",
    "https://www.example.com",            # no path at all
    "https://wwwx.example.com/a",         # 'www' only as a full label
]

EXPECTED = {
    "https://Example.COM/Path/To/Page": "https://example.com/Path/To/Page",
    "HTTPS://WWW.EXAMPLE.COM/a/": "https://example.com/a",
    "http://example.com:80/x": "http://example.com/x",
    "https://example.com:443/x": "https://example.com/x",
    "http://example.com:8080/x": "http://example.com:8080/x",
    "https://example.com/a?utm_source=tw&b=1&utm_medium=m#frag":
        "https://example.com/a?b=1",
    "https://example.com/a?utm_source=tw": "https://example.com/a",
    "https://example.com/a?gclid=x&fbclid=y&msclkid=z":
        "https://example.com/a",
    "https://example.com/a?b=1&gclid=x&c=2": "https://example.com/a?b=1&c=2",
    "https://example.com/#just-frag": "https://example.com",
    "https://example.com///": "https://example.com",
    "https://example.com/CaseSensitivePath?Q=UPPER":
        "https://example.com/CaseSensitivePath?Q=UPPER",
    "example.com/no-scheme?utm_campaign=c": "example.com/no-scheme",
    "ftp://Host.Example/File": "ftp://host.example/File",
    "https://www.example.com": "https://example.com",
    "https://wwwx.example.com/a": "https://wwwx.example.com/a",
}


def test_expected_canonical_forms():
    got = canonicalize_urls(pa.array(ADVERSARIAL)).to_pylist()
    for url, canon in zip(ADVERSARIAL, got):
        assert canon == EXPECTED[url], (url, canon)


def test_duckdb_parity_on_adversarial_inputs():
    con = duckdb.connect()
    con.register("u", pa.table({"url": pa.array(ADVERSARIAL)}))
    sql = f"SELECT {oracle_canon_sql('url')} AS canon FROM u"
    oracle = [r[0] for r in con.execute(sql).fetchall()]
    ray_side = canonicalize_urls(pa.array(ADVERSARIAL)).to_pylist()
    assert ray_side == oracle


def test_idempotent():
    once = canonicalize_urls(pa.array(ADVERSARIAL))
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()
