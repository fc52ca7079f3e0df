"""Property-based RE2-parity fuzzing for curation kernels vs DuckDB.

The curation/URL oracle claims rest on Arrow and DuckDB sharing the
RE2 engine. Hypothesis generates adversarial inputs (URL-ish strings,
text with embedded PII-ish spans, mixed unicode) and the kernel output
must equal the exact oracle expression run in DuckDB — no Ray session
needed, these fuzz the batch kernels directly."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_validator_ray.pipelines.curation import PII_PATTERNS, _pii_columns
from data_validator_ray.pipelines.urls import (
    domain_of_array,
    normalize_url_array,
)

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# URL-ish fragments composed into adversarial inputs
_SCHEMES = ["http://", "https://", "HTTPS://", "ftp://", "", "//", ":"]
_HOSTS = ["www.Example.COM", "example.com", "WWW.a-b.ORG", "xn--bcher-kva.de",
          "localhost", "127.0.0.1", "www.", "w", ""]
_PATHS = ["", "/", "/a/b", "/a//b///", "/p?q=1&r=2", "/p#frag", "/p?x#y",
          "/?", "/#", "?q", "#f", "/UPPER/Case"]


@st.composite
def urlish(draw):
    return (
        draw(st.sampled_from(_SCHEMES))
        + draw(st.sampled_from(_HOSTS))
        + draw(st.sampled_from(_PATHS))
        + draw(st.text(alphabet="ab/?#._-%", max_size=6))
    )


@given(st.lists(urlish(), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_url_normalize_matches_duckdb(urls):
    arr = pa.array(urls, pa.string())
    got_norm = normalize_url_array(arr)
    got_dom = domain_of_array(got_norm)
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": urls}))
    ora = con.execute(
        "SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "  lower(url),"
        "  '^[a-z][a-z0-9+.-]*://', ''),"
        "  '^www\\.', ''),"
        "  '[?#].*$', ''),"
        "  '/+$', '') AS norm "
        "FROM u"
    ).df()["norm"]
    assert got_norm.to_pylist() == ora.tolist()
    dom_ora = con.execute(
        "SELECT regexp_replace(n, '/.*$', '') AS d FROM "
        "(SELECT unnest(?) AS n)", [got_norm.to_pylist()]
    ).df()["d"]
    assert got_dom.to_pylist() == dom_ora.tolist()


_PII_BITS = [
    "a@b.co", "x.y-z@mail.example.org", "@nope", "a@b", "a@b.c",
    "555-0100", "555-123", "1555-0100", "555-01000",
    "1.2.3.4", "10.0.0.999", "1.2.3", "256.256.256.256", "1.2.3.4.5",
    "plain words", "", " ", "unicode żółć 漢字",
]


@given(st.lists(
    st.lists(st.sampled_from(_PII_BITS), max_size=5).map(" ".join),
    min_size=1, max_size=20,
))
@settings(**_SETTINGS)
def test_pii_counts_and_redaction_match_duckdb(texts):
    arr = pa.array(texts, pa.string())
    counts, redacted = _pii_columns(arr, PII_PATTERNS)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": texts}))
    email, phone, ip = (p for _, p, _ in PII_PATTERNS)
    ora = con.execute(
        f"""
        WITH s1 AS (
          SELECT len(regexp_extract_all(x, '{email}')) AS n_email,
                 regexp_replace(x, '{email}', '<EMAIL>', 'g') AS t1 FROM t
        ), s2 AS (
          SELECT n_email, len(regexp_extract_all(t1, '{phone}')) AS n_phone,
                 regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS t2 FROM s1
        )
        SELECT n_email, n_phone,
               len(regexp_extract_all(t2, '{ip}')) AS n_ip,
               regexp_replace(t2, '{ip}', '<IP>', 'g') AS red
        FROM s2
        """
    ).df()
    assert counts["n_email"].to_pylist() == ora["n_email"].astype(int).tolist()
    assert counts["n_phone"].to_pylist() == ora["n_phone"].astype(int).tolist()
    assert counts["n_ip"].to_pylist() == ora["n_ip"].astype(int).tolist()
    assert redacted.to_pylist() == ora["red"].tolist()


@given(st.lists(
    st.text(alphabet="ab c.!?0字 ", max_size=30), min_size=1, max_size=15,
))
@settings(**_SETTINGS)
def test_gopher_counters_match_duckdb(texts):
    from data_validator_ray.pipelines.curation import (
        _gopher_columns,
        _token_frame,
    )

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ex, n = _token_frame(batch["text"])
    g = _gopher_columns(batch, ex, n, "text")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
    }))
    from data_validator_ray.pipelines.queries import _GOPHER_STATS_SQL

    ora = con.execute(_GOPHER_STATS_SQL).df()
    for c in ["n_tokens", "n_2grams", "n_unique_2grams", "top_2gram_count",
              "total_token_chars", "n_symbol_chars"]:
        assert g[c].to_pylist() == ora[c].astype(int).tolist(), c
