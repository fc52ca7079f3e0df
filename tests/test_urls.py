"""Unit tests for URL curation operators (pipelines/urls.py)."""

import pyarrow as pa

from data_validator_ray.pipelines.urls import (
    domain_counts,
    domain_of_array,
    normalize_url_array,
    url_dedup,
    url_profile,
)


def _urls(urls, ids=None):
    ids = ids if ids is not None else list(range(len(urls)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "url": pa.array(urls, pa.string())})


def test_normalize_url_cases():
    urls = pa.array([
        "https://WWW.Example.COM/Page?utm=x&b=1#frag",
        "http://example.com/page/",
        "example.com/page",                 # schemeless already
        "ftp://www.files.org/a/b/c///",     # multi trailing slash
        "https://example.com",              # bare host
        "https://example.com/?q=1",         # root + query
        None,
    ])
    out = normalize_url_array(urls).to_pylist()
    assert out == [
        "example.com/page",
        "example.com/page",
        "example.com/page",
        "files.org/a/b/c",
        "example.com",
        "example.com",
        None,
    ]


def test_domain_of_array():
    norm = pa.array(["example.com/a/b", "files.org", None])
    assert domain_of_array(norm).to_pylist() == [
        "example.com", "files.org", None
    ]


def test_url_profile_and_dedup(ray_session):
    tbl = _urls([
        "https://www.a.com/x",
        "http://A.com/x/",        # same page, different casing/scheme
        "https://a.com/x?utm=1",  # same page + tracking params
        "https://b.com/x",
    ])
    prof = url_profile(tbl).to_pandas().sort_values("doc_id")
    assert prof["norm_url"].tolist() == ["a.com/x"] * 3 + ["b.com/x"]
    kept = url_dedup(tbl).to_pandas().sort_values("norm_url")
    assert kept["doc_id"].tolist() == [0, 3]


def test_domain_counts_preaggregated(ray_session):
    tbl = _urls(
        ["https://a.com/%d" % i for i in range(10)]
        + ["https://www.b.com/%d" % i for i in range(5)]
    )
    out = domain_counts(tbl).to_pandas().sort_values("domain")
    assert out["domain"].tolist() == ["a.com", "b.com"]
    assert out["n_pages"].tolist() == [10, 5]
