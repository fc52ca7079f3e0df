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


def test_url_host_filter_block_and_allow(ray_session):
    from data_validator_ray.pipelines.urls import url_host_filter

    tbl = _urls([
        "https://WWW.Host1.Example.COM/p/1",
        "http://sub.host3.example.com/x",      # subdomain of blocked
        "https://host3.example.com/y?q=1",     # exact blocked
        "https://notexample.com/z",            # suffix must NOT match
        "https://nothost3.example.com/w",      # label boundary respected
        None,                                  # NULL url
        "https://deep.a.b.host3.example.com/q",
    ])
    kept = url_host_filter(tbl, ["host3.example.com"]).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 3, 4, 5]
    allowed = url_host_filter(
        tbl, ["host3.example.com"], mode="allow"
    ).to_pandas()
    assert sorted(allowed["doc_id"].tolist()) == [1, 2, 6]
    # original columns pass through untouched
    assert list(kept.columns) == ["doc_id", "url"]


def test_url_host_filter_bad_mode():
    import pytest

    from data_validator_ray.pipelines.urls import url_host_filter

    with pytest.raises(ValueError, match="mode"):
        url_host_filter(_urls(["https://a.com/x"]), ["a.com"], mode="drop")


def test_cap_per_domain(ray_session):
    from data_validator_ray.pipelines.urls import cap_per_domain

    # domain a.com: ids 0..9 → cap 3 keeps 0,1,2; b.com: 10..11 → both
    tbl = _urls(
        ["https://a.com/%d" % i for i in range(10)]
        + ["https://www.b.com/%d" % i for i in range(2)]
    )
    out = (
        cap_per_domain(tbl, 3, batch_size=4)
        .to_pandas()
        .sort_values(["domain", "doc_id"])
        .reset_index(drop=True)
    )
    assert out["domain"].tolist() == ["a.com"] * 3 + ["b.com"] * 2
    assert out["doc_id"].tolist() == [0, 1, 2, 10, 11]


def test_cap_per_domain_batch_size_invariant(ray_session):
    from data_validator_ray.pipelines.urls import cap_per_domain

    urls = ["https://d%d.com/%d" % (i % 5, i) for i in range(200)]
    tbl = _urls(urls, ids=list(range(200, 0, -1)))  # ids out of order
    a = (
        cap_per_domain(tbl, 7, batch_size=13)
        .to_pandas()
        .sort_values(["domain", "doc_id"])
        .reset_index(drop=True)
    )
    b = (
        cap_per_domain(tbl, 7, batch_size=200)
        .to_pandas()
        .sort_values(["domain", "doc_id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("domain").size() == 7).all()


def test_domain_aggregate_gate_bounds_and_nulls(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.urls import domain_aggregate_gate

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "source": ["a", "a", "b", "b", "c", None, "d"],
            "n_chars": [10.0, 20.0, 100.0, 200.0, None, 50.0, 30.0],
        }
    )
    # means: a=15, b=150, c=NULL(all-null), d=30
    out = (
        domain_aggregate_gate(df, min_mean=20.0, max_mean=100.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # only d (mean 30) is inside [20, 100]; a below, b above,
    # c NULL-mean and the NULL domain both fail the gate
    assert out["doc_id"].tolist() == [7]
    assert out["domain_mean"].tolist() == [30.0]

    blocked = (
        domain_aggregate_gate(
            df, min_mean=20.0, max_mean=100.0, keep_blocked=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert blocked["doc_id"].tolist() == [1, 2, 3, 4, 5, 6]
    # the all-NULL domain and NULL-domain rows carry NULL means
    assert np.isnan(blocked["domain_mean"].iloc[4])
    assert np.isnan(blocked["domain_mean"].iloc[5])


def test_domain_aggregate_gate_validation(ray_session):
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.pipelines.urls import domain_aggregate_gate

    df = pd.DataFrame({"source": ["a"], "n_chars": [1.0]})
    with _pytest.raises(ValueError, match="min_mean"):
        domain_aggregate_gate(df)
