"""URL curation operators for web-crawl corpora (Ray-Data-first).

Web-scale text pipelines spend a surprising amount of their dedup win
on URL canonicalization: the same page is crawled as
``https://WWW.Example.com/page?utm_source=x`` and
``http://example.com/page/`` and must collapse to one key before any
content-level dedup runs. Operators here:

- :func:`url_profile` — normalized URL + registrable-host extraction
  per row (one streaming pass, all RE2 kernels);
- :func:`url_dedup` — keep-first doc per normalized URL (one
  ``groupby.aggregate`` on the 8-byte min id — no text moves);
- :func:`domain_counts` — per-domain page counts with in-batch
  pre-aggregation (combiner) before the small global groupby.

Normalization contract (documented, oracle-replicated): lowercase the
whole URL, strip the scheme, strip a leading ``www.``, drop query
string and fragment, strip trailing slashes. Everything is RE2 — the
same engine backs Arrow and DuckDB, so the oracle comparison is
bit-exact.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _as_dataset

Dataset = ray.data.Dataset

# RE2 only (shared by Arrow kernels and the DuckDB oracle)
_SCHEME_RE = r"^[a-z][a-z0-9+.-]*://"
_WWW_RE = r"^www\."
_QUERY_FRAG_RE = r"[?#].*$"
_TRAILING_SLASH_RE = r"/+$"
_PATH_RE = r"/.*$"


def normalize_url_array(url_col) -> pa.Array:
    """Vectorized URL normalization for one batch column. NULL → NULL
    is preserved (a missing URL stays missing; completeness rules own
    that signal)."""
    u = pc.utf8_lower(url_col)
    u = pc.replace_substring_regex(u, _SCHEME_RE, "")
    u = pc.replace_substring_regex(u, _WWW_RE, "")
    u = pc.replace_substring_regex(u, _QUERY_FRAG_RE, "")
    u = pc.replace_substring_regex(u, _TRAILING_SLASH_RE, "")
    return u


def domain_of_array(norm_url_col) -> pa.Array:
    """Host part of an already-normalized URL (everything before the
    first ``/``)."""
    return pc.replace_substring_regex(norm_url_col, _PATH_RE, "")


def url_profile(
    source: Any,
    id_col: str = "doc_id",
    url_col: str = "url",
    *,
    batch_size: int = 65536,
) -> Dataset:
    """(id, norm_url, domain) per row — one streaming RE2 pass."""

    def prof(batch: pa.Table) -> pa.Table:
        norm = normalize_url_array(batch[url_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "norm_url": norm,
                "domain": domain_of_array(norm),
            }
        )

    ds = _as_dataset(source, columns=[id_col, url_col])
    return ds.map_batches(prof, batch_format="pyarrow", batch_size=batch_size)


def url_dedup(
    source: Any,
    id_col: str = "doc_id",
    url_col: str = "url",
    *,
    batch_size: int = 65536,
) -> Dataset:
    """Keep-first (min id) per NORMALIZED url. Only (norm_url, id)
    pairs enter the shuffle; the groupby ships 8-byte min-id partials,
    not page content. Collapses scheme/www/query/fragment/trailing-
    slash variants of the same page to one representative."""
    from ray.data.aggregate import Min

    prof = url_profile(
        source, id_col, url_col, batch_size=batch_size
    ).select_columns(["norm_url", id_col])
    return prof.groupby("norm_url").aggregate(Min(id_col, alias_name=id_col))


def domain_counts(
    source: Any,
    id_col: str = "doc_id",
    url_col: str = "url",
    *,
    batch_size: int = 65536,
) -> Dataset:
    """Pages per domain. Pre-aggregated INSIDE each batch (pyarrow
    ``group_by`` combiner) so the global groupby exchanges one row per
    (batch, domain) — #domains-bounded, not #rows-bounded."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        norm = normalize_url_array(batch[url_col])
        dom = domain_of_array(norm)
        t = pa.table({"domain": dom})
        agg = t.group_by("domain").aggregate([([], "count_all")])
        return agg.rename_columns(["domain", "n_pages"])

    ds = _as_dataset(source, columns=[url_col])
    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("domain").aggregate(
        Sum("n_pages", alias_name="n_pages")
    )
