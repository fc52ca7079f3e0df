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
  pre-aggregation (combiner) before the small global groupby;
- :func:`url_host_filter` — block/allow-list gate with whole-label
  subdomain-suffix matching against a ``ray.put``-broadcast domain
  set (per-row cost independent of list size);
- :func:`cap_per_domain` — per-domain quota keeping the N smallest
  ids (identity-only shuffle with a batch-local head-N combiner).

Normalization contract (documented, oracle-replicated): lowercase the
whole URL, strip the scheme, strip a leading ``www.``, drop query
string and fragment, strip trailing slashes. Everything is RE2 — the
same engine backs Arrow and DuckDB, so the oracle comparison is
bit-exact.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
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


def host_suffix_match(host_col, blocked: "object", max_labels: int = 5):
    """Whole-label suffix membership (the pure kernel behind
    :func:`url_host_filter`): ``out[i]`` is True iff ``host_col[i]``
    equals some blocked domain or ends with ``"." + domain``. NULL
    hosts → False. ``blocked`` is a polars Series of lowercase
    domains; matching runs as ≤ ``max_labels`` vectorized
    tail-k-labels joins probed via hashed ``is_in`` — per-row cost
    independent of the list size. Hosts with more than ``max_labels``
    labels only probe their deepest ``max_labels`` suffixes (document
    the bound when matching unusually deep hostnames)."""
    import polars as pl

    d = pl.DataFrame({"host": pl.from_arrow(host_col)})
    labels = d.select(pl.col("host").str.split("."))["host"]
    # implode ONCE → one-element list Series: keeps MEMBERSHIP semantics
    # (polars ≥ 1.x deprecates bare same-dtype Series in is_in); hoisted
    # out of the loop — it copies the whole blocklist
    blocked_l = blocked.implode()
    matched = None
    for k in range(1, max_labels + 1):
        # hosts with < k labels re-produce the full host (tail
        # clamps) — a redundant re-probe, never a wrong one
        suf = labels.list.tail(k).list.join(".")
        m = suf.is_in(blocked_l)
        matched = m if matched is None else (matched | m)
    return matched.fill_null(False).to_numpy()


def url_host_filter(
    source: Any,
    domains: "list[str]",
    url_col: str = "url",
    *,
    mode: str = "block",
    max_labels: int = 5,
    batch_size: int = 65536,
) -> Dataset:
    """Domain block/allow-list filter — the crawl-hygiene gate every
    web pipeline runs before content work (spam/adult/SEO-farm host
    lists). A row MATCHES when its normalized URL's host equals a
    listed domain OR is a subdomain of one (whole-label suffix:
    ``a.b.example.com`` matches ``example.com``; ``notexample.com``
    does not). ``mode="block"`` drops matches (NULL urls kept — the
    completeness rule owns that signal); ``mode="allow"`` keeps only
    matches (NULL urls dropped). All original columns pass through.

    Scale shape: the domain set ships ONCE via ``ray.put`` and each
    batch probes it with ≤ ``max_labels`` vectorized whole-label
    suffix lookups per host (polars list tail+join → hashed ``is_in``)
    — per-row cost is independent of list size, so a million-entry
    blocklist prices the same as ten. No shuffle; pure streaming
    filter."""
    import polars as pl

    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    bl_ref = ray.put(
        pl.Series("d", sorted({d.strip().lower() for d in domains}))
    )

    def keep(batch: pa.Table) -> pa.Table:
        host = domain_of_array(normalize_url_array(batch[url_col]))
        mask = host_suffix_match(host, ray.get(bl_ref), max_labels)
        if mode == "block":
            mask = ~mask
        return batch.filter(pa.array(mask))

    return _as_dataset(source).map_batches(
        keep, batch_format="pyarrow", batch_size=batch_size
    )


def cap_per_domain(
    source: Any,
    max_per_domain: int,
    id_col: str = "doc_id",
    url_col: str = "url",
    *,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> Dataset:
    """Per-domain quota (anti-spam / anti-SEO-farm): keep at most N
    pages per domain, deterministically the N smallest ids. Returns
    the kept ``(domain, id)`` winner table — semi-join it back to
    content (``relational.hash_join(..., how="semi")`` or the bloom
    prefilter) when full rows are needed, so page content never rides
    this shuffle.

    Scale shape: identity-only exchange — each batch first reduces
    LOCALLY to its own per-domain smallest-N ids (associative: the
    global smallest N are among every batch's smallest N), so a hot
    domain ships ``#batches × N`` ids instead of its full page count;
    the bucketed groupby then finishes each domain in one vectorized
    head-N."""
    import polars as pl

    from .dedup import bucketed_groupby

    N = int(max_per_domain)
    if N < 1:
        raise ValueError("max_per_domain must be >= 1")

    def local_cap(batch: pa.Table) -> pa.Table:
        host = domain_of_array(normalize_url_array(batch[url_col]))
        d = pl.DataFrame(
            {
                "domain": pl.from_arrow(host),
                id_col: pl.from_arrow(batch[id_col]),
            }
        )
        out = (
            d.sort(id_col)
            .with_columns(pl.int_range(pl.len()).over("domain").alias("__r"))
            .filter(pl.col("__r") < N)
            .drop("__r")
        )
        return out.to_arrow().cast(
            pa.schema([("domain", pa.string()), (id_col, pa.int64())])
        )

    def bucket_cap(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col, kind="stable")
            .groupby("domain", sort=False)
            .head(N)
        )

    ds = _as_dataset(source, columns=[id_col, url_col])
    local = ds.map_batches(
        local_cap, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        local, ["domain"], bucket_cap, num_buckets=num_buckets
    )


def domain_aggregate_gate(
    source: Any,
    domain_col: str = "source",
    value_col: str = "n_chars",
    *,
    min_mean: "float | None" = None,
    max_mean: "float | None" = None,
    keep_blocked: bool = False,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Whole-domain quality gate — the spam-domain removal step of a
    web pipeline: aggregate a per-doc signal to its domain's MEAN and
    drop EVERY doc of a domain whose mean falls outside
    ``[min_mean, max_mean]`` (a domain-level decision no per-doc
    filter can make: one great page on a content farm still goes).

    One bounded shuffle: per-batch ``(domain, sum, count)`` partials
    (pyarrow ``group_by`` combiner — the exchange is
    #domains-bounded), a #domains-row global merge, then the verdict
    table broadcasts ONCE via ``ray.put`` (sorted string keys +
    float means) and the corpus filter streams. Output: all input
    columns + ``domain_mean`` (the domain's mean, rounded to 6).
    NULL ``value_col`` rows don't enter the mean (SQL AVG); a domain
    whose values are all NULL has a NULL mean and is dropped (it
    fails any bound — gate semantics, matching SQL where
    ``NULL >= t`` is not TRUE); NULL domains likewise drop.
    ``keep_blocked=True`` inverts the gate (returns the dropped docs
    for audit)."""
    import numpy as np

    from ray.data.aggregate import Sum

    if min_mean is None and max_mean is None:
        raise ValueError("set at least one of min_mean / max_mean")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "domain": pc.cast(batch[domain_col], pa.string()),
                "v": pc.cast(batch[value_col], pa.float64()),
            }
        )
        agg = t.group_by("domain").aggregate(
            [("v", "sum"), ("v", "count")]
        )
        return agg.rename_columns(["domain", "s", "n"])

    ds = _as_dataset(source)
    stats = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("domain")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    stats = stats[stats["domain"].notna()]
    doms = stats["domain"].to_numpy(dtype=object)
    n = stats["n"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        means = np.round(stats["s"].to_numpy(np.float64) / n, 6)
    ok = np.isfinite(means)
    if min_mean is not None:
        ok &= means >= min_mean
    if max_mean is not None:
        ok &= means <= max_mean
    order = np.argsort(doms)
    ref = ray.put((doms[order], means[order], ok[order]))

    def gate(batch: pa.Table) -> pa.Table:
        d_sorted, d_mean, d_ok = ray.get(ref)
        g = pc.cast(batch[domain_col], pa.string())
        valid = pc.is_valid(g).to_numpy(zero_copy_only=False)
        garr = g.to_pandas().fillna("").to_numpy(dtype=object)
        pos = np.searchsorted(d_sorted, garr)
        pos = np.minimum(pos, max(len(d_sorted) - 1, 0))
        known = valid & (len(d_sorted) > 0) & (d_sorted[pos] == garr)
        passed = np.zeros(len(garr), bool)
        passed[known] = d_ok[pos[known]]
        mean_col = np.full(len(garr), np.nan)
        mean_col[known] = d_mean[pos[known]]
        out = batch.append_column(
            "domain_mean", pa.array(mean_col, pa.float64())
        )
        keep = ~passed if keep_blocked else passed
        return out.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", batch_size=batch_size)
