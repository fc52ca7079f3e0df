"""Driver-facing query catalog.

Each entry is one implemented operator/pipeline from SURVEY.md §2,
expressed over the ``/root/testdata`` tables, returning a result whose
column NAMES match the paired DuckDB oracle SQL in ``oracle_sql()``
(the driver hash-compares values after sorting columns by name).

Everything here streams through Ray Data — validation counts come from
the fused map_batches pass, grouped results from ``groupby.aggregate``
with pre-aggregation where possible; nothing materializes the full
input on the driver.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import ValidationConfig, ValidationRule
from ..validator import RayDataValidator


def _single_rule_counts(sf_dir: str, table: str, rule: ValidationRule) -> pd.DataFrame:
    """Run one rule over one parquet table → (total_count, failed_count)."""
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": table, "rules": [rule.model_dump()]}],
    )
    v = RayDataValidator(cfg)
    summary = v.validate_table(f"{sf_dir}/{table}.parquet", table)
    r = summary.results[0]
    if r.total_count < 0:
        raise RuntimeError(f"rule failed: {r.message}")
    return pd.DataFrame(
        {"total_count": [r.total_count], "failed_count": [r.failed_count]}
    ).astype("int64")


# --------------------------------------------------------------------- #
# individual queries                                                    #
# --------------------------------------------------------------------- #

def q_completeness_documents_text(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "documents",
        ValidationRule(name="c", rule_type="completeness", column="text"),
    )


def q_uniqueness_events_event_id(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(name="u", rule_type="uniqueness", column="event_id"),
    )


def q_uniqueness_composite_events(sf_dir: str) -> pd.DataFrame:
    """Composite-key uniqueness over the (user_id, event_type) TUPLE
    (deequ hasUniqueness on column lists): distinct tuples via the
    same collision-checked double-hash shuffle, with per-column hashes
    folded row-wise (combined_hash64); rows with a NULL in any key
    column are excluded from the distinct count (single-column
    convention)."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="u2", rule_type="uniqueness", column=None,
            parameters={"columns": ["user_id", "event_type"]},
        ),
    )


def q_range_events_value(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="r", rule_type="range", column="value",
            parameters={"min_value": 0, "max_value": 100},
        ),
    )


def q_range_events_ts(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="r", rule_type="range", column="ts",
            parameters={
                "min_value": "2024-01-01 00:00:00",
                "max_value": "2024-06-30 23:59:59",
            },
        ),
    )


def q_scoped_range_events(sf_dir: str) -> pd.DataFrame:
    """WHERE-scoped rule (ScopedKernel): the range check applies only
    to 'click' events — SQL ``WHERE`` scoping for any rule type,
    net-new vs the reference (one extra vectorized mask per batch, no
    extra read or shuffle)."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="r", rule_type="range", column="value",
            parameters={
                "min_value": 0, "max_value": 90,
                "where": "event_type = 'click'",
            },
        ),
    )


def q_scoped_uniqueness_events(sf_dir: str) -> pd.DataFrame:
    """WHERE-scoped uniqueness: the exact-distinct shuffle runs over
    the in-scope subset only (predicate mask before the 16-byte
    double-hash exchange)."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="u", rule_type="uniqueness", column="user_id",
            parameters={"where": "event_type = 'click'"},
        ),
    )


def q_pattern_documents_lang(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "documents",
        ValidationRule(
            name="p", rule_type="pattern", column="lang",
            parameters={"pattern": "^[a-z]{2}$"},
        ),
    )


def q_membership_documents_lang(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "documents",
        ValidationRule(
            name="m", rule_type="membership", column="lang",
            parameters={"values": ["en", "de", "fr", "es", "zh"]},
        ),
    )


def q_custom_orders_totalprice(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="x", rule_type="custom", expression="o_totalprice > 150000",
        ),
    )


def q_custom_lineitem_expr(sf_dir: str) -> pd.DataFrame:
    """Compound DSL predicate (arithmetic + boolean + LIKE)."""
    return _single_rule_counts(
        sf_dir, "lineitem",
        ValidationRule(
            name="x", rule_type="custom",
            expression=(
                "l_extendedprice * (1 - l_discount) > 30000 "
                "AND l_returnflag != 'R' AND l_shipdate >= DATE '1995-01-01'"
            ),
        ),
    )


def q_custom_orders_recent(sf_dir: str) -> pd.DataFrame:
    """Date-arithmetic custom rule — the reference sample config's
    ``DATE_SUB(CURRENT_DATE(), INTERVAL ...)`` form
    (``/root/reference/examples/sample_config.yaml:96-99``)."""
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="x", rule_type="custom",
            expression=(
                "SELECT COUNT(*) FROM {table} WHERE "
                "o_orderdate < DATE_SUB(CURRENT_DATE(), INTERVAL 30 YEAR)"
            ),
        ),
    )


def q_custom_orders_having(sf_dir: str) -> pd.DataFrame:
    """Ungrouped aggregate rule (``SELECT ... HAVING``) — the reference
    sample config's row_count_check form, run as mergeable aggregate
    partials in the fused pass. failed = the SELECT aggregate when the
    HAVING predicate holds, else 0 (DuckDB fetchone convention)."""
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="x", rule_type="custom",
            expression=(
                "SELECT COUNT(*) - COUNT(o_custkey) FROM {table} "
                "HAVING COUNT(*) > 100"
            ),
        ),
    )


def q_referential_events_user(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="fk", rule_type="referential", column="user_id",
            parameters={
                "ref_path": f"{sf_dir}/customer.parquet",
                "ref_column": "c_custkey",
            },
        ),
    )


def q_json_validity_events_props(sf_dir: str) -> pd.DataFrame:
    """JSON well-formedness rule over events.props (polars Rust JSON
    engine per batch; NULLs never fail) — DuckDB json_valid parity."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(name="j", rule_type="json_validity", column="props"),
    )


def q_referential_composite_lineitem(sf_dir: str) -> pd.DataFrame:
    """COMPOSITE-key referential check: every lineitem's
    (l_orderkey, l_partkey) tuple must appear among the order's
    first-line rows (l_linenumber = 1). The referenced tuple set
    distils distributedly to 16-byte (h1, h2) double-hash identities —
    strings/tuples never reach the driver; the broadcast is 16 bytes
    per distinct referenced tuple."""
    import pyarrow.compute as _pc

    rule = ValidationRule(
        name="fk_composite", rule_type="referential",
        parameters={
            "columns": ["l_orderkey", "l_partkey"],
            "ref_table": "firstline",
            "ref_columns": ["l_orderkey", "l_partkey"],
        },
    )
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "lineitem", "rules": [rule.model_dump()]}],
    )
    v = RayDataValidator(cfg)
    ref = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    ).map_batches(
        lambda b: b.filter(_pc.equal(b["l_linenumber"], 1)).select(
            ["l_orderkey", "l_partkey"]
        ),
        batch_format="pyarrow",
    )
    v.register_source("firstline", ref)
    summary = v.validate_table(f"{sf_dir}/lineitem.parquet", "lineitem")
    r = summary.results[0]
    if r.total_count < 0:
        raise RuntimeError(f"rule failed: {r.message}")
    return pd.DataFrame(
        {"total_count": [r.total_count], "failed_count": [r.failed_count]}
    ).astype("int64")


def q_referential_events_nation_approx(sf_dir: str) -> pd.DataFrame:
    """Scale-tier referential check: per-block partial Bloom filters
    OR-reduced (never a driver key collect) — `approx: true`. With the
    default 2^23-bit / k=5 filter and a small dim the FP probability is
    ~1e-15, so the verdict is deterministic and oracle-exact at test
    scale; at 100 TB the driver holds 1 MiB of registers either way."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="fk_approx", rule_type="referential", column="user_id",
            parameters={
                "ref_path": f"{sf_dir}/nation.parquet",
                "ref_column": "n_nationkey",
                "approx": True,
            },
        ),
    )


def q_referential_orders_cust(sf_dir: str) -> pd.DataFrame:
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="fk", rule_type="referential", column="o_custkey",
            parameters={
                "ref_path": f"{sf_dir}/customer.parquet",
                "ref_column": "c_custkey",
            },
        ),
    )


_FILTER_RULES = [
    ValidationRule(name="t_nn", rule_type="completeness", column="text"),
    ValidationRule(
        name="n_rng", rule_type="range", column="n_chars",
        parameters={"min_value": 100, "max_value": 5000},
    ),
    ValidationRule(
        name="l_pat", rule_type="pattern", column="lang",
        parameters={"pattern": "^[a-z]{2}$"},
    ),
]


def q_filter_documents(sf_dir: str):
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "documents",
                 "rules": [r.model_dump() for r in _FILTER_RULES]}],
    )
    v = RayDataValidator(cfg)
    return v.apply_filters(f"{sf_dir}/documents.parquet", "documents")


def q_filter_lineitem_custom(sf_dir: str):
    """Filter mode driven by the custom-expression DSL + a range rule
    (reference F4 semantics: the expression is the keep-side WHERE)."""
    rules = [
        ValidationRule(
            name="rev_band", rule_type="custom",
            expression=(
                "l_extendedprice * (1 - l_discount) >= 1000 "
                "AND l_shipdate < DATE '1998-01-01'"
            ),
        ),
        ValidationRule(
            name="qty", rule_type="range", column="l_quantity",
            parameters={"min_value": 5, "max_value": 45},
        ),
    ]
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "lineitem", "rules": [r.model_dump() for r in rules]}],
    )
    v = RayDataValidator(cfg)
    out = v.apply_filters(f"{sf_dir}/lineitem.parquet", "lineitem")
    return out.select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    )


def q_violations_events_value(sf_dir: str):
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{
            "name": "events",
            "rules": [ValidationRule(
                name="value_range", rule_type="range", column="value",
                parameters={"min_value": 0, "max_value": 100},
            ).model_dump()],
        }],
    )
    v = RayDataValidator(cfg)
    return v.violations(f"{sf_dir}/events.parquet", "events")


def q_stats_lineitem_quantity(sf_dir: str) -> pd.DataFrame:
    from ..stages.stats import column_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity"]
    )
    df = column_stats(ds, columns=["l_quantity"])
    return pd.DataFrame(
        {
            "min_value": [float(df["min_value"][0])],
            "max_value": [float(df["max_value"][0])],
            "null_count": df["null_count"].astype("int64"),
            "total_count": df["total_count"].astype("int64"),
        }
    )


def q_grouped_documents_lang(sf_dir: str) -> pd.DataFrame:
    """Per-group verdict counts: groupby-aggregate with a derived column."""
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def derive(batch: pa.Table) -> pa.Table:
        short = pc.cast(pc.less(batch["n_chars"], 200), pa.int64())
        return batch.append_column("short", short)

    out = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Count(alias_name="total_count"),
            Sum("short", alias_name="short_count"),
        )
        .to_pandas()
    )
    out["total_count"] = out["total_count"].astype("int64")
    out["short_count"] = out["short_count"].astype("int64")
    return out[["lang", "total_count", "short_count"]]


def q_dedup_exact_documents(sf_dir: str) -> pd.DataFrame:
    """Exact dedup keep-first (min doc_id) per text value."""
    from ray.data.aggregate import Min

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))
    df = out.to_pandas()[["doc_id"]]
    return df.astype("int64")


def q_dedup_keep_newest_documents(sf_dir: str) -> pd.DataFrame:
    """Keep-newest exact dedup (max tiebreak per key — the
    latest-crawl-per-url shape): batch-local max combine, then one
    identity-bucketed shuffle finishes each key."""
    from .dedup import exact_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    out = exact_dedup(ds, "lang", tiebreak="doc_id", keep="last").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def q_token_count_documents(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    return ds.map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    )


def q_partition_verdicts_webpages(sf_dir: str) -> pd.DataFrame:
    """Per-PARTITION pass/fail verdicts over the webpages stream — the
    north rule's "per-partition verdicts via groupby-aggregate with
    explicit repartitioning on url-hash" shape: rows shard on a pure
    url-derived key (``utf8_length(url) % 8``; NULL urls shard -1 — a
    SQL-reproducible stand-in for the url-hash partitioner), ONE
    streaming pass emits per-(batch, shard) partial counts for three
    rules (warc_ts completeness, crawl-window range, non-empty text),
    a tiny groupby sums them, and each shard gets its own verdict at
    the flagship thresholds. Oracle = the shared webpages-derivation
    CTE grouped by the same key."""
    import pyarrow.compute as _pc

    from .webpages import webpages_dataset

    lo = np.datetime64("2013-01-01T00:00:00", "us")
    hi = np.datetime64("2026-01-01T00:00:00", "us")

    def partial(b: pa.Table) -> pa.Table:
        ulen = _pc.cast(
            _pc.fill_null(_pc.utf8_length(b["url"]), -1), pa.int64()
        ).to_numpy(zero_copy_only=False)
        shard = pa.array(np.where(ulen < 0, -1, ulen % 8), pa.int64())
        ts = b["warc_ts"]
        ts_null = _pc.is_null(ts)
        oow = _pc.and_(
            _pc.invert(ts_null),
            _pc.or_(
                _pc.less(ts, pa.scalar(lo.item(), pa.timestamp("us"))),
                _pc.greater(ts, pa.scalar(hi.item(), pa.timestamp("us"))),
            ),
        )
        empty = _pc.equal(b["text"], "")
        t = pa.table(
            {
                "shard": shard,
                "n_rows": pa.array(np.ones(len(b), np.int64)),
                "ts_null": _pc.cast(ts_null, pa.int64()),
                "ts_oow": _pc.cast(_pc.fill_null(oow, False), pa.int64()),
                "text_empty": _pc.cast(
                    _pc.fill_null(empty, False), pa.int64()
                ),
            }
        )
        return t.group_by("shard").aggregate(
            [("n_rows", "sum"), ("ts_null", "sum"), ("ts_oow", "sum"),
             ("text_empty", "sum")]
        ).rename_columns(
            ["shard", "n_rows", "ts_null", "ts_oow", "text_empty"]
        )

    agg = (
        webpages_dataset(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .sum(["n_rows", "ts_null", "ts_oow", "text_empty"])
        .to_pandas()
    )
    agg.columns = ["shard", "n_rows", "ts_null", "ts_oow", "text_empty"]
    agg = agg.astype("int64").sort_values("shard").reset_index(drop=True)
    n = agg["n_rows"].astype(float)
    agg["passed"] = (
        (1 - agg["ts_null"] / n >= 0.98)
        & (1 - agg["ts_oow"] / n >= 0.96)
        & (1 - agg["text_empty"] / n >= 0.97)
    )
    return agg


def q_flagship_webpages(sf_dir: str) -> pd.DataFrame:
    """Full CC constraint suite over the derived webpages table,
    driver-gated against a closed-form oracle: the dirt injection is
    pure doc_id-residue arithmetic and the html→text derivation
    round-trips to whitespace-collapsed source text plus the 'Doc N'
    title, so EVERY rule's (passed, failed_count, total_count,
    success_rate) is reproducible as one SQL CTE chain over
    ``documents`` (``_FLAGSHIP_ORACLE_SQL``) — including the
    uniqueness shuffle, the Bloom referential tier, the t-digest
    median verdict and the fixed-bin PSI drift verdict."""
    from .webpages import run_flagship

    _, metrics = run_flagship(sf_dir)
    return metrics.sort_values("rule_name").reset_index(drop=True)


def q_approx_uniqueness_events(sf_dir: str) -> pd.DataFrame:
    """HLL uniqueness tier, driver-gated as a SELF-AUDIT (the
    sketch_accuracy_report pattern): run BOTH tiers, report the exact
    tier's counts plus whether the HLL distinct estimate lands within
    2% of the exact distinct count (p=14 HLL is ~0.8% RSE — 2% is a
    comfortable deterministic margin for this corpus). The oracle is
    exact SQL: counts from COUNT(DISTINCT), ``hll_ok`` TRUE — an HLL
    regression past 2% breaks the hash match."""
    exact = _single_rule_counts(
        sf_dir, "events",
        ValidationRule(name="u", rule_type="uniqueness", column="event_id"),
    )
    est = _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="u", rule_type="uniqueness", column="event_id",
            parameters={"approx": True},
        ),
    )
    total = int(exact.total_count[0])
    d_exact = total - int(exact.failed_count[0])
    d_est = total - int(est.failed_count[0])
    return pd.DataFrame(
        {
            "total_count": pd.array([total], dtype="int64"),
            "failed_count": pd.array(
                [int(exact.failed_count[0])], dtype="int64"
            ),
            "hll_ok": [abs(d_est - d_exact) <= 0.02 * max(d_exact, 1)],
        }
    )


def q_ngram_jaccard_documents(sf_dir: str) -> pd.DataFrame:
    """Exact 3-gram shingle Jaccard ≥ 0.2 near-dup pairs (inverted
    index, join-free distributed pipeline — pipelines/dedup.py)."""
    from .dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(f"{sf_dir}/documents.parquet", threshold=0.2)


def q_minhash_near_dup_documents(sf_dir: str) -> pd.DataFrame:
    """MinHash(128)+LSH(32×4) candidates, exact-verified at J ≥ 0.5.
    Matches the exact-Jaccard oracle because every true near-dup pair
    in the corpus sits at J ≥ 0.9 (LSH miss prob ≈ 1e-15)."""
    from .dedup import minhash_near_dup_pairs

    return minhash_near_dup_pairs(f"{sf_dir}/documents.parquet", threshold=0.5)


def q_near_dup_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate-aware dedup: MinHash pairs (J ≥ 0.5) → union-find
    clusters → drop every non-minimum member via a broadcast drop-set.
    Oracle = recursive-CTE connected components over the exact Jaccard
    pair list."""
    from .dedup import near_dup_dedup

    out = near_dup_dedup(f"{sf_dir}/documents.parquet", threshold=0.5)
    df = out.to_pandas()[["doc_id"]].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_cc_labels_documents(sf_dir: str) -> pd.DataFrame:
    """Distributed connected components (large-star/small-star rounds)
    over the MinHash near-dup pair list → (doc_id, cluster_id) labels.
    Oracle = recursive-CTE reachability over the exact Jaccard pairs."""
    from .dedup import connected_components_distributed, minhash_near_dup_pairs

    pairs = minhash_near_dup_pairs(f"{sf_dir}/documents.parquet", threshold=0.5)
    out = connected_components_distributed(pairs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_PLANT_SHIFT = 1_000_000_000


def _planted_union(sf_dir: str, table: str, id_col: str, payload: str):
    """corpus ∪ an exact copy with ``id + 10^9`` — the planted-dup
    construction that turns an approximate pair finder into an
    exactly-oracle-checkable recall gate: every (i, i+10^9) pair is an
    EXACT duplicate, so any tier whose candidate generation provably
    cannot separate identical inputs (identical simhash chunks /
    identical LSH band signatures) must emit all of them."""
    from .dedup import _as_dataset

    ds = _as_dataset(f"{sf_dir}/{table}.parquet", columns=[id_col, payload])

    def shift(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index(id_col),
            id_col,
            pc.add(batch[id_col], _PLANT_SHIFT),
        )

    return ds.union(ds.map_batches(shift, batch_format="pyarrow"))


def _planted_pairs_only(pairs: Any):
    """Filter a pair frame to the planted (i, i+10^9) rows, sorted —
    the recall gate's output (misses show up as missing rows vs the
    closed-form oracle)."""
    df = pairs.to_pandas() if not isinstance(pairs, pd.DataFrame) else pairs
    out = df.loc[
        df.id_b - df.id_a == _PLANT_SHIFT, ["id_a", "id_b"]
    ].astype("int64")
    return out.sort_values("id_a").reset_index(drop=True)


def q_simhash_documents(sf_dir: str) -> pd.DataFrame:
    """SimHash hamming ≤ 3 pair recall, driver-gated by the planted
    construction: the corpus unions an exact copy at doc_id + 10^9, so
    every (i, i+10^9) pair has hamming 0 and the 4-chunk pigeonhole
    GUARANTEES the banding emits it — the oracle is the closed-form
    planted pair list, exact. The full (augmented) corpus still flows
    through hashing, banding and verification; raw-corpus hamming-≤3
    behavior stays pinned by tests/test_dedup.py."""
    from .dedup import simhash_pairs

    pairs = simhash_pairs(
        _planted_union(sf_dir, "documents", "doc_id", "text"),
        max_hamming=3,
    )
    return _planted_pairs_only(pairs)


def q_embedding_cosine_pairs(sf_dir: str) -> pd.DataFrame:
    """Brute-force exact cosine ≥ 0.4 near-dup pairs over embeddings."""
    from .dedup import embedding_cosine_pairs

    return embedding_cosine_pairs(f"{sf_dir}/embeddings.parquet", threshold=0.4)


def q_embedding_cosine_pairs_blocked(sf_dir: str) -> pd.DataFrame:
    """Block-partitioned exact cosine pairs — same output as the
    broadcast tier but no worker ever holds the full corpus matrix
    (each block-pair group sees ~2/n_blocks of the rows). Oracle-exact:
    every unordered pair lands in exactly one block-pair group."""
    from .dedup import embedding_cosine_pairs_blocked

    out = embedding_cosine_pairs_blocked(
        f"{sf_dir}/embeddings.parquet", threshold=0.4, n_blocks=4
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_embedding_lsh_pairs(sf_dir: str):
    """Banded random-hyperplane LSH pair recall, driver-gated by the
    planted construction (see :func:`q_simhash_documents`): identical
    vectors have identical sign bits in EVERY band, so each planted
    (i, i+10^9) copy pair is a guaranteed candidate, verifies at
    cosine 1 ≥ threshold, and must appear — the oracle is the
    closed-form planted pair list. Raw-corpus recall stays pinned by
    tests/test_dedup.py::test_embedding_lsh_banded_recall."""
    from .dedup import embedding_lsh_pairs

    pairs = embedding_lsh_pairs(
        _planted_union(sf_dir, "embeddings", "vec_id", "embedding"),
        threshold=0.4,
    )
    return _planted_pairs_only(pairs)


def q_embedding_dedup_collapse_embeddings(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup dedup (keep the min id of each cosine-≥0.4
    connected component) THROUGH the exact-collapse guard tier:
    byte-identical vectors pre-collapse to their min-id representative
    before the pair stage (the degenerate-corpus path), provably
    answer-preserving. Oracle = recursive-CTE connected components
    over the exact cosine pair list — identical whether or not the
    corpus holds byte duplicates."""
    from .dedup import embedding_near_dup_dedup

    out = embedding_near_dup_dedup(
        f"{sf_dir}/embeddings.parquet",
        threshold=0.4,
        method="exact",
        collapse_exact=True,
    ).to_pandas()[["vec_id"]].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def q_embedding_lsh_pairs_sketch(sf_dir: str):
    """Sketch-then-verify LSH tier (rows-only: approximate by design,
    like `embedding_lsh_pairs`): the band shuffle carries (id, key)
    only, candidates verify by Bloom-pruned vector lookups. Same
    seed/params as `embedding_lsh_pairs`, so the output is IDENTICAL
    to the ship-vectors tier (pinned by
    tests/test_dedup.py::test_embedding_lsh_sketch_verify_parity).
    At 100 TB scale pick bits_per_band ≥ 16 to keep band-key runs
    small without in-bucket verification; default 8 bits are fine at
    sf0.01 cardinalities. Driver-gated by the planted construction
    (see :func:`q_embedding_lsh_pairs`) — exact closed-form oracle."""
    from .dedup import embedding_lsh_pairs

    pairs = embedding_lsh_pairs(
        _planted_union(sf_dir, "embeddings", "vec_id", "embedding"),
        threshold=0.4,
        ship_vectors=False,
    )
    return _planted_pairs_only(pairs)


def q_knn_brute_embeddings(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5 (broadcast
    query matrix, per-batch partial top-k, driver merge). Integer-only
    output; ties broken (score DESC, vec_id ASC)."""
    from .dedup import load_embeddings
    from .similarity import knn_brute

    ids, M = load_embeddings(f"{sf_dir}/embeddings.parquet")
    out = knn_brute(f"{sf_dir}/embeddings.parquet", M[:5], ids[:5], k=10)
    return out[["query_id", "rank", "neighbor_id"]].astype("int64")


def q_knn_graph_embeddings(sf_dir: str) -> pd.DataFrame:
    """EXACT k-NN graph (self-join top-5 per corpus row) via
    block-pair rectangles — no full-corpus broadcast. Integer-only
    output; ties broken (score DESC, neighbor_id ASC)."""
    from .similarity import knn_graph_exact

    out = knn_graph_exact(
        f"{sf_dir}/embeddings.parquet", k=5, n_blocks=4
    ).to_pandas()
    out = out[["query_id", "rank", "neighbor_id"]].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_knn_join_embeddings(sf_dir: str) -> pd.DataFrame:
    """EXACT cross-table cosine top-5 JOIN (retrieval / hard-negative
    mining shape): queries = vec_id % 29 = 0 rows, corpus = the rest —
    asymmetric block join where the corpus side ships ONCE and only
    the (small) query side replicates; candidates merge to the global
    top-k in a query-bucketed shuffle. Integer-only output; ties
    broken (score DESC, neighbor_id ASC)."""
    from .similarity import knn_join

    left, right = _knn_join_sides(sf_dir)
    out = knn_join(left, right, k=5, n_blocks=4, num_buckets=8).to_pandas()
    out = out[["query_id", "rank", "neighbor_id"]].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _knn_join_sides(sf_dir: str):
    import pyarrow.compute as _pc

    def side(is_query: bool):
        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return ds.map_batches(
            lambda b, q=is_query: b.filter(
                _pc.equal(
                    _pc.equal(
                        _pc.subtract(
                            b["vec_id"],
                            _pc.multiply(_pc.divide(b["vec_id"], 29), 29),
                        ),
                        0,
                    ),
                    q,
                )
            ),
            batch_format="pyarrow",
        )

    return side(True), side(False)


def q_knn_join_ivf_fullprobe_embeddings(sf_dir: str) -> pd.DataFrame:
    """The streaming IVF tier of the k-NN join at FULL probe — exact
    by construction, so the whole actor-pool machinery (index build,
    LRU cluster cache, per-batch probe-sharing, in-batch final top-k)
    pins to the SAME cross-join SQL oracle as the exact tier."""
    import shutil
    import tempfile

    from .similarity import knn_join_ivf

    left, right = _knn_join_sides(sf_dir)
    work = tempfile.mkdtemp(prefix="graft_knnjoin_ivf_", dir="/tmp")
    try:
        out = knn_join_ivf(
            left, right, k=5, n_centroids=8, nprobe=8,
            concurrency=2, index_dir=f"{work}/idx",
        ).to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = out[["query_id", "rank", "neighbor_id"]].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_knn_graph_clustered_embeddings(sf_dir: str) -> pd.DataFrame:
    """Cluster-bucketed approximate k-NN graph, driver-gated by the
    planted construction: the corpus unions an exact copy of every
    vector at id+10^9; a copy lands in its original's cluster (same
    nearest centroid), self is excluded, so EVERY node's rank-1
    neighbor must be its planted partner (cosine 1) — which pins the
    k-means assignment, multi-probe candidate shipping, per-cluster
    scoring and (score DESC, id ASC) tie-break against a closed-form
    oracle. Full-graph recall vs the exact graph stays pinned by
    tests/test_similarity_text.py."""
    from .similarity import knn_graph_clustered

    out = knn_graph_clustered(
        _planted_union(sf_dir, "embeddings", "vec_id", "embedding"),
        k=5, n_clusters=8, probes=2,
    ).to_pandas()
    out = out.loc[
        out["rank"] == 1, ["query_id", "rank", "neighbor_id"]
    ].astype("int64")
    return out.sort_values("query_id").reset_index(drop=True)


def q_knn_ivf_embeddings(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-k (nprobe 8/16), driver-gated by the
    planted construction: with an exact copy of every vector at
    id+10^9, each query vector's own cluster (always the
    first-probed centroid) contains its copy, self is excluded, so
    rank-1 must be the copy at cosine 1 — an exact gate on
    assignment, probe ordering, scoring and merge. The exact sibling
    `knn_ivf_fullprobe_embeddings` pins the full top-10 output."""
    from .dedup import load_embeddings
    from .similarity import knn_ivf

    ids, M = load_embeddings(f"{sf_dir}/embeddings.parquet")
    out = knn_ivf(
        _planted_union(sf_dir, "embeddings", "vec_id", "embedding"),
        M[:5], ids[:5], k=10, nprobe=8,
    )
    out = out.loc[
        out["rank"] == 1, ["query_id", "rank", "neighbor_id"]
    ].astype("int64")
    return out.sort_values("query_id").reset_index(drop=True)


def q_knn_ivf_fullprobe_embeddings(sf_dir: str) -> pd.DataFrame:
    """IVF with nprobe = n_centroids: every cluster is probed, so the
    result is EXACT top-10 — which makes the whole index machinery
    (k-means assignment, hive cluster layout, per-cluster scoring,
    merge) oracle-checkable against the same SQL as brute force. The
    approximate tier stays `knn_ivf_embeddings` (rows-only)."""
    from .dedup import load_embeddings
    from .similarity import knn_ivf

    ids, M = load_embeddings(f"{sf_dir}/embeddings.parquet")
    out = knn_ivf(
        f"{sf_dir}/embeddings.parquet",
        M[:5],
        ids[:5],
        k=10,
        n_centroids=16,
        nprobe=16,
    )
    return out[["query_id", "rank", "neighbor_id"]].astype("int64")


def q_quality_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Integer quality counters per doc (oracle-exact formulas)."""
    from .text import quality_stats

    out = quality_stats(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_language_id_documents(sf_dir: str) -> pd.DataFrame:
    """Stopword-profile language ID with per-lang hit counts."""
    from .text import language_id

    out = language_id(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_text_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Fused single-pass document profile (quality + language ID + md5
    fingerprint); oracle = join of the three single-op oracles."""
    from .text import text_profile

    out = text_profile(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_fingerprint_documents(sf_dir: str) -> pd.DataFrame:
    """md5 fingerprint of normalized text per doc."""
    from .text import fingerprint_md5

    out = fingerprint_md5(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_winnow_fingerprints_documents(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprint counts + xor digest (rows-only: rolling
    hash has no SQL equivalent)."""
    from .text import winnow_fingerprints

    out = winnow_fingerprints(f"{sf_dir}/documents.parquet").to_pandas()
    out["fingerprint_xor"] = out["fingerprint_xor"].astype("uint64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_rowcount_events(sf_dir: str) -> pd.DataFrame:
    """Volume check (deequ hasSize analog): events row count must be
    within 50% of the orders table's count. total=1; failed iff the
    ratio falls outside the tolerance band."""
    rule = ValidationRule(
        name="volume", rule_type="rowcount", column=None,
        parameters={
            "min_rows": 1,
            "baseline": f"{sf_dir}/orders.parquet",
            "tolerance_pct": 50.0,
        },
    )
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "events", "rules": [rule.model_dump()]}],
    )
    s = RayDataValidator(cfg).validate_table(f"{sf_dir}/events.parquet", "events")
    r = s.results[0]
    return pd.DataFrame(
        {
            "rule_name": [r.rule_name],
            "passed": [r.passed],
            "row_count": [int(r.metadata["row_count"])],
            "baseline_count": [int(r.metadata["baseline_count"])],
            "total_count": [int(r.total_count)],
            "failed_count": [int(r.failed_count)],
        }
    )


def q_fd_orders_cust_priority(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency check o_custkey → o_orderpriority
    (determinant-level verdict: total = distinct customers, failed =
    customers whose orders carry ≥2 distinct priorities — 1495/1500 at
    sf0.01, a real denormalization-integrity signal). Distributed as
    per-batch distinct-pair partials + a 33-byte double-hash bucket
    shuffle (validator._fd_violations)."""
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="fd", rule_type="functional_dependency",
            column="o_custkey",
            parameters={"dependent": "o_orderpriority"},
        ),
    )


def q_late_arrival_events(sf_dir: str) -> pd.DataFrame:
    """Per-user event-time disorder profile: events in event_id
    (arrival) order, lateness vs the running max(ts) watermark —
    exact int64-microsecond lateness, one key-bucketed shuffle."""
    from .relational import late_arrival_stats

    out = late_arrival_stats(
        f"{sf_dir}/events.parquet", "user_id", "event_id", "ts"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_fd_composite_orders(sf_dir: str) -> pd.DataFrame:
    """Composite-determinant FD (o_custkey, o_orderpriority) →
    o_orderstatus: tuple identity via the combined_hash64 fold, same
    33-byte pair shuffle."""
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="fd2", rule_type="functional_dependency", column=None,
            parameters={
                "determinants": ["o_custkey", "o_orderpriority"],
                "dependent": "o_orderstatus",
            },
        ),
    )


def q_js_events_split(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence between the even/odd event_id halves
    of events.value over fixed bins 0..100 — the bounded symmetric
    drift statistic (count-vector exchange, no epsilon clipping)."""
    import pyarrow.compute as _pc

    from ..stages.drift import js_fixed_bins

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    edges = [float(x) for x in range(0, 101, 10)]
    return js_fixed_bins(side(0), side(1), "value", edges).to_pandas()


def q_freshness_events_ts(sf_dir: str) -> pd.DataFrame:
    """Freshness/liveness rule: MAX(events.ts) must be within 7 days of
    a fixed as_of (reproducible runs pin as_of). Fused-pass per-batch
    max partials — no shuffle; lag_seconds is the exact epoch
    difference (microsecond-resolution, matches SQL EXTRACT(EPOCH))."""
    rule = ValidationRule(
        name="fresh", rule_type="freshness", column="ts",
        parameters={
            "as_of": "2024-02-05 00:00:00",
            "max_age_seconds": 7 * 86400,
        },
    )
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "events", "rules": [rule.model_dump()]}],
    )
    s = RayDataValidator(cfg).validate_table(f"{sf_dir}/events.parquet", "events")
    r = s.results[0]
    return pd.DataFrame(
        {
            "passed": [bool(r.passed)],
            "lag_seconds": [float(r.metadata["lag_seconds"])],
            "total_count": [int(r.total_count)],
            "failed_count": [int(r.failed_count)],
        }
    )


def q_drift_events_value_fixed(sf_dir: str) -> pd.DataFrame:
    """Oracle-exact drift RULE (C7): fixed-bin PSI of events.value vs a
    raw lineitem.l_quantity baseline, explicit edges 0..100 — the
    kernel histograms the baseline distributedly in prepare() and the
    searchsorted bin membership / clip(1e-6)+renormalize PSI is
    bit-exact vs the SQL formulation (same math as psi_events_split,
    but through the validator's drift check)."""
    rule = ValidationRule(
        name="value_drift_fixed", rule_type="drift", column="value",
        parameters={
            "baseline": f"{sf_dir}/lineitem.parquet",
            "baseline_column": "l_quantity",
            "edges": [float(x) for x in range(0, 101, 10)],
            "metric": "psi",
        },
    )
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "events", "rules": [rule.model_dump()]}],
    )
    s = RayDataValidator(cfg).validate_table(f"{sf_dir}/events.parquet", "events")
    r = s.results[0]
    return pd.DataFrame(
        {
            "rule_name": [r.rule_name],
            "passed": [r.passed],
            "stat": [r.metadata["stat"]],
            "total_count": [int(r.total_count)],
            "failed_count": [int(r.failed_count)],
        }
    )


def q_drift_events_value(sf_dir: str) -> pd.DataFrame:
    """PSI drift of events.value vs a snapshot of the same table
    (rows-only: t-digest-derived bins have no SQL equivalent). Stat is
    ~0 by construction; deterministic because PSI partials are
    order-free integer histogram sums."""
    import tempfile
    from pathlib import Path

    from ..stages.drift import write_baseline
    from ..validator import RayDataValidator
    from ..config import ValidationConfig

    from ..stages.drift import read_baseline

    tag = Path(sf_dir).name
    snap = Path(tempfile.gettempdir()) / f"graft_drift_baseline_{tag}.parquet"
    try:
        if "value" not in read_baseline(snap):
            raise KeyError("value")
    except Exception:  # missing or stale-format cache → rebuild
        snap.unlink(missing_ok=True)
        write_baseline(f"{sf_dir}/events.parquet", ["value"], snap)
    rule = ValidationRule(
        name="value_drift", rule_type="drift", column="value",
        parameters={"baseline": str(snap), "metric": "psi"},
    )
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "events", "rules": [rule.model_dump()]}],
    )
    s = RayDataValidator(cfg).validate_table(f"{sf_dir}/events.parquet", "events")
    r = s.results[0]
    return pd.DataFrame(
        {
            "rule_name": [r.rule_name],
            "passed": [r.passed],
            "stat": [r.metadata["stat"]],
            "total_count": [r.total_count],
            "failed_count": [r.failed_count],
        }
    )


_RUNNER_PARTS = 8
_RUNNER_RULES = [
    ValidationRule(name="text_complete", rule_type="completeness", column="text"),
    ValidationRule(
        name="chars_range", rule_type="range", column="n_chars",
        parameters={"min_value": 100, "max_value": 5000}, threshold=0.5,
    ),
    ValidationRule(
        name="lang_pattern", rule_type="pattern", column="lang",
        parameters={"pattern": "^[a-z]{2}$"}, threshold=0.9,
    ),
]


def _partitioned_documents(sf_dir: str, n_parts: int = _RUNNER_PARTS) -> str:
    """documents.parquet split into ``n_parts`` files by contiguous
    doc_id range (partition p = doc_id // ceil(n/n_parts)) — the
    deterministic multi-file layout the resumable runner partitions on.
    Cached under /tmp per scale."""
    import math
    import tempfile
    from pathlib import Path

    import pyarrow.parquet as pq

    tag = Path(sf_dir).name
    out = Path(tempfile.gettempdir()) / f"graft_runner_parts_{tag}"
    if out.is_dir() and len(list(out.glob("part-*.parquet"))) == n_parts:
        return str(out)
    t = pq.read_table(f"{sf_dir}/documents.parquet").sort_by("doc_id")
    rpf = math.ceil(t.num_rows / n_parts)
    tmp = out.with_name(out.name + ".tmp")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    for i in range(n_parts):
        pq.write_table(t.slice(i * rpf, rpf), tmp / f"part-{i:04d}.parquet")
    shutil.rmtree(out, ignore_errors=True)
    tmp.rename(out)
    return str(out)


def q_runner_documents_resume(sf_dir: str) -> pd.DataFrame:
    """Resumable per-partition runner with a kill/resume proof: run the
    first 2 chunks (4 of 8 partitions), 'die', then a FRESH runner over
    the same checkpoint dir finishes the rest — it must skip exactly the
    4 committed partitions. Output = per-partition metric rows (lineage
    manifest), oracle-checked against per-range SQL aggregates."""
    import shutil
    import tempfile
    from pathlib import Path

    from .runner import ValidationRunner

    parts_dir = _partitioned_documents(sf_dir)
    ckpt = Path(tempfile.gettempdir()) / f"graft_runner_ckpt_{Path(sf_dir).name}"
    shutil.rmtree(ckpt, ignore_errors=True)

    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "documents",
                 "rules": [r.model_dump() for r in _RUNNER_RULES]}],
    )
    # phase 1: two chunks of 2 partitions, then "killed"
    r1 = ValidationRunner(cfg, ckpt, chunk_partitions=2, write_violations=False)
    r1.run(parts_dir, "documents", max_chunks=2)
    # phase 2: fresh runner, same checkpoints → must resume, not redo
    r2 = ValidationRunner(cfg, ckpt, chunk_partitions=2, write_violations=False)
    report = r2.run(parts_dir, "documents")
    if report["partitions_skipped_on_resume"] != 4:
        raise RuntimeError(
            f"resume skipped {report['partitions_skipped_on_resume']} != 4"
        )
    if report["partitions_total"] != _RUNNER_PARTS:
        raise RuntimeError("incomplete partition coverage after resume")
    df = r2.manifest.read_all().to_pandas()
    out = df[["partition_id", "rule_name", "total_count", "failed_count"]].copy()
    out["partition_id"] = out["partition_id"].astype("int64")
    return out.sort_values(["partition_id", "rule_name"]).reset_index(drop=True)


def q_transform_runner_documents(sf_dir: str) -> pd.DataFrame:
    """Resumable TRANSFORM runner over the 8-file split: run the
    Gopher gate for 3 partitions, kill, resume with a fresh runner —
    per-partition (rows_in, rows_out) must match the window-ranked
    oracle regardless of the kill point."""
    import shutil
    import tempfile
    from pathlib import Path

    from .curation import gopher_filter
    from .runner import TransformRunner

    parts_dir = _partitioned_documents(sf_dir)
    work = Path(tempfile.mkdtemp(prefix="graft_transform_runner_"))
    try:
        ckpt, out = work / "ckpt", work / "out"
        first = TransformRunner(ckpt)
        rep = first.run(parts_dir, gopher_filter, out, op_name="gopher",
                        max_partitions=3)
        if rep["partitions_processed"] != 3:
            raise RuntimeError("kill stand-in did not stop after 3")
        resumed = TransformRunner(ckpt)
        rep2 = resumed.run(parts_dir, gopher_filter, out, op_name="gopher")
        if rep2["partitions_skipped"] != 3:
            raise RuntimeError("resume did not skip the committed 3")
        m = rep2["metrics"].to_pandas()
        out_df = m[["partition_id", "rows_in", "rows_out"]].astype("int64")
        return out_df.sort_values("partition_id").reset_index(drop=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_windowed_events(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per event_type: count + value stats.
    Pre-aggregated inside map_batches; the shuffle moves only (window,
    type) partial rows."""
    from .relational import windowed_aggregate

    out = windowed_aggregate(
        f"{sf_dir}/events.parquet", "ts", "value",
        key_cols=["event_type"], window_seconds=3600,
    ).to_pandas()
    out["value_sum"] = out["value_sum"].round(6)
    out["value_avg"] = out["value_avg"].round(6)
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def q_approx_distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Distinct users per event type, driver-gated as a SELF-AUDIT:
    the per-group HLL tier (mergeable register blobs, ~1.6% RSE at
    p=12) runs alongside the exact distributed distinct (ONE
    (group, value)-pair shuffle), and the output reports the exact
    counts plus whether every group's HLL estimate lands within 5% —
    the oracle is plain COUNT(DISTINCT) SQL with ``hll_ok`` TRUE, so
    an HLL regression breaks the hash match."""
    import pyarrow.compute as _pc

    from .relational import grouped_approx_distinct

    est = grouped_approx_distinct(
        f"{sf_dir}/events.parquet", "event_type", "user_id"
    ).to_pandas().set_index("event_type")["approx_distinct"]

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def drop_null_users(b: pa.Table) -> pa.Table:
        return b.filter(_pc.is_valid(b["user_id"]))

    exact = (
        ds.map_batches(drop_null_users, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .count()  # distinct (group, user) pairs
        .groupby("event_type")
        .count()  # distinct users per group
        .to_pandas()
        .rename(columns={"count()": "n_distinct"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exact["n_distinct"] = exact["n_distinct"].astype("int64")
    rel = (
        (est.reindex(exact["event_type"]).to_numpy()
         - exact["n_distinct"].to_numpy())
        / np.maximum(exact["n_distinct"].to_numpy(), 1)
    )
    exact["hll_ok"] = bool(np.abs(rel).max() <= 0.05)
    return exact


def q_compression_stats_documents(sf_dir: str) -> pd.DataFrame:
    """zlib compression counters per doc (rows-only: SQL has no zlib;
    determinism + formula pinned by unit tests)."""
    from .text import compression_stats

    out = compression_stats(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_group_sample_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-source 5-sample (hash-ordered, RNG-free)."""
    from .curation import group_sample

    out = group_sample(
        f"{sf_dir}/documents.parquet", "source", "doc_id", k=5
    ).to_pandas()
    return (
        out.sort_values(["source", "doc_id"]).reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )


def q_grouped_quantiles_events(sf_dir: str) -> pd.DataFrame:
    """p50/p95/p99 of event value per event type, driver-gated as a
    SELF-AUDIT: the t-digest tier (mergeable blobs, canonical merge
    order) runs alongside EXACT per-group quantiles (numpy linear
    interpolation per group — quantile_cont semantics; the documented
    partitioning assumption is each group's values fit one worker,
    which a self-audit gate can afford), and the output reports the
    exact values plus whether every t-digest estimate lands within 2%
    of the group's value span. Oracle = plain ``quantile_cont`` SQL
    with ``td_ok`` TRUE."""
    from .relational import grouped_quantiles

    qs = (0.5, 0.95, 0.99)
    est = grouped_quantiles(
        f"{sf_dir}/events.parquet", "event_type", "value", quantiles=qs
    ).to_pandas().sort_values("event_type").reset_index(drop=True)

    def exact_q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].dropna().to_numpy(np.float64)
        row = {"event_type": [g["event_type"].iloc[0]]}
        for q in qs:
            row[f"p{int(q * 100)}"] = [
                round(float(np.quantile(v, q)), 6) if len(v) else np.nan
            ]
        return pd.DataFrame(row)

    exact = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .groupby("event_type")
        .map_groups(exact_q, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    cols = [f"p{int(q * 100)}" for q in qs]
    span = np.maximum(
        exact[cols].to_numpy().max(axis=1)
        - exact[cols].to_numpy().min(axis=1),
        1e-9,
    )
    err = np.abs(est[cols].to_numpy() - exact[cols].to_numpy())
    exact["td_ok"] = bool((err <= 0.02 * span[:, None] + 1e-6).all())
    return exact


def q_hopping_window_events(sf_dir: str) -> pd.DataFrame:
    """1h windows hopping every 15min over events (each event counts
    in 4 overlapping windows); oracle = unnest over the 4 covering
    window starts."""
    from .relational import hopping_window_aggregate

    out = hopping_window_aggregate(
        f"{sf_dir}/events.parquet", "ts", "value",
        window_seconds=3600, hop_seconds=900,
    ).to_pandas()
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["value_sum"] = out["value_sum"].round(6)
    return out.sort_values("window_start").reset_index(drop=True)


def q_hopping_window_user_events(sf_dir: str) -> pd.DataFrame:
    """Per-key hopping windows: 1h/15min windows PER USER (each event
    counts in 4 overlapping windows of its user); oracle = unnest over
    the covering window starts, grouped by (user_id, window_start)."""
    from .relational import hopping_window_aggregate

    out = hopping_window_aggregate(
        f"{sf_dir}/events.parquet", "ts", "value",
        window_seconds=3600, hop_seconds=900, key_cols=["user_id"],
    ).to_pandas()
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["value_sum"] = out["value_sum"].round(6)
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def q_anti_join_events_customer(sf_dir: str) -> pd.DataFrame:
    """Blocklist filter: events whose user_id has NO customer row
    (broadcast anti-semi-join — the big side never shuffles)."""
    from .relational import anti_join_broadcast

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    # blocklist: every third customer id (the full customer table
    # covers all event users at this sf — the anti-join would be empty)
    import pyarrow.compute as _pc

    block = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: b.filter(
            _pc.equal(
                _pc.subtract(
                    b["c_custkey"],
                    _pc.multiply(_pc.divide(b["c_custkey"], 3), 3),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    out = anti_join_broadcast(
        ev, block, key_col="user_id", block_key="c_custkey"
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_anti_join_orders_lineitem(sf_dir: str) -> pd.DataFrame:
    """Large-×-large SHUFFLE anti-join (NOT EXISTS with a right side
    too big to broadcast): orders having no high-quantity lineitem."""
    import pyarrow.compute as _pc

    from .relational import hash_join

    big = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda b: b.filter(
            _pc.fill_null(_pc.greater(b["l_quantity"], 45.0), False)
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    out = hash_join(
        f"{sf_dir}/orders.parquet",
        big,
        left_key="o_orderkey",
        right_key="l_orderkey",
        left_cols=["o_custkey", "o_totalprice"],
        right_cols=["l_orderkey"],
        how="anti",
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_semi_join_events_bigspenders(sf_dir: str) -> pd.DataFrame:
    """EXISTS filter: events whose user has a customer row with
    c_acctbal > 9000 (broadcast semi-join — the corpus never
    shuffles, set-side duplicates never duplicate rows)."""
    import pyarrow.compute as _pc

    from .relational import semi_join_broadcast

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    rich = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda b: b.filter(
            _pc.fill_null(_pc.greater(b["c_acctbal"], 9000.0), False)
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    out = semi_join_broadcast(
        ev, rich, key_col="user_id", set_key="c_custkey"
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_string_agg_events_by_user(sf_dir: str) -> pd.DataFrame:
    """Per-user ordered id concatenation — SQL string_agg(event_id,
    ',' ORDER BY ts, event_id): one binary_join kernel per bucket, no
    per-group Python."""
    from .relational import grouped_string_agg

    out = grouped_string_agg(
        f"{sf_dir}/events.parquet",
        ["user_id"],
        "event_id",
        order_cols=["ts", "event_id"],
        sep=",",
        out_col="ids",
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_spine_fill_events(sf_dir: str) -> pd.DataFrame:
    """Daily calendar spine per event_type with gap filling: missing
    (day, type) cells appear with n_events=0 / NULL aggregates — the
    generate_series LEFT JOIN convention."""
    from .relational import spine_fill

    out = spine_fill(
        f"{sf_dir}/events.parquet", "ts", "value",
        key_cols=["event_type"], unit="day",
    )
    return out.reset_index(drop=True)


def q_count_distinct_events_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT user_id) per event_type: per-batch
    distinct-pair combiner, one bucketed shuffle, C-level counts."""
    from .relational import grouped_count_distinct

    out = grouped_count_distinct(
        f"{sf_dir}/events.parquet", "event_type", "user_id",
        out_col="n_users",
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_distinct_rows_events(sf_dir: str) -> pd.DataFrame:
    """SELECT DISTINCT user_id, event_type (distinct-bounded combiner
    before the shuffle)."""
    from .relational import distinct_rows

    out = distinct_rows(
        f"{sf_dir}/events.parquet", ["user_id", "event_type"]
    ).to_pandas()
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


def q_pivot_counts_events(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type breakdown as fixed pivot columns (one-hot
    sums per batch, plain Sum merge — no post-shuffle pivot)."""
    from .relational import pivot_counts

    cats = ["click", "error", "purchase", "signup", "view"]
    out = pivot_counts(
        f"{sf_dir}/events.parquet", "user_id", "event_type", cats
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_hash_join_lineitem_orders(sf_dir: str) -> pd.DataFrame:
    """Large-×-large shuffle hash join (lineitem ⋈ orders on
    orderkey): both sides bucket on the key hash, one vectorized
    merge per bucket."""
    from .relational import hash_join

    out = hash_join(
        f"{sf_dir}/lineitem.parquet",
        f"{sf_dir}/orders.parquet",
        left_key="l_orderkey",
        right_key="o_orderkey",
        left_cols=["l_linenumber", "l_quantity"],
        right_cols=["o_custkey", "o_totalprice"],
    ).to_pandas()
    return out.sort_values(
        ["l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)


def q_hash_join_salted_events(sf_dir: str) -> pd.DataFrame:
    """Skew-aware salted shuffle join (events ⋈ customer on user_id):
    hot keys spread over 4 salt sub-buckets, right hot rows replicated
    per salt — output identical to the unsalted join (oracle = plain
    SQL join)."""
    from .relational import hash_join

    out = hash_join(
        f"{sf_dir}/events.parquet",
        f"{sf_dir}/customer.parquet",
        left_key="user_id",
        right_key="c_custkey",
        left_cols=["event_id"],
        right_cols=["c_acctbal"],
        num_buckets=16,
        salt=4,
        hot_keys=list(range(1, 51)),
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_hash_join_left_customer_events(sf_dir: str) -> pd.DataFrame:
    """LEFT outer shuffle join: every customer row survives; the 1350
    customers with no events carry NULL event_id."""
    from .relational import hash_join

    out = hash_join(
        f"{sf_dir}/customer.parquet",
        f"{sf_dir}/events.parquet",
        left_key="c_custkey",
        right_key="user_id",
        left_cols=["c_name"],
        right_cols=["event_id"],
        how="left",
    ).to_pandas()
    return out.sort_values(["c_custkey", "event_id"]).reset_index(drop=True)


def q_hash_join_full_customer_events(sf_dir: str) -> pd.DataFrame:
    """FULL outer shuffle join over filtered subsets so BOTH sides have
    unmatched rows; the key column carries COALESCE(left, right)."""
    from .relational import hash_join

    def keep_mod(col: str, m: int):
        def fn(batch: "pa.Table") -> "pa.Table":
            import pyarrow.compute as _pc

            return batch.filter(
                _pc.equal(_pc.bit_wise_and(batch[col], m - 1), 0)
                if (m & (m - 1)) == 0
                else _pc.equal(
                    _pc.subtract(
                        batch[col],
                        _pc.multiply(_pc.divide(batch[col], m), m),
                    ),
                    0,
                )
            )

        return fn

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(keep_mod("c_custkey", 3), batch_format="pyarrow")
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    ).map_batches(keep_mod("event_id", 5), batch_format="pyarrow")
    out = hash_join(
        cust, ev,
        left_key="c_custkey",
        right_key="user_id",
        left_cols=["c_acctbal"],
        right_cols=["event_id", "value"],
        how="full",
    ).to_pandas()
    return out.sort_values(["c_custkey", "event_id"]).reset_index(drop=True)


def q_broadcast_join_events(sf_dir: str) -> pd.DataFrame:
    """Dimension enrichment: events joined to the (small) customer
    table via one broadcast + per-batch searchsorted probe — no
    shuffle of the event stream."""
    from .relational import broadcast_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    out = broadcast_join(
        ev, f"{sf_dir}/customer.parquet",
        on="user_id", right_on="c_custkey",
        right_cols=["c_name", "c_nationkey"], how="inner",
    ).to_pandas()
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_sessionize_events(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands sessionization of events per user (30-min
    gap); oracle = the lag/cumsum window formulation."""
    from .relational import sessionize

    out = sessionize(
        f"{sf_dir}/events.parquet", "user_id", "ts", "event_id",
        gap_seconds=1800,
    ).to_pandas()
    out = out.sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    out["session_start"] = out["session_start"].astype("datetime64[us]")
    out["session_end"] = out["session_end"].astype("datetime64[us]")
    return out


def q_asof_events_orders(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event pairs with the user's latest order at or
    before the event time (right side pre-deduplicated to one order per
    (customer, date) for deterministic ties). Oracle = DuckDB ASOF
    JOIN."""
    import pyarrow.parquet as pq

    from .relational import asof_join

    # deterministic right side: max orderkey per (custkey, orderdate)
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    ).to_pandas()
    idx = orders.groupby(["o_custkey", "o_orderdate"])["o_orderkey"].idxmax()
    dedup = orders.loc[idx].reset_index(drop=True)

    out = asof_join(
        f"{sf_dir}/events.parquet",
        dedup,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
    ).to_pandas()
    out = out[["event_id", "user_id", "ts", "o_orderkey", "o_totalprice"]]
    out["event_id"] = out["event_id"].astype("int64")
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_interval_join_events_orders(sf_dir: str) -> pd.DataFrame:
    """Shuffle-tier interval join (both sides large, neither broadcast):
    events.value against intervals [o_totalprice/1000, +5) derived from
    every 20th order — binned co-location, each qualifying pair meets
    in exactly one bin."""
    from .relational import interval_join_shuffle

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )

    def mk_iv(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = keys % 20 == 0
        b = b.filter(pa.array(keep))
        lo = pc.divide(pc.cast(b["o_totalprice"], pa.float64()), 1000.0)
        return pa.table(
            {
                "iv_key": b["o_orderkey"],
                "lo": lo,
                "hi": pc.add(lo, 5.0),
            }
        )

    iv = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(mk_iv, batch_format="pyarrow")
    out = interval_join_shuffle(
        ev, iv, value_col="value", left_cols=["event_id"],
        right_cols=["iv_key"], bin_width=5.0, num_buckets=32,
    ).to_pandas()
    out = out[["event_id", "iv_key", "lo", "hi"]]
    out["lo"] = out["lo"].round(6)
    out["hi"] = out["hi"].round(6)
    return out.sort_values(["event_id", "iv_key"]).reset_index(drop=True)


def q_range_join_events_bands(sf_dir: str) -> pd.DataFrame:
    """Broadcast range join: each event's value lands in a [lo, hi)
    band from a small interval table (sorted non-overlapping →
    searchsorted fast path). Negative values match no band and drop."""
    from .relational import range_join_broadcast

    bands = pd.DataFrame(
        {
            "lo": [0.0, 10.0, 25.0, 50.0, 100.0],
            "hi": [10.0, 25.0, 50.0, 100.0, 1e9],
            "band": ["xs", "s", "m", "l", "xl"],
        }
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    out = range_join_broadcast(ds, bands, value_col="value").to_pandas()
    out = out[["event_id", "band"]]
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def _media_path(sf_dir: str) -> str:
    """Deterministic synthetic media table sized to the documents table
    (cached under /tmp per scale)."""
    import tempfile
    from pathlib import Path

    import pyarrow.dataset as pads

    from .multimodal import write_media

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    out = Path(tempfile.gettempdir()) / f"graft_media_{n}"
    return write_media(out, n)


def q_phash_images_media(sf_dir: str) -> pd.DataFrame:
    """Per-image 64-bit perceptual hash (grayscale→32×32→DCT→median
    sign bits) over the synthetic media table — rows-only (no SQL DCT);
    determinism + planted-duplicate recall pinned in
    tests/test_multimodal.py."""
    from .multimodal import phash_images

    out = phash_images(_media_path(sf_dir)).to_pandas()
    out["phash"] = out["phash"].astype("uint64").astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)


def q_phash_near_dup_media(sf_dir: str) -> pd.DataFrame:
    """Image near-duplicate pairs (pHash + shared 4×16-bit banded
    Hamming search, exact recall ≤3 by pigeonhole) over a 4× media
    table so planted byte-identical copies (ids i, i+768) exist —
    rows-only; pinned by the planted-pair tests."""
    import tempfile
    from pathlib import Path

    import pyarrow.dataset as pads

    from .multimodal import phash_near_dup, write_media

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows() * 4
    path = write_media(Path(tempfile.gettempdir()) / f"graft_media_{n}", n)
    out = phash_near_dup(path)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_remove_dup_spans_documents(sf_dir: str) -> pd.DataFrame:
    """Substring-level dedup TRANSFORM (Lee et al. 2021): drop every
    token covered by a corpus-duplicated 8-gram window and rebuild the
    documents — the remedy to dup_span_stats' diagnosis. Shared
    rolling-hash discovery + one knuth-bucketed reassembly pass."""
    from .curation import remove_duplicated_spans

    out = remove_duplicated_spans(
        f"{sf_dir}/documents.parquet", n=8, min_count=2
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_multimodal_image_decode(sf_dir: str) -> pd.DataFrame:
    """Actor-pool image decode over binary payloads (deterministic fake
    codec — pipelines/multimodal.py); metadata formulas are replicated
    exactly by the range()-based oracle."""
    from .multimodal import decode_images

    out = decode_images(_media_path(sf_dir)).to_pandas()
    out = out[["media_id", "width", "height", "channels", "n_bytes"]]
    return out.sort_values("media_id").reset_index(drop=True).astype("int64")


def q_multimodal_audio_decode(sf_dir: str) -> pd.DataFrame:
    from .multimodal import decode_audio

    out = decode_audio(_media_path(sf_dir)).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True).astype("int64")


def q_multimodal_frame_sample(sf_dir: str) -> pd.DataFrame:
    """Every-2nd-frame sampling of video payloads; the (media_id,
    frame_idx) rows are oracle-exact via the nf = 4 + id%8 payload
    formula (frame BYTES stay pinned by unit tests — SQL has no
    payload equivalent)."""
    from .multimodal import sample_video_frames

    out = sample_video_frames(_media_path(sf_dir)).to_pandas()
    out = out[["media_id", "frame_idx"]].astype("int64")
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


# --------------------------------------------------------------------- #
# curation tier (pipelines/curation.py)                                 #
# --------------------------------------------------------------------- #

def q_gopher_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher-rule integer counters per doc (repetition + symbol +
    token-length inputs); every counter oracle-exact."""
    from .curation import gopher_stats

    out = gopher_stats(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_gopher_filter_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition gate → kept doc ids (pure integer-threshold
    comparisons, bit-exact vs the SQL WHERE clause)."""
    from .curation import gopher_filter

    out = gopher_filter(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def q_pii_redact_documents(sf_dir: str) -> pd.DataFrame:
    """PII scrub over a derived text with injected email/phone/IP spans
    (deterministic doc_id-mod injection, replicated in the oracle's
    CASE expression); counts and redacted text are RE2-exact on both
    sides."""
    from .curation import pii_redact

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idstr = ids.astype("U")
        suffix = np.select(
            [ids % 7 == 0, ids % 11 == 0, ids % 13 == 0],
            [
                np.char.add(
                    np.char.add(" contact user", idstr),
                    "@example.com for info",
                ),
                np.full(len(ids), " call 555-0142 or 555-9999 today"),
                np.full(len(ids), " origin 10.0.0.1 and 192.168.1.77"),
            ],
            default="",
        )
        text = pc.fill_null(batch["text"], "").to_pandas().to_numpy(str)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(np.char.add(text, suffix), pa.string()),
            }
        )

    out = pii_redact(
        ds.map_batches(inject, batch_format="pyarrow")
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _bench_slice(sf_dir: str) -> List[str]:
    """The benchmark texts (doc_id % 97 == 0) via a vectorized
    map_batches mask — never a per-row ``ds.filter(lambda)``."""

    def mask(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 97 == 0))

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(mask, batch_format="pyarrow")
        .to_pandas()["text"]
        .tolist()
    )


def q_decontaminate_documents(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: flag docs sharing any 5-gram with the
    benchmark slice (doc_id % 97 == 0 — a stand-in for a held-out eval
    set). Broadcast-set membership on the Ray side, shingle join in the
    oracle."""
    from .curation import decontaminate

    bench = _bench_slice(sf_dir)
    out = decontaminate(
        f"{sf_dir}/documents.parquet", bench, ngram=5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_decontaminate_bloom_documents(sf_dir: str) -> pd.DataFrame:
    """Scale-tier decontamination: the benchmark's shingle hashes fold
    into OR-reduced partial Bloom filters (workers/driver only ever
    hold 1 MiB of registers). Oracle = the exact-tier SQL: at test
    cardinalities the FP probability is ~1e-15, so the bloom verdicts
    are hash-exact (pinned deterministic either way)."""
    from .curation import decontaminate_bloom

    def mask(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 97 == 0))

    bench = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(mask, batch_format="pyarrow")
    out = decontaminate_bloom(
        f"{sf_dir}/documents.parquet", bench, ngram=5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_domain_sample_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic domain-mixture downsampling: per-source keep rates
    ((idx % 4) + 1) × 200 ‰ via the Knuth multiplicative hash on
    doc_id — no RNG, bit-exact vs the SQL modular arithmetic."""
    from .curation import domain_sample

    rates = {f"src{i}": ((i % 4) + 1) * 200 for i in range(256)}
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    out = domain_sample(ds, rates).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_sample_n_events(sf_dir: str) -> pd.DataFrame:
    """Deterministic uniform 200-row sample: Knuth-hash rank order,
    partial top-k per batch — RNG-free, partitioning-independent,
    bit-exact vs the SQL ORDER BY/LIMIT."""
    from .curation import sample_n

    out = sample_n(
        f"{sf_dir}/events.parquet",
        "event_id",
        200,
        columns=["event_id", "user_id", "value"],
    )
    return out.sort_values("event_id").reset_index(drop=True)


def q_sample_weighted_events(sf_dir: str) -> pd.DataFrame:
    """Deterministic PPS sample (sequential Poisson): 150 events
    ranked by u/weight with the Knuth-hash uniform; NULL/non-positive
    weights never sampled; bit-exact vs the SQL score expression."""
    from .curation import sample_weighted

    out = sample_weighted(
        f"{sf_dir}/events.parquet",
        "event_id",
        "value",
        150,
        columns=["event_id", "user_id", "value"],
    )
    return out.sort_values("event_id").reset_index(drop=True)


def q_pack_shards_documents(sf_dir: str) -> pd.DataFrame:
    """Token-budget shard packing (distributed two-pass prefix scan);
    oracle = the window-function exclusive prefix sum."""
    from .curation import pack_shards

    out = pack_shards(
        f"{sf_dir}/documents.parquet", budget=2048
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _derived_urls(sf_dir: str):
    """Deterministic URL table derived from doc_id (mixed case, www,
    query strings, fragments, trailing slashes — every normalization
    case), mirrored 1:1 in the oracle's CASE/concat expression."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_ = ids.astype("U")
        url = np.char.add("https://WWW.Host", (ids % 7).astype("U"))
        url = np.char.add(url, ".Example.COM/page/")
        url = np.char.add(url, (ids % 13).astype("U"))
        url = np.char.add(url, np.where(ids % 11 == 0, "/", ""))
        url = np.char.add(
            url,
            np.where(
                ids % 3 == 0,
                np.char.add("?utm_source=x&sid=", s_),
                np.full(len(ids), ""),
            ),
        )
        url = np.char.add(url, np.where(ids % 5 == 0, "#frag", ""))
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(url, pa.string())}
        )

    return ds.map_batches(inject, batch_format="pyarrow")


def q_url_profile_documents(sf_dir: str) -> pd.DataFrame:
    """URL normalization + domain extraction (RE2-exact both sides)."""
    from .urls import url_profile

    out = url_profile(_derived_urls(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_url_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Keep-first per normalized URL — scheme/www/query/fragment
    variants of a page collapse to one representative."""
    from .urls import url_dedup

    out = url_dedup(_derived_urls(sf_dir)).to_pandas()
    return out.sort_values("norm_url").reset_index(drop=True)


def q_domain_counts_documents(sf_dir: str) -> pd.DataFrame:
    """Pages per domain with in-batch pre-aggregation."""
    from .urls import domain_counts

    out = domain_counts(_derived_urls(sf_dir)).to_pandas()
    out["n_pages"] = out["n_pages"].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)


def _derived_urls_deep(sf_dir: str):
    """:func:`_derived_urls` plus a deeper-subdomain twist: ids
    divisible by 17 get a ``Sub.`` host prefix, so blocklist suffix
    matching (a subdomain of a blocked domain) has real work to do.
    Mirrored 1:1 in ``_URL_DEEP_BASE``."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        url = np.where(ids % 17 == 0, "https://Sub.Host", "https://Host")
        url = np.char.add(url.astype("U32"), (ids % 7).astype("U"))
        url = np.char.add(url, ".Example.COM/page/")
        url = np.char.add(url, ids.astype("U"))
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(url, pa.string())}
        )

    return ds.map_batches(inject, batch_format="pyarrow")


def q_url_blocklist_documents(sf_dir: str) -> pd.DataFrame:
    """Crawl-hygiene gate: drop pages whose host equals a blocked
    domain or is a subdomain of one (whole-label suffix match against
    a ray.put-broadcast set; per-row cost independent of list size)."""
    from .urls import url_host_filter

    out = url_host_filter(
        _derived_urls_deep(sf_dir), ["host3.example.com", "bad.org"]
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_cap_per_domain_documents(sf_dir: str) -> pd.DataFrame:
    """Per-domain quota: keep the 40 smallest doc ids per domain
    (identity-only shuffle with a batch-local head-N combiner)."""
    from .urls import cap_per_domain

    out = cap_per_domain(_derived_urls(sf_dir), 40).to_pandas()
    return out.sort_values(["domain", "doc_id"]).reset_index(drop=True)


def q_line_filter_documents(sf_dir: str) -> pd.DataFrame:
    """RefinedWeb-style line-wise correction over deterministically
    multi-lined text (every 'line' token becomes a newline, mirrored
    in SQL): boilerplate lines drop by integer length/alpha-ratio
    predicates, survivors re-join, counts emitted per doc."""
    from .curation import line_quality_filter

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def multiline(batch: pa.Table) -> pa.Table:
        t = pc.replace_substring(
            pc.coalesce(batch["text"], ""), "line", "\n"
        )
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    out = line_quality_filter(
        ds.map_batches(multiline, batch_format="pyarrow"),
        min_chars=12,
        min_alpha_pct=55,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_robots_meta_documents(sf_dir: str) -> pd.DataFrame:
    """Crawl-compliance gate: per-page robots-meta directive flags
    over deterministically derived html (ids %9==0 declare noindex,
    %13==0 nofollow — both when both divide; mirrored in SQL), then
    the noindex pages are dropped. Output: kept doc_id + nofollow
    flag."""
    from .webpages import robots_meta_flags

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        directive = np.where(ids % 9 == 0, "noindex", "")
        both = (ids % 9 == 0) & (ids % 13 == 0)
        directive = np.where(both, "noindex, nofollow", directive)
        directive = np.where(
            (ids % 13 == 0) & ~(ids % 9 == 0), "nofollow", directive
        )
        meta = np.where(
            directive == "",
            "",
            np.char.add(
                np.char.add('<meta name="robots" content="', directive),
                '">',
            ),
        )
        html = np.char.add(
            np.char.add("<html><head>", meta),
            "</head><body><p>page</p></body></html>",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "html": pa.array(html.astype(object), pa.binary()),
            }
        )

    flags = robots_meta_flags(
        ds.map_batches(inject, batch_format="pyarrow")
    ).to_pandas()
    out = flags[~flags["robots_noindex"]][["doc_id", "robots_nofollow"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def q_token_doc_freq_documents(sf_dir: str) -> pd.DataFrame:
    """Corpus vocabulary document frequencies (combiner pattern:
    per-batch distinct-per-doc pre-aggregation before the global
    groupby)."""
    from .text import token_doc_freq

    out = token_doc_freq(f"{sf_dir}/documents.parquet", min_df=2).to_pandas()
    out["df"] = out["df"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


def q_vocab_coverage_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc OOV rate vs the corpus' top-256 token vocabulary
    (tokenizer-coverage signal; exact string membership, unrounded
    IEEE division so the hash matches bit-for-bit)."""
    from .text import vocab_coverage

    out = vocab_coverage(
        f"{sf_dir}/documents.parquet", top_v=256
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_SCAN_PATTERNS = ["spark", "customer", "value fast", "qqq"]


def q_pattern_scan_documents(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide multi-substring scan: total occurrences + containing
    docs for K literal patterns in ONE streaming pass (K-bounded
    exchange)."""
    from .text import multi_pattern_counts

    return multi_pattern_counts(
        f"{sf_dir}/documents.parquet", _SCAN_PATTERNS
    ).to_pandas()


def q_normalize_text_documents(sf_dir: str) -> pd.DataFrame:
    """Canonical text normalization (NFC → lower → whitespace collapse
    → trim): Arrow and DuckDB share utf8proc + RE2, so the kernels are
    byte-identical."""
    from .text import normalize_text

    out = normalize_text(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_tfidf_top_terms_documents(sf_dir: str) -> pd.DataFrame:
    """Per-document top-5 TF-IDF terms: df pass → per-batch tf combiner
    → shuffle join on token → grouped_top_k per doc (rounded-score
    ranking, token tie-break)."""
    from .text import tfidf_top_terms

    out = tfidf_top_terms(f"{sf_dir}/documents.parquet", k=5).to_pandas()
    return out.sort_values(
        ["doc_id", "score", "token"], ascending=[True, False, True]
    ).reset_index(drop=True)


def q_bpe_token_count_documents(sf_dir: str) -> pd.DataFrame:
    """BPE-pretokenizer token counts (letter/digit/symbol runs with
    optional space prefix — the tokenizer-budget estimator); same RE2
    pattern both sides."""
    from .text import pretoken_count

    out = pretoken_count(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_unigram_logprob_documents(sf_dir: str) -> pd.DataFrame:
    """CCNet-style LM quality signal: per-doc mean unigram
    log-probability under the corpus's own unigram model (counts pass
    → broadcast ln-prob table → per-batch Rust join + doc reduce)."""
    from .text import unigram_logprob

    out = unigram_logprob(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_unigram_logprob_capped_documents(sf_dir: str) -> pd.DataFrame:
    """The memory-safe capped tier of the unigram LM: hash-bucketed
    distributed reduce + per-bucket top-V + one final cut, driver
    holds ≤ vocab_size (hash, logprob) rows. The cap (4096) exceeds
    this corpus's distinct-token vocabulary, so no token is cut and
    the output is byte-identical to the uncapped oracle — the whole
    distributed-cap machinery (bucketing, total carrier rows,
    two-level top-V) is pinned to exact SQL."""
    from .text import unigram_logprob

    out = unigram_logprob(
        f"{sf_dir}/documents.parquet", vocab_size=4096
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_perplexity_buckets_documents(sf_dir: str) -> pd.DataFrame:
    """CCNet's signature stage: bucket every document into
    head/middle/tail by EXACT global tertiles of its LM score
    (higher logprob = lower perplexity = head). Two passes — a
    distinct-bounded quantile reduce for the two cut points, then a
    streaming assign with the cuts closed over as scalars."""
    from .relational import bucket_by_quantile
    from .text import unigram_logprob

    scored = unigram_logprob(f"{sf_dir}/documents.parquet")
    out = bucket_by_quantile(
        scored,
        "logprob_mean",
        labels=["tail", "middle", "head"],
        id_cols=["doc_id"],
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_perplexity_buckets_by_lang_documents(sf_dir: str) -> pd.DataFrame:
    """CCNet's ACTUAL banding design: perplexity tertiles PER LANGUAGE
    (each language keeps its own head third — a global cut would call
    every low-resource-language doc 'tail'). Score with the unigram
    LM, attach ``lang`` via a bucketed hash join, then the grouped
    tier of :func:`bucket_by_quantile`: per-group exact cuts (one
    bucketed shuffle, #langs × 2 driver scalars) broadcast once, and
    the assign pass streams."""
    from .relational import bucket_by_quantile, hash_join
    from .text import unigram_logprob

    scored = unigram_logprob(f"{sf_dir}/documents.parquet")
    joined = hash_join(
        scored,
        f"{sf_dir}/documents.parquet",
        left_key="doc_id",
        right_key="doc_id",
        left_cols=["doc_id", "logprob_mean"],
        right_cols=["lang"],
        num_buckets=8,
    )
    out = bucket_by_quantile(
        joined,
        "logprob_mean",
        group_col="lang",
        labels=["tail", "middle", "head"],
        id_cols=["doc_id"],
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_ccnet_pipeline_documents(sf_dir: str) -> pd.DataFrame:
    """The CCNet pipeline END-TO-END (Wenzek et al. 2020), composed
    from the engine's own stages: supported-language filter → unigram
    LM scored on the FILTERED corpus → per-LANGUAGE perplexity
    tertiles → drop each language's worst third → domain-frequency
    boilerplate removal over the survivors. Every stage is the
    already-oracle-backed operator; this query pins the COMPOSITION
    (model fit on the filtered corpus, bands per lang, boilerplate
    counts on the band survivors — order matters and the single SQL
    CTE chain checks all of it).

    Scale shape: the score pass carries lang/source/text THROUGH
    (``unigram_logprob(passthrough_cols=...)``) instead of a
    corpus-wide self-join of scores back onto text — one full exchange
    of the corpus saved vs the join formulation (both verified
    identical by the oracle)."""
    import pyarrow.compute as _pc

    from .dedup import domain_boilerplate_removal
    from .relational import bucket_by_quantile
    from .text import unigram_logprob

    langs = pa.array(["en", "fr", "de", "es"])
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )

    def keep_lang(b: pa.Table) -> pa.Table:
        return b.filter(
            _pc.fill_null(_pc.is_in(b["lang"], value_set=langs), False)
        )

    f = docs.map_batches(keep_lang, batch_format="pyarrow")
    # bucket_by_quantile consumes its source twice (cuts + assign) —
    # pin the scored table so the score pass runs once (at 100 TB:
    # write it to Parquet, the documented checkpoint convention)
    scored = unigram_logprob(
        f, passthrough_cols=["lang", "source", "text"]
    ).materialize()
    banded = bucket_by_quantile(
        scored, "logprob_mean",
        group_col="lang",
        labels=["tail", "middle", "head"],
        id_cols=["doc_id", "source", "text"],
    )

    def keep_head_middle(b: pa.Table) -> pa.Table:
        m = _pc.and_(
            _pc.is_valid(b["bucket"]), _pc.not_equal(b["bucket"], "tail")
        )
        return b.filter(_pc.fill_null(m, False))

    kept = banded.map_batches(keep_head_middle, batch_format="pyarrow")
    out = domain_boilerplate_removal(
        kept, domain_col="source", sep=" ", min_docs=5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_fineweb_pipeline_documents(sf_dir: str) -> pd.DataFrame:
    """FineWeb/Dolma-style web-curation pipeline END-TO-END, composed
    from the engine's own stages in the published order: URL-host
    blocklist gate → supported-language filter → Gopher quality gate
    (streaming `gopher_gate` — the gate is doc-local, so no id-list
    semi-join ships the corpus) → exact dedup (keep min doc_id per
    text) → corpus-wide paragraph dedup → PII redaction → per-doc
    token count. ONE lazy plan; the single SQL CTE chain pins the
    COMPOSITION (each stage's scope is the previous stage's survivor
    set — order matters for dedup counts and paragraph ownership)."""
    import pyarrow.compute as _pc

    from .curation import gopher_gate, pii_redact
    from .dedup import exact_dedup, paragraph_dedup
    from .urls import url_host_filter

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def inject_url(batch: pa.Table) -> pa.Table:
        # the deterministic derived-URL convention of _derived_urls_deep
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        url = np.where(ids % 17 == 0, "https://Sub.Host", "https://Host")
        url = np.char.add(url.astype("U32"), (ids % 7).astype("U"))
        url = np.char.add(url, ".Example.COM/page/")
        url = np.char.add(url, ids.astype("U"))
        return batch.append_column("url", pa.array(url, pa.string()))

    langs = pa.array(["en", "fr", "de", "es"])

    def keep_lang(b: pa.Table) -> pa.Table:
        m = _pc.fill_null(_pc.is_in(b["lang"], value_set=langs), False)
        return b.filter(m).drop_columns(["lang", "url"])

    gated = url_host_filter(
        docs.map_batches(inject_url, batch_format="pyarrow"),
        ["host3.example.com", "bad.org"],
    ).map_batches(keep_lang, batch_format="pyarrow")
    quality = gopher_gate(gated)
    deduped = exact_dedup(quality, "text", tiebreak="doc_id", keep="first")
    para = paragraph_dedup(deduped, sep=" the ")
    pii = pii_redact(para)

    def finish(b: pa.Table) -> pa.Table:
        import polars as pl

        t = pl.from_arrow(b.select(["redacted_text"]))["redacted_text"]
        toks = t.str.split(" ")
        n = (toks.list.len() - toks.list.count_matches("")).cast(pl.Int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["redacted_text"],
                "n_tokens": pa.array(n.to_numpy(), pa.int64()),
            }
        )

    out = pii.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pipeline_spec_fineweb(sf_dir: str) -> pd.DataFrame:
    """The SAME FineWeb pipeline as ``fineweb_pipeline_documents``,
    composed entirely from the shipped ``examples/fineweb_spec.yaml``
    (config, not code): URL gate → lang filter → streaming Gopher
    gate → exact dedup → paragraph dedup → PII redact → token count.
    Shares the hand-built query's exact seven-stage CTE oracle, so
    the spec runner's composition is pinned bit-exact."""
    from pathlib import Path

    from .spec import run_pipeline_spec

    spec = str(
        Path(__file__).resolve().parents[2] / "examples" / "fineweb_spec.yaml"
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def inject_url(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        url = np.where(ids % 17 == 0, "https://Sub.Host", "https://Host")
        url = np.char.add(url.astype("U32"), (ids % 7).astype("U"))
        url = np.char.add(url, ".Example.COM/page/")
        url = np.char.add(url, ids.astype("U"))
        return batch.append_column("url", pa.array(url, pa.string()))

    out = run_pipeline_spec(
        spec, source=docs.map_batches(inject_url, batch_format="pyarrow")
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pipeline_spec_ccnet(sf_dir: str) -> pd.DataFrame:
    """The SAME CCNet pipeline as ``ccnet_pipeline_documents``, but
    composed entirely from the YAML spec runner (the shipped
    ``examples/ccnet_spec.yaml``): a config file — not code — chains
    filter → LM scoring → self-join (via ``save_as``) → per-lang
    banding → band filter → boilerplate removal into ONE lazy plan.
    Shares the hand-built query's exact CTE oracle, so the spec
    runner's composition (incl. the save_as re-reference) is pinned
    bit-exact."""
    from pathlib import Path

    from .spec import run_pipeline_spec

    spec = str(
        Path(__file__).resolve().parents[2] / "examples" / "ccnet_spec.yaml"
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    out = run_pipeline_spec(spec, docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_bigram_logprob_documents(sf_dir: str) -> pd.DataFrame:
    """Order-2 LM quality signal: per-doc mean conditional bigram
    log-probability P(w2|w1)=c(w1,w2)/c(w1,·) under the corpus's own
    pair counts (pair-hash partials → one lexsort merge → broadcast
    searchsorted probe). Docs with < 2 tokens score NULL."""
    from .text import bigram_logprob

    out = bigram_logprob(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_bigram_logprob_capped_documents(sf_dir: str) -> pd.DataFrame:
    """The memory-safe capped tier of the bigram LM: per-bucket
    distributed reduce + top-V cut, driver holds ≤ max_bigrams rows.
    The cap (4096) exceeds this corpus's distinct-pair vocabulary, so
    no pair is cut and the output is byte-identical to the uncapped
    oracle — the whole distributed-cap machinery (bucketing,
    per-bucket logprob, two-level top-V) is pinned to exact SQL."""
    from .text import bigram_logprob

    out = bigram_logprob(
        f"{sf_dir}/documents.parquet", max_bigrams=4096
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_FINEWEB_SQL = (
    # stage 1+2: derived-URL host blocklist gate + language filter
    # (both row-local — commute; SQL applies lang first for brevity)
    "WITH u AS (SELECT doc_id, text, "
    "(CASE WHEN doc_id % 17 = 0 THEN 'https://Sub.Host' "
    "ELSE 'https://Host' END || (doc_id % 7) || "
    "'.Example.COM/page/' || doc_id) AS url FROM documents "
    "WHERE lang IN ('en','fr','de','es')), "
    "hn AS (SELECT doc_id, text, regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(lower(url), "
    "'^[a-z][a-z0-9+.-]*://', ''), '^www\\.', ''), '[?#].*$', ''), "
    "'/+$', '') AS norm FROM u), "
    "hh AS (SELECT doc_id, text, "
    "regexp_replace(norm, '/.*$', '') AS host FROM hn), "
    "d0 AS (SELECT doc_id, text FROM hh WHERE NOT EXISTS ("
    "SELECT 1 FROM (VALUES ('host3.example.com'), ('bad.org')) b(d) "
    "WHERE hh.host = b.d OR hh.host LIKE '%.' || b.d)), "
    # stage 3: Gopher gate over d0 survivors (integer-exact)
    "base AS (SELECT doc_id, coalesce(text, '') AS text, "
    "list_filter(string_split(coalesce(text, ''), ' '), "
    "x -> x <> '') AS toks FROM d0), "
    "t1 AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, "
    "coalesce(list_sum(list_transform(toks, x -> len(x))), 0)::BIGINT "
    "AS total_token_chars, "
    "(len(text) - len(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))"
    "::BIGINT AS n_symbol_chars FROM base), "
    "sh AS (SELECT doc_id, unnest(list_transform("
    "generate_series(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1])) AS sh FROM base), "
    "cnt AS (SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY 1, 2), "
    "t2 AS (SELECT doc_id, sum(c)::BIGINT AS n_2grams, "
    "max(c)::BIGINT AS top_2gram_count FROM cnt GROUP BY doc_id), "
    "g AS (SELECT t1.doc_id, n_tokens, "
    "coalesce(n_2grams, 0) AS n_2grams, "
    "coalesce(top_2gram_count, 0) AS top_2gram_count, "
    "total_token_chars, n_symbol_chars "
    "FROM t1 LEFT JOIN t2 ON t1.doc_id = t2.doc_id), "
    "d1 AS (SELECT d0.doc_id, d0.text FROM d0 JOIN (SELECT doc_id "
    "FROM g WHERE n_tokens >= 5 AND top_2gram_count * 5 <= n_2grams "
    "AND n_symbol_chars * 10 <= total_token_chars "
    "AND 2 * n_tokens <= total_token_chars "
    "AND total_token_chars <= 12 * n_tokens) k USING (doc_id)), "
    # stage 4: exact dedup keep-first (min doc_id per text)
    "d2 AS (SELECT MIN(doc_id) AS doc_id, text FROM d1 GROUP BY text), "
    # stage 5: corpus-wide paragraph dedup over d2 survivors
    "p AS (SELECT doc_id, unnest(string_split(COALESCE(text, ''), "
    "' the ')) AS part, generate_subscripts(string_split("
    "COALESCE(text, ''), ' the '), 1) AS idx FROM d2), "
    "r AS (SELECT doc_id, idx, part, ROW_NUMBER() OVER ("
    "PARTITION BY part ORDER BY doc_id, idx) AS rn FROM p), "
    "d3 AS (SELECT doc_id, COALESCE(string_agg("
    "CASE WHEN rn = 1 THEN part END, ' the ' ORDER BY idx), '') "
    "AS text FROM r GROUP BY doc_id), "
    # stage 6: PII redaction (email → phone → IP, declaration order)
    "s1 AS (SELECT doc_id, regexp_replace(text, "
    "'[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g') "
    "AS t FROM d3), "
    "s2 AS (SELECT doc_id, regexp_replace(t, "
    "'\\b555-[0-9]{4}\\b', '<PHONE>', 'g') AS t FROM s1), "
    "s3 AS (SELECT doc_id, regexp_replace(t, "
    "'\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS t FROM s2) "
    # stage 7: per-doc token count of the final text
    "SELECT doc_id, t AS text, len(list_filter(string_split(t, ' '), "
    "x -> x <> ''))::BIGINT AS n_tokens FROM s3 ORDER BY doc_id"
)

_CCNET_SQL = (
    "WITH f AS (SELECT doc_id, text, lang, source FROM documents "
    "WHERE lang IN ('en','fr','de','es')), "
    "tok AS (SELECT doc_id, unnest(list_filter("
    "string_split(text, ' '), x -> x <> '')) AS t FROM f), "
    "freq AS (SELECT t, COUNT(*)::DOUBLE AS c FROM tok GROUP BY t), "
    "tot AS (SELECT SUM(c) AS s FROM freq), "
    "per_doc AS (SELECT tok.doc_id, "
    "ROUND(SUM(LN(c / s)) / COUNT(*), 6) AS lm "
    "FROM tok JOIN freq USING (t) CROSS JOIN tot "
    "GROUP BY tok.doc_id), "
    "scored AS (SELECT f.doc_id, f.lang, f.source, f.text, p.lm "
    "FROM f LEFT JOIN per_doc p USING (doc_id)), "
    "cuts AS (SELECT lang, quantile_cont(lm, 1.0/3.0) AS c1 "
    "FROM scored GROUP BY lang), "
    "kept AS (SELECT s.doc_id, s.source, s.text FROM scored s "
    "JOIN cuts c USING (lang) "
    "WHERE s.lm IS NOT NULL AND s.lm > c.c1), "
    "p AS (SELECT doc_id, source, "
    "unnest(string_split(COALESCE(text, ''), ' ')) AS part, "
    "generate_subscripts(string_split(COALESCE(text, ''), ' '), 1) "
    "AS idx FROM kept), "
    "bad AS (SELECT source, part FROM p GROUP BY source, part "
    "HAVING COUNT(DISTINCT doc_id) >= 5), "
    "t2 AS (SELECT p.doc_id, p.part, p.idx, "
    "(b.part IS NOT NULL) AS is_bad FROM p LEFT JOIN bad b "
    "ON p.source = b.source AND p.part = b.part) "
    "SELECT doc_id, "
    "COALESCE(string_agg(CASE WHEN NOT is_bad THEN part END, "
    "' ' ORDER BY idx), '') AS text, "
    "(COUNT(*) FILTER (WHERE is_bad))::BIGINT AS n_dropped "
    "FROM t2 GROUP BY doc_id ORDER BY doc_id"
)

_DSIR_SQL = (
    "WITH tok_r AS (SELECT doc_id, unnest(list_filter("
    "string_split(text, ' '), x -> x <> '')) AS t FROM documents), "
    "tok_t AS (SELECT unnest(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS t FROM documents WHERE lang = 'en'), "
    "cr AS (SELECT t, COUNT(*)::DOUBLE AS c FROM tok_r GROUP BY t), "
    "ct AS (SELECT t, COUNT(*)::DOUBLE AS c FROM tok_t GROUP BY t), "
    "v AS (SELECT t FROM cr UNION SELECT t FROM ct), "
    "tot AS (SELECT (SELECT COALESCE(SUM(c),0) FROM cr) AS nr, "
    "(SELECT COALESCE(SUM(c),0) FROM ct) AS nt, "
    "(SELECT COUNT(*) FROM v)::DOUBLE AS vv), "
    "lr AS (SELECT v.t, "
    "LN((COALESCE(ct.c,0)+0.5)/(nt+0.5*vv)) - "
    "LN((COALESCE(cr.c,0)+0.5)/(nr+0.5*vv)) AS llr "
    "FROM v LEFT JOIN cr ON v.t=cr.t LEFT JOIN ct ON v.t=ct.t "
    "CROSS JOIN tot), "
    "doc AS (SELECT tok_r.doc_id, COUNT(*)::BIGINT AS n_tokens, "
    "ROUND(SUM(lr.llr), 6) AS logratio_sum "
    "FROM tok_r JOIN lr ON tok_r.t = lr.t GROUP BY tok_r.doc_id) "
    "SELECT d.doc_id, COALESCE(doc.n_tokens, 0)::BIGINT AS n_tokens, "
    "doc.logratio_sum FROM documents d LEFT JOIN doc USING (doc_id) "
    "ORDER BY d.doc_id"
)


def _dsir_weights(sf_dir: str, **kw) -> pd.DataFrame:
    from .text import dsir_logratio

    raw = f"{sf_dir}/documents.parquet"
    tgt = ray.data.read_parquet(raw, columns=["text", "lang"]).filter(
        expr="lang == 'en'"
    )
    out = dsir_logratio(raw, tgt, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dsir_weights_documents(sf_dir: str) -> pd.DataFrame:
    """DSIR importance weights (Xie et al. 2023): log-ratio of each
    raw doc's tokens under the target (lang='en') vs raw unigram
    models, additive-smoothed over the union vocabulary. Two
    distinct-bounded count passes + one broadcast probe; bit-exact
    vs the SQL two-model reconstruction."""
    return _dsir_weights(sf_dir)


def q_dsir_weights_capped_documents(sf_dir: str) -> pd.DataFrame:
    """The memory-safe capped tier of the DSIR table: hash-bucketed
    two-sided distributed merge, per-bucket top-V by combined count,
    carrier rows for the TRUE totals and TRUE union-vocab size (the
    smoothing denominators are cap-independent), driver ≤ V rows. The
    cap (4096) exceeds this corpus's union vocabulary, so no token is
    cut and the output is byte-identical to the exact SQL oracle —
    pinning the whole distributed-cap machinery."""
    return _dsir_weights(sf_dir, vocab_size=4096)


def q_dsir_weights_fused_documents(sf_dir: str) -> pd.DataFrame:
    """The ONE-READ tier of DSIR: the target is a boolean column on
    the raw stream (lang='en'), so a single counts pass produces BOTH
    models' counts — at 100 TB the corpus read dominates, making this
    the preferred shape whenever the target is a subset. Must be
    byte-identical to the two-source oracle."""
    import pyarrow.compute as _pc

    from .text import dsir_logratio

    raw = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(
        lambda b: b.append_column(
            "is_target", _pc.equal(b["lang"], "en")
        ),
        batch_format="pyarrow",
    )
    out = dsir_logratio(raw, target_col="is_target").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dsir_select_documents(sf_dir: str) -> pd.DataFrame:
    """DSIR selection: the top-50 raw docs by importance weight
    (logratio_sum desc, doc_id asc) — the deterministic top-k variant
    of DSIR's resampling step, via the shared partial-top-k reduce
    (only k × #batches candidate rows reach the driver)."""
    from .relational import top_k_rows
    from .text import dsir_logratio

    raw = f"{sf_dir}/documents.parquet"
    tgt = ray.data.read_parquet(raw, columns=["text", "lang"]).filter(
        expr="lang == 'en'"
    )
    # the weights stay a lazy Dataset: only k × #batches candidate
    # rows ever reach the driver (top_k_rows filters NULL weights)
    w = dsir_logratio(raw, tgt)
    out = top_k_rows(
        w, "logratio_sum", 50, descending=True, tiebreak_cols=["doc_id"]
    )
    return out.reset_index(drop=True)


def q_token_entropy_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc Shannon entropy of the doc's own token distribution
    (repetition signal; natural log, ROUND 6; NULL for empty docs)."""
    from .text import token_entropy

    out = token_entropy(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_quality_classifier_documents(sf_dir: str) -> pd.DataFrame:
    """fastText-style quality gate: logistic score over the exact
    quality counters (weights broadcast once via ray.put, one matmul
    per batch), label = score >= 0.5."""
    from .curation import linear_classifier_score
    from .text import quality_stats

    qs = quality_stats(f"{sf_dir}/documents.parquet")
    out = linear_classifier_score(
        qs,
        ["n_chars", "n_tokens", "n_stopwords", "n_unique_tokens"],
        weights=[0.0005, 0.02, 0.08, -0.03],
        bias=-1.5,
        id_cols=["doc_id"],
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_repetition_rule_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition gate as a registry rule (rule_type=repetition)
    run through the fused validation pass; min_tokens=30 makes the
    failed count non-trivial on the testdata corpus."""
    return _single_rule_counts(
        sf_dir, "documents",
        ValidationRule(
            name="rep", rule_type="repetition", column="text",
            parameters={"min_tokens": 30},
        ),
    )


def q_pii_rule_documents(sf_dir: str) -> pd.DataFrame:
    """PII-presence rule (rule_type=pii) through the fused pass —
    failing row = any email/phone/IPv4 span in the column."""
    return _single_rule_counts(
        sf_dir, "documents",
        ValidationRule(name="pii", rule_type="pii", column="text"),
    )


def q_curation_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Fused curation pass (Gopher + PII counts + decontamination in
    one read / one explode); oracle = join of the three per-op CTEs.
    Columns byte-identical to the standalone operators'."""
    from .curation import curation_profile

    bench = _bench_slice(sf_dir)
    out = curation_profile(
        f"{sf_dir}/documents.parquet", bench, ngram=5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_full_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Everything-in-one-pass document profile: text tier (quality +
    language ID + fingerprint) ∪ curation tier (Gopher + PII +
    decontamination) in ONE read and ONE token explode. Oracle = join
    of the per-op oracles, each column exactly once."""
    from .curation import full_profile

    bench = _bench_slice(sf_dir)
    out = full_profile(
        f"{sf_dir}/documents.parquet", bench, ngram=5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_top_ngrams_documents(sf_dir: str) -> pd.DataFrame:
    """Exact corpus top-20 bigrams (boilerplate statistic; combiner
    per batch, global sum, (count desc, text asc) tie-break)."""
    from .text import top_ngrams

    out = top_ngrams(
        f"{sf_dir}/documents.parquet", n=2, k=20
    ).to_pandas()
    return out.reset_index(drop=True)


def q_assign_splits_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split labels (Knuth-hash per-mille
    bands — RNG-free, stable under repartitioning)."""
    from .curation import assign_splits

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    out = assign_splits(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_top_values_events_user(sf_dir: str) -> pd.DataFrame:
    """Exact top-10 most frequent user_ids in events (heavy hitters,
    two-level exact count; ties break by value asc)."""
    from .profile import top_values

    out = top_values(
        f"{sf_dir}/events.parquet", "user_id", k=10
    ).to_pandas()
    return out.reset_index(drop=True)


def q_grouped_higher_moments_events(sf_dir: str) -> pd.DataFrame:
    """Per-user skewness + excess kurtosis of event values (DuckDB's
    bias-corrected G1/G2 definitions; NULL under n<3/n<4 or zero
    variance)."""
    from .profile import grouped_higher_moments

    out = grouped_higher_moments(
        f"{sf_dir}/events.parquet", ["user_id"], "value"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_misra_gries_events_user(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy hitters as an EXACT driver gate: a derived
    skewed key (half the rows collapse onto ``user_id % 8``, the other
    half stay long-tail at ``user_id + 10000``) plants 8 true heavy
    hitters; the MG summary (capacity 64 — the decrement path is
    exercised by the ~158-value stream) GUARANTEES every value with
    true count > n/(capacity+1) survives, so exact-recounting the ≤64
    candidates (one vectorized filtered pass) and thresholding yields
    EXACTLY the SQL ``HAVING COUNT(*) > n/65`` set. The raw sketch's
    batch-boundary-dependent est_counts stay pinned by
    tests/test_profile.py."""
    import pyarrow.compute as _pc

    from .profile import misra_gries_topk

    capacity = 64

    def derive(b: pa.Table) -> pa.Table:
        b = b.filter(_pc.is_valid(b["user_id"]))
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hh = np.where(eid % 2 == 0, uid % 8, uid + 10000)
        return pa.table({"hh": pa.array(hh, pa.int64())})

    # three consumers (MG pass, recount pass, total count) — pin the
    # derived column once instead of re-running the map per consumer
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    ).map_batches(derive, batch_format="pyarrow").materialize()
    summary = misra_gries_topk(
        ds, "hh", k=capacity, capacity=capacity
    ).to_pandas()
    cand = pa.array(summary["value"].astype("int64"), pa.int64())
    cand_ref = ray.put(cand)

    def count_cands(b: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        kept = b.filter(
            _pc.fill_null(_pc.is_in(b["hh"], value_set=cs), False)
        )
        g = kept.group_by("hh").aggregate([([], "count_all")])
        return pa.table({"hh": g["hh"], "c": g["count_all"]})

    parts = ds.map_batches(count_cands, batch_format="pyarrow").to_pandas()
    n_total = int(ds.count())
    agg = parts.groupby("hh")["c"].sum()
    thr = n_total / (capacity + 1)
    heavy = agg[agg > thr].sort_index()
    return pd.DataFrame(
        {
            "value": heavy.index.to_numpy(np.int64),
            "n_rows": heavy.to_numpy(np.int64),
        }
    )


def q_histogram_events_value(sf_dir: str) -> pd.DataFrame:
    """Equi-width histogram of events.value over [0, 512), 32 bins of
    width 16 (exactly representable — bin edges hash-exact vs SQL)."""
    from .profile import histogram

    out = histogram(
        f"{sf_dir}/events.parquet", "value", lo=0.0, hi=512.0, n_bins=32
    ).to_pandas()
    return out.sort_values("bin_id").reset_index(drop=True)


def q_semantic_dedup_embeddings(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style embedding dedup, driver-gated by the planted
    construction: the corpus unions an exact copy of every vector at
    id+10^9. A copy always lands in its original's cluster (identical
    vector → identical nearest centroid), and the greedy keep-first
    rule can NEVER keep it: if the original was kept the copy drops
    against it at cosine 1; if the original was itself dropped by some
    kept row k, then cos(k, copy) = cos(k, original) ≥ t and the copy
    drops against k. So every planted copy must be absent from the
    survivors regardless of where the seeded k-means put the clusters
    — the closed-form gate on assignment + in-cluster dedup. The
    original-side survivor set (k-means-dependent) stays pinned by
    unit tests."""
    from .curation import semantic_dedup

    out = semantic_dedup(
        _planted_union(sf_dir, "embeddings", "vec_id", "embedding"),
        threshold=0.95, n_clusters=8,
    ).to_pandas()
    survivors = out["vec_id"].astype("int64")
    n_copies_surviving = int((survivors >= _PLANT_SHIFT).sum())
    import pyarrow.parquet as _pq

    n_copies = _pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet"
    ).metadata.num_rows
    return pd.DataFrame(
        {
            "n_copies": pd.array([n_copies], dtype="int64"),
            "n_copies_surviving": pd.array(
                [n_copies_surviving], dtype="int64"
            ),
            "all_copies_dropped": [n_copies_surviving == 0],
        }
    )


def q_exact_quantiles_events(sf_dir: str) -> pd.DataFrame:
    """EXACT per-group continuous quantiles (bit-exact vs DuckDB
    quantile_cont; the t-digest tier's exact counterpart)."""
    from .relational import grouped_exact_quantiles

    out = grouped_exact_quantiles(
        f"{sf_dir}/events.parquet", "event_type", "value",
        quantiles=(0.25, 0.5, 0.75, 0.95),
    ).to_pandas()
    for c in ("p25", "p50", "p75", "p95"):
        out[c] = out[c].round(6)
    return out.sort_values("event_type").reset_index(drop=True)


def q_iqr_outliers_events(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier rows per event_type (exact grouped
    quantiles → broadcast fences → one flagging pass)."""
    from .relational import iqr_outliers

    out = iqr_outliers(
        f"{sf_dir}/events.parquet", "event_type", "value",
        ["event_id"], k=1.5,
    ).to_pandas()
    out = out[["event_id", "event_type", "value"]]
    out["value"] = out["value"].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


def q_psi_events_split(sf_dir: str) -> pd.DataFrame:
    """Fixed-bin PSI between the even- and odd-event_id halves of
    events (the oracle-exact drift tier: fixed edges, searchsorted
    membership = SQL count-of-edges<=v; no division on either side)."""
    import pyarrow.compute as _pc

    from ..stages.drift import psi_fixed_bins

    edges = [float(x) for x in range(0, 101, 10)]

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    return psi_fixed_bins(side(0), side(1), "value", edges).to_pandas()


def q_chi2_lang_split_documents(sf_dir: str) -> pd.DataFrame:
    """Pearson chi-squared homogeneity of the documents.lang mix
    between the even- and odd-doc_id halves — the categorical drift
    monitor (PSI/KS need numeric bins; category-mix shift is its own
    failure mode). Exchange is distinct-categories-per-batch counts."""
    import pyarrow.compute as _pc

    from ..stages.drift import chi2_categorical

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["doc_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    return chi2_categorical(side(0), side(1), "lang").to_pandas()


def q_partition_anomaly_events(sf_dir: str) -> pd.DataFrame:
    """Per-partition (user_id % 16) profile of events.value with
    MAD-based anomaly flags — the cross-partition consistency check
    (a bad shard passes every within-partition rule; only comparing
    partitions against each other catches it). ONE streaming pass,
    partitions × batches exchange; all floats rounded to 6 BEFORE the
    threshold compare so flags are oracle-reproducible."""
    from ..stages.drift import partition_anomaly

    out = partition_anomaly(
        f"{sf_dir}/events.parquet", "value", "user_id",
        num_partitions=16, mad_k=3.0,
    ).to_pandas()
    return out.sort_values("partition").reset_index(drop=True)


def q_reconcile_orders_lineitem(sf_dir: str) -> pd.DataFrame:
    """Cross-table aggregate reconciliation: per-order SUM of the
    lineitem charge expression vs orders.o_totalprice, orphans
    surfaced both ways — the between-tables consistency check no
    single-table rule can express. Fact side pre-aggregates per batch;
    ONE bucketed groupby + ONE full hash join."""
    from .relational import reconcile_tables

    out = reconcile_tables(
        f"{sf_dir}/lineitem.parquet",
        f"{sf_dir}/orders.parquet",
        fact_key="l_orderkey",
        header_key="o_orderkey",
        fact_value_expr="l_extendedprice * (1 - l_discount) * (1 + l_tax)",
        header_value_col="o_totalprice",
        tolerance=0.01,
    ).to_pandas()
    return out.sort_values("key").reset_index(drop=True)


def q_charset_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc encoding-health counters (mojibake/control/replacement
    signals): ONE compiled-RE2 streaming pass, zero shuffle; every
    column an exact codepoint count (RE2 classes identical in Arrow
    and DuckDB)."""
    from .text import charset_profile

    out = charset_profile(f"{sf_dir}/documents.parquet").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_funnel_events(sf_dir: str) -> pd.DataFrame:
    """Ordered funnel (view → click → purchase, strict ts order,
    greedy-earliest step choice): per-batch relevance filter, one
    key-bucketed shuffle, vectorized per-step groupby-min sweeps."""
    from .relational import funnel_steps

    return funnel_steps(
        f"{sf_dir}/events.parquet", "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )


def q_cohort_retention_events(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort-retention triangle: distinct (key, week) combiner,
    ONE key-bucketed shuffle deriving cohorts + offsets locally, tiny
    global sum."""
    from .relational import cohort_retention

    out = cohort_retention(
        f"{sf_dir}/events.parquet", "user_id", "ts"
    ).to_pandas()
    out["cohort_week"] = out["cohort_week"].astype("datetime64[us]")
    return out.sort_values(["cohort_week", "week_offset"]).reset_index(
        drop=True
    )



def q_event_transitions_events(sf_dir: str) -> pd.DataFrame:
    """Markov transition counts of consecutive event types per user
    (ordered by ts with event_id tiebreak): ONE key-bucketed shuffle,
    per-bucket lexsort + shifted compare, tiny global sum."""
    from .relational import event_transitions

    out = event_transitions(
        f"{sf_dir}/events.parquet", "user_id", "ts", "event_type",
        tiebreak_col="event_id",
    ).to_pandas()
    return out.sort_values(["from_event", "to_event"]).reset_index(
        drop=True
    )


def q_cdc_apply_customer_events(sf_dir: str) -> pd.DataFrame:
    """CDC merge/upsert: events (latest per user by ts, event_id) act
    as a change log over the customer snapshot — 'error' events delete
    the key, others upsert its balance with the event value. ONE
    unioned key-bucketed shuffle does reduce + full-outer merge +
    apply."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from .relational import cdc_apply

    ch = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def mk(b: "pa.Table") -> "pa.Table":
        op = pc.if_else(
            pc.equal(b["event_type"], "error"),
            pa.scalar("D"), pa.scalar("U"),
        )
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
                "op": op,
                "value": b["value"],
            }
        )

    out = cdc_apply(
        f"{sf_dir}/customer.parquet",
        ch.map_batches(mk, batch_format="pyarrow"),
        key_col="user_id",
        snap_val_col="c_acctbal",
        seq_cols=["ts_us", "event_id"],
        op_col="op",
        val_col="value",
        snap_key_col="c_custkey",
    ).to_pandas()
    out["val"] = out["val"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)


def q_grouped_ols_events(sf_dir: str) -> pd.DataFrame:
    """Per-event-type OLS of value on event_id (REGR_SLOPE/INTERCEPT/
    R2/COUNT semantics): per-batch moment-sum partials, one bucketed
    merge, closed forms at the end."""
    from .profile import grouped_ols

    out = grouped_ols(
        f"{sf_dir}/events.parquet", ["event_type"], "event_id", "value"
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_key_skew_events(sf_dir: str) -> pd.DataFrame:
    """Shuffle-key skew profile of events.user_id: distinct keys, rows,
    top-1/top-10 share and the Gini coefficient of per-key counts —
    computed from the count-of-counts histogram so the driver never
    holds per-key state."""
    from .profile import key_skew_profile

    return key_skew_profile(f"{sf_dir}/events.parquet", "user_id")



def q_fuzzy_dup_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """Blocked fuzzy-duplicate pairs: docs sharing (lang, first-12-char
    prefix) pair up and survive on byte-Levenshtein ≤ 8 over their
    first 48 chars — ONE block-bucketed shuffle shipping 48-char
    compare strings, chunked numpy DP per bucket."""
    from .dedup import fuzzy_dup_pairs

    out = fuzzy_dup_pairs(
        f"{sf_dir}/documents.parquet", "doc_id", "text", ["lang"],
        prefix_len=12, cmp_len=48, max_dist=8,
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)



def q_boolean_search_documents(sf_dir: str) -> pd.DataFrame:
    """Inverted-index boolean retrieval: build the hive-sharded
    (token, doc_id) posting index once per sf under /tmp, then answer
    an AND query reading ONLY the shards its terms hash to."""
    import tempfile
    from pathlib import Path

    from .search import boolean_search, build_inverted_index

    tag = Path(sf_dir).name
    idx = f"{tempfile.gettempdir()}/graft_invidx_{tag}"
    if not Path(idx).exists():
        build_inverted_index(
            f"{sf_dir}/documents.parquet", idx, num_shards=16
        )
    out = boolean_search(
        idx, ["batch", "join", "filter"], mode="and"
    ).to_pandas()
    if "doc_id" not in out.columns:  # empty result loses schema
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)



def q_bm25_search_documents(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 over the sharded inverted index (tf postings +
    doclen sidecar): shard-pruned read, driver-side per-term idf (≤3
    rows), one bucketed doc-id join-and-score pass, per-bucket top-k
    then a tiny global merge."""
    import tempfile
    from pathlib import Path

    from .search import bm25_search, build_inverted_index

    tag = Path(sf_dir).name
    idx = f"{tempfile.gettempdir()}/graft_invidx_{tag}"
    if not Path(idx).exists():
        build_inverted_index(
            f"{sf_dir}/documents.parquet", idx, num_shards=16
        )
    return bm25_search(idx, ["batch", "join", "filter"], k=10)


def q_hybrid_search_documents(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieve-then-rerank (X7): BM25 top-50 lexical
    candidates over the sharded inverted index, joined to their
    embeddings and reranked by exact cosine against the vec_id=0
    query vector — the standard sparse-recall / dense-precision
    two-stage retrieval composition. Integer-only (rank, doc_id)
    output; ties break (cosine DESC, doc id ASC)."""
    import tempfile
    from pathlib import Path

    from .dedup import load_embeddings
    from .search import build_inverted_index, hybrid_search

    tag = Path(sf_dir).name
    idx = f"{tempfile.gettempdir()}/graft_invidx_{tag}"
    if not Path(idx).exists():
        build_inverted_index(
            f"{sf_dir}/documents.parquet", idx, num_shards=16
        )
    ids, M = load_embeddings(f"{sf_dir}/embeddings.parquet")
    qpos = int(np.searchsorted(ids, 0))
    return hybrid_search(
        idx,
        ["batch", "join", "filter"],
        M[qpos],
        f"{sf_dir}/embeddings.parquet",
        k_bm25=50,
        k=10,
    )



def q_stream_validate_events(sf_dir: str) -> pd.DataFrame:
    """Micro-batch streaming validation (S10, the reference's
    generated foreachBatch script): events split into 5 contiguous
    event-id micro-batches; each batch is validated (range rule with a
    0.998 threshold + completeness), filtered, and its clean rows
    appended under ``batch={id}/``, with per-batch summaries committed
    to an atomic checkpoint. Output: per-batch
    (n_rows, n_clean, passed_rules, failed_rules)."""
    import tempfile

    import ray.data

    from ..validator import RayDataValidator
    from .streaming import validate_microbatches

    full = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    hi = int(full.max("event_id")) + 1

    def make_slice(b: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids * 5) // hi == b))

        return f

    sources = [
        full.map_batches(make_slice(b), batch_format="pyarrow")
        for b in range(5)
    ]
    cfg = {
        "version": "1.0",
        "engine": {"type": "ray"},
        "tables": [
            {
                "name": "events",
                "rules": [
                    {
                        "name": "value_range",
                        "rule_type": "range",
                        "column": "value",
                        "parameters": {"min_value": 0, "max_value": 300},
                        "threshold": 0.998,
                    },
                    {
                        "name": "user_complete",
                        "rule_type": "completeness",
                        "column": "user_id",
                    },
                ],
            }
        ],
    }
    v = RayDataValidator(cfg)
    out_root = tempfile.mkdtemp(prefix="graft_stream_")
    return validate_microbatches(v, "events", sources, out_root)


def q_stream_validate_delta_events(sf_dir: str) -> pd.DataFrame:
    """The micro-batch streaming loop with the Delta sink: clean rows
    append to ONE Delta table per batch carrying the protocol's txn
    action (exactly-once on restart). Per-batch summaries are
    identical to the Parquet-sink variant, so it shares that oracle;
    n_clean here is recovered from each commit's add.stats metadata
    (the write path the oracle checks end-to-end)."""
    import tempfile

    import ray.data

    from ..validator import RayDataValidator
    from .streaming import validate_microbatches

    full = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    hi = int(full.max("event_id")) + 1

    def make_slice(b: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids * 5) // hi == b))

        return f

    sources = [
        full.map_batches(make_slice(b), batch_format="pyarrow")
        for b in range(5)
    ]
    cfg = {
        "version": "1.0",
        "engine": {"type": "ray"},
        "tables": [
            {
                "name": "events",
                "rules": [
                    {
                        "name": "value_range",
                        "rule_type": "range",
                        "column": "value",
                        "parameters": {"min_value": 0, "max_value": 300},
                        "threshold": 0.998,
                    },
                    {
                        "name": "user_complete",
                        "rule_type": "completeness",
                        "column": "user_id",
                    },
                ],
            }
        ],
    }
    v = RayDataValidator(cfg)
    out_root = tempfile.mkdtemp(prefix="graft_streamdelta_")
    return validate_microbatches(
        v, "events", sources, out_root, sink_format="delta"
    )


def q_delta_maintenance_events(sf_dir: str) -> pd.DataFrame:
    """Delta maintenance lifecycle end-to-end: events append in 4
    commits → stats-targeted DELETE of value in [100, 200] → OPTIMIZE
    (dataChange:false compaction) → VACUUM (physical cleanup of
    tombstoned files) → aggregate of what remains. The oracle checks
    that three mutating commits and a physical cleanup preserve
    exactly the logical complement of the deleted range."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data

    from ..sources import (
        delete_delta,
        optimize_delta,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    full = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    hi = int(full.max("event_id")) + 1

    def quarter(b: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids * 4) // hi == b))

        return f

    t = tempfile.mkdtemp(prefix="graft_deltamaint_")
    for b in range(4):
        write_delta(
            full.map_batches(quarter(b), batch_format="pyarrow"),
            t,
            mode="append",
        )
    delete_delta(t, "value", 100.0, 200.0)
    optimize_delta(t, target_rows_per_file=1 << 20)
    vacuum_delta(t)

    ds = read_delta(t, columns=["value"])

    def part(batch: pa.Table) -> pa.Table:
        v = batch["value"]
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "n_null": pa.array(
                    [batch.num_rows - v.drop_null().length()], pa.int64()
                ),
                "s": pa.array(
                    [pc.sum(v).as_py() or 0.0], pa.float64()
                ),
            }
        )

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "n_null": pd.Series([int(parts["n_null"].sum())], dtype="int64"),
            "sum_value": pd.Series(
                [round(float(parts["s"].sum()), 6)], dtype="float64"
            ),
        }
    )


def q_delta_cdc_events(sf_dir: str) -> pd.DataFrame:
    """Delta MERGE (upsert) end-to-end: the first half of events seeds
    a Delta table; a CDC batch covering [N/4, 3N/4) with value+1000
    merges on event_id — updating the overlap, inserting the rest —
    and the final table aggregates per event_type. The oracle is the
    closed-form of the upsert (CASE on the update boundary)."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data

    from ..sources import merge_delta, read_delta, write_delta

    full = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    hi = int(full.max("event_id")) + 1

    def id_range(lo: int, hi_: int, bump: float = 0.0):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            out = t.filter(pa.array((ids >= lo) & (ids < hi_)))
            if bump:
                out = out.set_column(
                    out.column_names.index("value"),
                    "value",
                    pc.add(out["value"], bump),
                )
            return out

        return f

    t = tempfile.mkdtemp(prefix="graft_deltacdc_")
    write_delta(
        full.map_batches(id_range(0, hi // 2), batch_format="pyarrow"), t
    )
    merge_delta(
        t,
        full.map_batches(
            id_range(hi // 4, 3 * hi // 4, bump=1000.0),
            batch_format="pyarrow",
        ),
        "event_id",
    )

    ds = read_delta(t, columns=["event_type", "value"])

    def clean(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b["event_type"]))

    agg = (
        ds.map_batches(clean, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("value"),
        )
        .to_pandas()
        .rename(columns={"count()": "n", "sum(value)": "sum_value"})
    )
    agg["n"] = agg["n"].astype("int64")
    agg["sum_value"] = agg["sum_value"].round(6)
    return agg.sort_values("event_type").reset_index(drop=True)


def q_grouped_ewma_events(sf_dir: str) -> pd.DataFrame:
    """Per-user EWMA (α=0.3, adjust=False seed) of event values
    ordered by (ts, event_id), evaluated in closed form so the SQL
    pow-window oracle shares float semantics; ONE key-bucketed
    shuffle, vectorized weights per bucket."""
    from .relational import grouped_ewma

    out = grouped_ewma(
        f"{sf_dir}/events.parquet", "user_id", ["ts", "event_id"],
        "value", alpha=0.3,
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_winsorize_events_value(sf_dir: str) -> pd.DataFrame:
    """Winsorize events.value at exact global p01/p99 (quantile_cont
    interpolation): distinct-bounded quantile reduce, then a streaming
    scalar clip."""
    from .relational import winsorize

    out = winsorize(
        f"{sf_dir}/events.parquet", "value", id_cols=["event_id"]
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)



def q_ppjoin_jaccard_documents(sf_dir: str) -> pd.DataFrame:
    """PPJoin prefix-filtered EXACT Jaccard ≥ 0.5 pairs: the
    pair-emitting inverted index runs over each doc's p smallest-hash
    prefix shingles only (every true pair provably shares a prefix
    shingle), then the MinHash-shared distributed verify pass scores
    candidates exactly. Same oracle as the all-shingle exact tier."""
    from .dedup import ppjoin_jaccard_pairs

    return ppjoin_jaccard_pairs(
        f"{sf_dir}/documents.parquet", threshold=0.5, num_buckets=16
    )



def q_interval_coverage_events(sf_dir: str) -> pd.DataFrame:
    """Per-user interval-union coverage: events become [ts, ts +
    floor(value) seconds) intervals; overlaps merge, output total
    covered microseconds + disjoint-island count per user. ONE
    key-bucketed shuffle, Cython grouped cummax per bucket."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from .relational import interval_coverage

    src = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def mk(b: "pa.Table") -> "pa.Table":
        t = b.filter(pc.is_valid(b["value"]))
        end = pc.add(
            pc.cast(t["ts"], pa.int64()),
            pc.multiply(
                pc.cast(pc.floor(t["value"]), pa.int64()),
                pa.scalar(1_000_000),
            ),
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "s": t["ts"],
                "e": pc.cast(end, pa.timestamp("us")),
            }
        )

    out = interval_coverage(
        src.map_batches(mk, batch_format="pyarrow"), "user_id", "s", "e"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)



def q_warc_source_documents(sf_dir: str) -> pd.DataFrame:
    """WARC-style crawl-archive ingestion end-to-end: documents round-
    trip through /tmp WARC files (Content-Length-framed records, one
    file per batch written in the map tasks, one file = one read
    split — the CC sharding convention), then parse back and emit
    (doc_id from url, text from payload). Byte-identical to the
    Parquet-side oracle, proving the framing survives payloads that
    contain record separators."""
    import shutil
    import tempfile
    from pathlib import Path

    import pyarrow.compute as pc
    import ray.data

    from ..sources import read_warc_like, write_warc_like

    tag = Path(sf_dir).name
    out = f"{tempfile.gettempdir()}/graft_warc_{tag}"
    if not Path(out).exists():
        def to_records(b: "pa.Table") -> "pa.Table":
            ids = b["doc_id"]
            url = pc.binary_join_element_wise(
                "https://ex.com/", pc.cast(ids, pa.string()), ""
            )
            pay = pc.cast(
                pc.fill_null(pc.cast(b["text"], pa.string()), ""),
                pa.binary(),
            )
            ts = pc.cast(
                pc.multiply(pc.cast(ids, pa.int64()), 1_000_000),
                pa.timestamp("us"),
            )
            return pa.table(
                {"url": url, "warc_ts": ts, "payload": pay}
            )

        tmp = out + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        write_warc_like(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(to_records, batch_format="pyarrow"),
            tmp,
        )
        shutil.move(tmp, out)

    ds = read_warc_like(out)

    def parse(b: "pa.Table") -> "pa.Table":
        doc_id = pc.cast(
            pc.utf8_replace_slice(b["url"], 0, len("https://ex.com/"), ""),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": doc_id,
                "text": pc.cast(b["payload"], pa.string()),
                # non-negative epochs: truncating divide == floor here
                "warc_epoch_s": pc.divide(
                    pc.cast(b["warc_ts"], pa.int64()), 1_000_000
                ),
            }
        )

    outdf = ds.map_batches(parse, batch_format="pyarrow").to_pandas()
    return outdf.sort_values("doc_id").reset_index(drop=True)


def q_delta_source_events(sf_dir: str) -> pd.DataFrame:
    """Delta Lake source end-to-end (S7, open transaction protocol):
    events write into a /tmp Delta table PARTITIONED BY event_type over
    three commits — first half, appended second half, then an
    OVERWRITE keeping only value <= 300 (tombstoning every prior file)
    — and the final table reads back through the log replay with
    partition values re-attached from the log. Aggregate must equal
    the Parquet-side oracle over the overwrite predicate."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data

    from ..sources import read_delta, write_delta

    events = f"{sf_dir}/events.parquet"
    full = ray.data.read_parquet(
        events, columns=["event_id", "event_type", "value"]
    )
    hi = int(full.max("event_id")) + 1

    def half(first: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["event_id"].to_numpy(zero_copy_only=False)
            m = ids < hi // 2 if first else ids >= hi // 2
            return b.filter(pa.array(m)).drop_columns(["event_id"])

        return f

    def low_value(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(b["event_type"]),
            pc.less_equal(b["value"], 300.0),
        )
        return b.filter(keep).drop_columns(["event_id"])

    t = tempfile.mkdtemp(prefix="graft_delta_")
    write_delta(
        full.map_batches(half(True), batch_format="pyarrow"),
        t, partition_cols=["event_type"],
    )
    write_delta(
        full.map_batches(half(False), batch_format="pyarrow"),
        t, mode="append", partition_cols=["event_type"],
    )
    write_delta(
        full.map_batches(low_value, batch_format="pyarrow"),
        t, mode="overwrite", partition_cols=["event_type"],
    )

    ds = read_delta(t, columns=["event_type", "value"])
    agg = (
        ds.groupby("event_type")
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("value"),
        )
        .to_pandas()
        .rename(columns={"count()": "n", "sum(value)": "sum_value"})
    )
    agg["n"] = agg["n"].astype("int64")
    agg["sum_value"] = agg["sum_value"].round(6)
    return agg.sort_values("event_type").reset_index(drop=True)


def q_orc_source_events(sf_dir: str) -> pd.DataFrame:
    """ORC source end-to-end: events round-trip through a /tmp ORC
    file (stripe-streaming custom datasource), then a pruned-column
    grouped aggregate — values must equal the Parquet-side oracle."""
    import tempfile
    from pathlib import Path

    import pyarrow.compute as pc
    import ray.data

    from ..sources import read_orc, write_orc

    tag = Path(sf_dir).name
    p = f"{tempfile.gettempdir()}/graft_events_{tag}.orc"
    if not Path(p).exists():
        write_orc(
            ray.data.read_parquet(f"{sf_dir}/events.parquet"), p
        )
    ds = read_orc(p, columns=["event_type", "value"])

    def clean(b: "pa.Table") -> "pa.Table":
        return b.filter(pc.is_valid(b["event_type"]))

    agg = (
        ds.map_batches(clean, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("value"),
        )
        .to_pandas()
        .rename(columns={"count()": "n", "sum(value)": "sum_value"})
    )
    agg["n"] = agg["n"].astype("int64")
    agg["sum_value"] = agg["sum_value"].round(6)
    return agg.sort_values("event_type").reset_index(drop=True)


def q_parse_logs_events(sf_dir: str) -> pd.DataFrame:
    """Raw-text-log source end-to-end: events render to deterministic
    log lines in /tmp, ``read_text`` + ONE vectorized extract_regex
    pass parses them back to typed columns, grouped aggregate must
    equal the Parquet-side oracle (floats round-trip via shortest
    repr)."""
    import tempfile
    from pathlib import Path

    import pyarrow as pa

    from ..sources import read_text_logs

    tag = Path(sf_dir).name
    p = f"{tempfile.gettempdir()}/graft_events_{tag}.log"
    if not Path(p).exists():
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "event_type", "user_id", "value"],
        ).dropna()
        lines = (
            "ts_us="
            + ev["ts"].astype("datetime64[us]").astype("int64").astype(str)
            + " level=" + ev["event_type"]
            + " user=" + ev["user_id"].astype("int64").astype(str)
            + " val=" + ev["value"].astype(str)
        )
        Path(p).write_text("\n".join(lines.tolist()) + "\n")
    pat = (
        r"ts_us=(?P<ts_us>-?\d+) level=(?P<level>\w+) "
        r"user=(?P<user>\d+) val=(?P<val>[-+0-9.e]+)"
    )
    ds = read_text_logs(
        p, pat,
        dtypes={"ts_us": pa.int64(), "user": pa.int64(),
                "val": pa.float64()},
    )
    out = (
        ds.groupby("level")
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("val"),
            ray.data.aggregate.Min("ts_us"),
            ray.data.aggregate.Max("ts_us"),
        )
        .to_pandas()
        .rename(
            columns={
                "count()": "n", "sum(val)": "sum_val",
                "min(ts_us)": "min_ts_us", "max(ts_us)": "max_ts_us",
            }
        )
    )
    out["n"] = out["n"].astype("int64")
    out["sum_val"] = out["sum_val"].round(6)
    return out.sort_values("level").reset_index(drop=True)



def q_table_checksum_events(sf_dir: str) -> pd.DataFrame:
    """Order-independent table checksum (Σ md5-lower-64 of canonical
    row strings mod 2^64 + row count): per-batch single-row partials,
    driver folds the tiny stream — the cross-environment migration
    reconciliation primitive."""
    from .integrity import table_checksum

    return table_checksum(
        f"{sf_dir}/events.parquet",
        ["event_id", "ts", "event_type", "user_id"],
    )


def q_schema_diff_events(sf_dir: str) -> pd.DataFrame:
    """Schema diff (added/removed/changed/same per column, DuckDB type
    names) between events and an altered projection — metadata only,
    zero data rows move."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from .integrity import schema_diff

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")

    def alter(b: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "value": pc.cast(b["value"], pa.string()),
                "extra_col": pa.array([1] * b.num_rows, pa.int64()),
            }
        )

    return schema_diff(
        f"{sf_dir}/events.parquet",
        ds.map_batches(alter, batch_format="pyarrow"),
    )



def q_time_weighted_avg_events(sf_dir: str) -> pd.DataFrame:
    """Per-user time-weighted average of value under step
    interpolation (sensor/price semantics): ONE key-bucketed shuffle,
    shifted-difference durations + reduceat per bucket."""
    from .relational import time_weighted_avg

    out = time_weighted_avg(
        f"{sf_dir}/events.parquet", "user_id", "ts", "value"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_benford_events_value(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit profile of events.value (observed vs
    n·log10(1+1/d) expectation + per-digit χ² term): 9-bin per-batch
    combiner, driver folds 9-int partials. Mantissa extraction uses
    only exactly-representable positive powers of ten so numpy and
    the SQL oracle agree bit-for-bit."""
    from .profile import benford_digits

    return benford_digits(f"{sf_dir}/events.parquet", "value")


def q_null_rate_by_day_events(sf_dir: str) -> pd.DataFrame:
    """Completeness drift monitor: per-day row count + null count/rate
    for value and user_id — per-batch day-grouped partials, one tiny
    global groupby."""
    from .profile import null_rate_by_period

    out = null_rate_by_period(
        f"{sf_dir}/events.parquet", "ts", ["value", "user_id"]
    ).to_pandas()
    out["day"] = pd.to_datetime(out["day"])
    return out.sort_values("day").reset_index(drop=True)



def q_association_rules_events(sf_dir: str) -> pd.DataFrame:
    """Market-basket pair stats (support/confidence/lift) over each
    user's distinct event types: per-batch distinct combiner, ONE
    key-bucketed shuffle emits basket pairs, vocabulary-bounded
    reductions."""
    from .relational import association_rules

    return association_rules(
        f"{sf_dir}/events.parquet", "user_id", "event_type"
    )



def q_throttle_dedup_events(sf_dir: str) -> pd.DataFrame:
    """Event-stream debounce: drop events whose same (user, type)
    predecessor is within 1h (LAG semantics, first always kept) — ONE
    key-bucketed shuffle, shifted-difference gaps per bucket."""
    from .relational import throttle_dedup

    out = throttle_dedup(
        f"{sf_dir}/events.parquet", ["user_id", "event_type"], "ts",
        window_seconds=3600, id_col="event_id",
    ).to_pandas()
    return out[["event_id"]].sort_values("event_id").reset_index(
        drop=True
    )



def q_grouped_cusum_events(sf_dir: str) -> pd.DataFrame:
    """Per-user CUSUM change-detection excursions of value (centered
    cumulative sums): ONE key-bucketed shuffle, Cython grouped cumsum
    per bucket; the n-scaled formulation (dev·n = n·cs − rank·total)
    keeps engine and SQL float semantics bit-identical."""
    from .relational import grouped_cusum

    out = grouped_cusum(
        f"{sf_dir}/events.parquet", "user_id", ["ts", "event_id"],
        "value",
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)



def q_keyset_overlap_events_customer(sf_dir: str) -> pd.DataFrame:
    """Referential coverage: distinct-key overlap between
    events.user_id and customer.c_custkey (Jaccard + containments) —
    per-batch pc.unique partials, ONE keyed reduction, driver holds
    five integers."""
    from .integrity import keyset_overlap

    return keyset_overlap(
        f"{sf_dir}/events.parquet", "user_id",
        f"{sf_dir}/customer.parquet", "c_custkey",
    )


def q_kmv_overlap_events_customer(sf_dir: str) -> pd.DataFrame:
    """APPROX key-overlap tier: KMV (k-minimum-values) sketches replace
    the exact groupby exchange with fixed 32 KiB partials — ~1/√k
    error at scale, EXACT below k distinct keys (this test scale, so
    the oracle compares exactly)."""
    from .integrity import kmv_overlap

    return kmv_overlap(
        f"{sf_dir}/events.parquet", "user_id",
        f"{sf_dir}/customer.parquet", "c_custkey",
        k=4096,
    )



def q_pmi_collocations_documents(sf_dir: str) -> pd.DataFrame:
    """Top-20 adjacent-token collocations by PMI (min count 5):
    per-batch bigram+unigram combiner, vocabulary-bounded sums,
    driver-side PMI on the small pair table."""
    from .text import pmi_collocations

    return pmi_collocations(
        f"{sf_dir}/documents.parquet", k=20, min_count=5
    )



def q_top_users_by_type_events(sf_dir: str) -> pd.DataFrame:
    """Composition query: aggregate (type, user) value sums, then the
    per-type top-3 users — grouped_top_k consuming a grouped-aggregate
    Dataset, the aggregate-then-QUALIFY pattern in two existing
    operators with no driver collect in between."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from .relational import grouped_top_k

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"],
    )

    def clean(b: "pa.Table") -> "pa.Table":
        m = pc.and_(
            pc.is_valid(b["event_type"]), pc.is_valid(b["user_id"])
        )
        return b.filter(m)

    agg = (
        ds.map_batches(clean, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .sum("value")
    )

    def rounded(b: "pa.Table") -> "pa.Table":
        v = b["sum(value)"].to_numpy(zero_copy_only=False)
        import numpy as np

        return pa.table(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"],
                "total_value": pa.array(np.round(v, 6)),
            }
        )

    agg = agg.map_batches(rounded, batch_format="pyarrow")
    out = grouped_top_k(
        agg, ["event_type"], "total_value", 3,
        tiebreak_cols=["user_id"],
    ).to_pandas()
    return out.sort_values(
        ["event_type", "total_value", "user_id"],
        ascending=[True, False, True],
    ).reset_index(drop=True)



def q_quantize_embeddings(sf_dir: str) -> pd.DataFrame:
    """Int8 scalar-quantization audit per vector (min/max/scale +
    reconstruction MSE, half-up code rounding): pure per-batch
    map_batches, zero shuffle — the pre-indexing compression check."""
    from .similarity import quantize_embeddings

    out = quantize_embeddings(f"{sf_dir}/embeddings.parquet").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)



def q_containment_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """Asymmetric containment near-dups (|A∩B|/min ≥ 0.6 — quote/
    subset detection Jaccard misses): the join-free shingle pair
    machinery with a containment gate."""
    from .dedup import containment_pairs

    return containment_pairs(
        f"{sf_dir}/documents.parquet", threshold=0.6
    )


def q_psi_by_group_events(sf_dir: str) -> pd.DataFrame:
    """Per-event_type fixed-bin PSI between the even- and odd-event_id
    halves — the sliced drift monitor (a shift confined to one slice
    is invisible to the global PSI). Exchange is groups × bins tidy
    partial rows; one bucketed groupby computes every group's PSI."""
    import pyarrow.compute as _pc

    from ..stages.drift import psi_by_group

    edges = [float(x) for x in range(0, 101, 10)]

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    out = psi_by_group(
        side(0), side(1), "value", "event_type", edges
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_ks_by_group_events(sf_dir: str) -> pd.DataFrame:
    """Per-event_type exact two-sample KS between the even/odd halves
    (the sliced sibling of ks_events_split)."""
    import pyarrow.compute as _pc

    from ..stages.drift import ks_by_group

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    out = ks_by_group(side(0), side(1), "value", "event_type").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_ks_events_split(sf_dir: str) -> pd.DataFrame:
    """EXACT two-sample KS between the even- and odd-event_id halves
    of events.value (distributed range-partitioned prefix scan;
    cumulative-count/total divisions identical to the window-function
    oracle, so the statistic is bit-exact)."""
    import pyarrow.compute as _pc

    from ..stages.drift import ks_exact

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    return ks_exact(side(0), side(1), "value", num_buckets=32).to_pandas()


def q_ks_auto_events_split(sf_dir: str) -> pd.DataFrame:
    """ks_exact with quantize='auto': the distinct-count estimate
    (one sampled pre-pass) stays under the threshold on this column,
    so auto resolves to the bit-exact path — pinning the whole
    auto-quantize plumbing to the same exact SQL oracle. Above the
    threshold the same call snaps to a deterministic ~2^20 lattice
    with the documented ≤ q/2-per-value error envelope."""
    import pyarrow.compute as _pc

    from ..stages.drift import ks_exact

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    return ks_exact(
        side(0), side(1), "value", num_buckets=32, quantize="auto"
    ).to_pandas()


def q_wasserstein_events_split(sf_dir: str) -> pd.DataFrame:
    """EXACT 1-D Wasserstein-1 (earth-mover) distance between the
    even- and odd-event_id halves of events.value — the
    magnitude-aware drift statistic (same distributed prefix scan as
    ks_events_split; per-term float math identical to the SQL window
    oracle, ROUND 6)."""
    import pyarrow.compute as _pc

    from ..stages.drift import wasserstein_exact

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    return wasserstein_exact(
        side(0), side(1), "value", num_buckets=32
    ).to_pandas()


def q_paragraph_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide paragraph (segment) dedup over documents — C4/
    RefinedWeb line dedup. The testdata text has no newlines, so the
    segment separator is the frequent token boundary ``' the '``
    (2.5 segments/doc, 54 cross-doc duplicate segments at sf0.01)."""
    from .dedup import paragraph_dedup

    out = paragraph_dedup(
        f"{sf_dir}/documents.parquet", sep=" the "
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_seeded_shuffle_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic global training-order shuffle: seeded modular
    key + global rank (range-partitioned prefix scan — only bucket
    counts reach the driver). Same seed ⇒ same epoch order on any
    layout; pinned bit-exact against the SQL key+ROW_NUMBER mirror."""
    from .curation import seeded_shuffle

    out = seeded_shuffle(
        f"{sf_dir}/documents.parquet", seed=7, columns=["doc_id", "lang"]
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_domain_gate_documents(sf_dir: str) -> pd.DataFrame:
    """Whole-domain quality gate (spam-domain removal): drop EVERY doc
    of a domain whose mean ``n_chars`` < 280 — a domain-level verdict
    no per-doc filter makes. One #domains-bounded combiner shuffle,
    verdict table broadcast once, streaming filter."""
    from .urls import domain_aggregate_gate

    out = domain_aggregate_gate(
        f"{sf_dir}/documents.parquet",
        domain_col="source",
        value_col="n_chars",
        min_mean=280.0,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_domain_boilerplate_documents(sf_dir: str) -> pd.DataFrame:
    """Domain-frequency boilerplate removal (CCNet/RefinedWeb/Dolma
    hygiene): drop EVERY occurrence of a segment appearing in ≥ 5
    distinct docs of the same domain (``source``). The testdata text
    has no newlines, so the segment separator is ``' '`` — the gate
    then behaves as per-domain common-token removal, exercising the
    full (domain, segment)-scoped count + drop-all + reassembly path."""
    from .dedup import domain_boilerplate_removal

    out = domain_boilerplate_removal(
        f"{sf_dir}/documents.parquet", sep=" ", min_docs=5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_suggest_rules_events(sf_dir: str) -> pd.DataFrame:
    """Constraint suggestion over events (deequ ConstraintSuggestion
    analog): completeness for NULL-free columns, [min,max] ranges for
    numerics, exact-distinct membership enums for small string
    domains, and uniqueness where exact distinct == non-null count
    (HLL only GATES the exact-distinct shuffle; every decision is
    exact, so the SQL reconstruction matches)."""
    from ..stages.suggest import suggest_rules

    out = suggest_rules(f"{sf_dir}/events.parquet").to_pandas()
    return out.sort_values(["column", "rule_type"]).reset_index(drop=True)


def q_zorder_events(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) clustering key over events (value × user_id,
    8-bit grids): the multi-dimensional locality layout a 100-TB table
    needs for 2-D range pruning. Returns every row's interleaved key;
    the engine's reorder is a Ray range-partitioned sort on that key
    (rows come back sorted by it). Bit-identical to the SQL
    bit-arithmetic oracle (same IEEE scaling expression)."""
    from .layout import zorder_sort

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    out = zorder_sort(
        ds, ["value", "user_id"], bits=8, keep_key=True
    ).to_pandas()
    out = out.rename(columns={"__z": "zval"})[["event_id", "zval"]]
    return out.sort_values(["zval", "event_id"]).reset_index(drop=True)


def q_incremental_agg_orders_events(sf_dir: str) -> pd.DataFrame:
    """Incremental maintenance of the per-priority orders aggregate
    under an events-derived CDC log (latest change per key wins;
    'error' deletes, others upsert the row into their event_type
    group). Only changed keys' old rows leave the base scan
    (broadcast membership filter); values aggregate in exact int64
    cents so retract/apply is association-free. Oracle = full
    recompute over the applied change log."""
    from .relational import incremental_aggregate

    ch = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    )

    def mk(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy(zero_copy_only=False)
        keep = pc.is_valid(b["value"])
        t = pa.table(
            {
                "o_orderkey": pa.array(ev % 4000, pa.int64()),
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "eid": b["event_id"],
                "op": pc.if_else(
                    pc.equal(b["event_type"], "error"),
                    pa.scalar("D"), pa.scalar("U"),
                ),
                "etype": b["event_type"],
                "val": b["value"],
            }
        )
        return t.filter(keep)

    out = incremental_aggregate(
        f"{sf_dir}/orders.parquet",
        ch.map_batches(mk, batch_format="pyarrow"),
        key_col="o_orderkey",
        group_col="o_orderpriority",
        val_col="o_totalprice",
        op_col="op",
        seq_cols=["ts_us", "eid"],
        change_group_col="etype",
        change_val_col="val",
    ).to_pandas()
    out.columns = ["grp", "sum_units", "cnt"]
    return out.sort_values("grp").reset_index(drop=True)


def q_union_by_name_events(sf_dir: str) -> pd.DataFrame:
    """Schema-evolution read: two Parquet generations derived from
    events (v1: event_id, event_type, value for even ids; v2:
    event_id, user_id, value with value widened via an int cast for
    odd ids) stream out under ONE unified-by-name schema with typed
    NULLs for the missing columns — DuckDB
    read_parquet(union_by_name) semantics, metadata-only unification."""
    import os

    import pyarrow.parquet as papq

    from ..sources import read_parquet_union_by_name

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/graft_union_demo_{tag}"
    os.makedirs(base, exist_ok=True)
    t = papq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id", "event_type", "user_id", "value"])
    even = pc.equal(pc.bit_wise_and(t["event_id"], 1), 0)
    papq.write_table(
        t.filter(even).select(["event_id", "event_type", "value"]),
        f"{base}/gen1.parquet",
    )
    odd = t.filter(pc.invert(even)).select(["event_id", "user_id", "value"])
    odd = odd.set_column(
        2, "value", pc.cast(pc.trunc(odd["value"]), pa.int32())
    )
    papq.write_table(odd, f"{base}/gen2.parquet")

    ds = read_parquet_union_by_name(
        [f"{base}/gen1.parquet", f"{base}/gen2.parquet"]
    )
    out = ds.to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_interpolate_events_value(sf_dir: str) -> pd.DataFrame:
    """Per-user linear interpolation of gapped values (every 7th
    event's value masked NULL, then repaired from its nearest non-NULL
    neighbours in (ts, event_id) order; timestamps as exact int64
    microseconds so the ratio is bit-identical to the epoch_us
    oracle; interior-only, ROUND 6)."""
    from .relational import interpolate_missing

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def mask(batch: pa.Table) -> pa.Table:
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        cond = pa.array(ev % 7 == 0)
        return batch.set_column(
            batch.schema.get_field_index("value"),
            "value",
            pc.if_else(cond, pa.scalar(None, pa.float64()), batch["value"]),
        )

    masked = ds.map_batches(mask, batch_format="pyarrow")
    out = interpolate_missing(
        masked, "user_id", "ts", "value", tiebreak_cols=["event_id"]
    ).to_pandas()
    out = out[["event_id", "user_id", "value", "value_interp"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_running_window_events(sf_dir: str) -> pd.DataFrame:
    """Per-user running window over events ordered by (ts, event_id):
    ROW_NUMBER, cumulative SUM(value) (ROWS UNBOUNDED PRECEDING,
    ROUND 6), LAG(value)."""
    from .relational import running_window

    out = running_window(
        f"{sf_dir}/events.parquet",
        "user_id",
        ["ts", "event_id"],
        "value",
    ).to_pandas()
    return out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )


def q_moving_window_events(sf_dir: str) -> pd.DataFrame:
    """Per-user moving window (ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW) over events ordered by (ts, event_id): trailing sum/avg
    (ROUND 6), min/max and non-NULL count."""
    from .relational import moving_window

    out = moving_window(
        f"{sf_dir}/events.parquet",
        "user_id",
        ["ts", "event_id"],
        "value",
        preceding=3,
    ).to_pandas()
    return out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )


def q_late_window_aggregate_events(sf_dir: str) -> pd.DataFrame:
    """Streaming-semantics tumbling window with ALLOWED LATENESS
    (deterministic batch replay): per-user running-max(ts) watermark in
    arrival order; rows older than watermark − 14 days are excluded
    from their day window's sum but counted as late. The testdata's
    events arrive in perfect ts order, so arrival is a deterministic
    Knuth permutation of event_id (a bijection mod 2³², SQL-exact) to
    exercise real disorder — ~38 % of rows land late at sf0.01."""
    import pyarrow.compute as _pc

    from .relational import windowed_aggregate_with_lateness

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).map_batches(
        lambda b: b.append_column(
            "__arrival",
            _pc.add(
                _pc.multiply(
                    # (id*KNUTH) % 2^32 in int64 (ids < 2^32 so no wrap),
                    # scaled <<20 then + id: total order, SQL-identical
                    _pc.bit_wise_and(
                        _pc.multiply(b["event_id"], 2654435761),
                        4294967295,  # == % 2^32 (power-of-two mod)
                    ),
                    1048576,
                ),
                b["event_id"],
            ),
        ),
        batch_format="pyarrow",
    )
    out = windowed_aggregate_with_lateness(
        ds,
        "user_id",
        "__arrival",
        "ts",
        "value",
        window_seconds=86400,
        allowed_lateness_seconds=14 * 86400,
    ).to_pandas()
    return out.sort_values("window_start").reset_index(drop=True)


def q_daily_active_users_events(sf_dir: str) -> pd.DataFrame:
    """Exact DAU: distinct user_id per day (per-batch pair combiner,
    pair-bounded exchange)."""
    from .relational import period_distinct

    out = period_distinct(
        f"{sf_dir}/events.parquet", "ts", "user_id", unit="day"
    ).to_pandas()
    return out.sort_values("period_start").reset_index(drop=True)


def q_weekly_active_users_events(sf_dir: str) -> pd.DataFrame:
    """Exact rolling 7-day active users as of each active day: distinct
    (day, user) pairs fan out to their ≤7 covering windows, one dedupe
    groupby closes it (pair×window-bounded, never raw events)."""
    from .relational import rolling_period_distinct

    out = rolling_period_distinct(
        f"{sf_dir}/events.parquet", "ts", "user_id", window_periods=7
    ).to_pandas()
    return out.sort_values("period_start").reset_index(drop=True)


def q_tpch_q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 composition (order priority variant): customer ⋈ orders ⋈
    lineitem with date/segment filters, revenue per order in exact
    fixed-point units, top-10 by (revenue DESC, orderdate) — two
    bucketed joins + one combiner groupby + partial top-k."""
    import pyarrow.compute as _pc

    from .relational import hash_join, top_k_rows

    SEG = "BUILDING"
    CUT = pd.Timestamp("1995-03-15")

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.filter(_pc.equal(b["c_mktsegment"], SEG)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(
            _pc.less(b["o_orderdate"], pa.scalar(CUT))
        ),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: b.filter(
            _pc.greater(b["l_shipdate"], pa.scalar(CUT))
        ),
        batch_format="pyarrow",
    )

    co = hash_join(
        orders, cust,
        left_key="o_custkey", right_key="c_custkey",
        left_cols=["o_orderkey", "o_orderdate", "o_orderpriority"],
        right_cols=["c_custkey"],
        how="inner",
    )
    col = hash_join(
        li, co,
        left_key="l_orderkey", right_key="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderdate", "o_orderpriority"],
        how="inner",
    )

    def revenue_units(b: pa.Table) -> pa.Table:
        # exact fixed-point: price has 2 decimals, discount 2 ->
        # price*(1-disc) has 4; FLOOR(x*1e4+0.5) int64 units are
        # bit-identical to the SQL expression
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = b["l_discount"].to_numpy(zero_copy_only=False)
        units = np.floor(p * (1.0 - d) * 1e4 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "o_orderdate": b["o_orderdate"],
                "o_orderpriority": b["o_orderpriority"],
                "rev_units": pa.array(units, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        col.map_batches(revenue_units, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("rev_units", alias_name="rev_units"))
    )
    top = top_k_rows(
        agg, "rev_units", 10, descending=True,
        tiebreak_cols=["o_orderdate", "l_orderkey"],
    )
    top["revenue"] = np.round(top["rev_units"].astype(np.float64) / 1e4, 4)
    top = top.drop(columns="rev_units")
    return top.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True],
    ).reset_index(drop=True)


def q_period_over_period_events(sf_dir: str) -> pd.DataFrame:
    """Day-over-day value-sum growth (date_trunc parity, LAG on the
    period-bounded result; gap days skip — SQL LAG convention)."""
    from .relational import period_over_period

    return period_over_period(
        f"{sf_dir}/events.parquet", "ts", "value", unit="day"
    )


def q_float_anomaly_events(sf_dir: str) -> pd.DataFrame:
    """Float-hygiene audit over the clean value column plus a derived
    deterministically-dirty one (NaN/±Inf/zero/negative planted by
    event_id band — constructed identically in both engines)."""
    import pyarrow.compute as _pc

    from .profile import float_anomaly_profile

    def derive(b: pa.Table) -> pa.Table:
        m = _pc.cast(_pc.bit_wise_and(b["event_id"], 7), pa.int64())

        def const(x):
            return pa.scalar(x, pa.float64())

        dirty = _pc.if_else(
            _pc.equal(m, 0), const(float("inf")),
            _pc.if_else(
                _pc.equal(m, 1), const(float("-inf")),
                _pc.if_else(
                    _pc.equal(m, 2), const(float("nan")),
                    _pc.if_else(
                        _pc.equal(m, 3), const(0.0),
                        _pc.if_else(
                            _pc.equal(m, 4), const(-1.5),
                            _pc.if_else(
                                _pc.equal(m, 5),
                                pa.scalar(None, pa.float64()),
                                _pc.cast(b["value"], pa.float64()),
                            ),
                        ),
                    ),
                ),
            ),
        )
        return b.select(["value"]).append_column("dirty_float", dirty)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(derive, batch_format="pyarrow")
    return float_anomaly_profile(ds, ["value", "dirty_float"])


def q_top_users_plus_other_events(sf_dir: str) -> pd.DataFrame:
    """Per-event-type top-3 users by summed value plus one <other>
    rollup row — the bounded-size dashboard breakdown; (group, key)-
    bounded combiner, raw rows never shuffle."""
    from .relational import top_n_plus_other

    out = top_n_plus_other(
        f"{sf_dir}/events.parquet", "event_type", "user_id", "value", n=3
    ).to_pandas()
    return out.sort_values(
        ["event_type", "key_out"]
    ).reset_index(drop=True)


def q_group_split_events(sf_dir: str) -> pd.DataFrame:
    """LEAKAGE-FREE splits: events keyed by user_id (not row id), so
    every row of a user lands in the same split by construction; the
    report shows per-split row AND user counts, with the oracle
    verifying no user straddles splits (distinct (user, split) pairs
    == distinct users)."""
    from .curation import assign_splits

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    labeled = assign_splits(
        ds, {"train": 800, "val": 100, "test": 100}, id_col="user_id"
    )

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.select(["split", "user_id"]).group_by(
            ["split", "user_id"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["split", "user_id", "n"])

    from ray.data.aggregate import Sum

    per_user = (
        labeled.map_batches(counts, batch_format="pyarrow")
        .groupby(["split", "user_id"])
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()  # splits × users bounded
    )
    out = (
        per_user.groupby("split")
        .agg(n_rows=("n_rows", "sum"), n_users=("user_id", "nunique"))
        .reset_index()
        .astype({"n_rows": "int64", "n_users": "int64"})
    )
    return out.sort_values("split").reset_index(drop=True)


def q_histogram2d_lineitem(sf_dir: str) -> pd.DataFrame:
    """Joint quantity×discount density heatmap: flattened bincount
    combiner per batch, cells-bounded merge, IEEE-identical bin edges."""
    from .profile import histogram2d

    out = histogram2d(
        f"{sf_dir}/lineitem.parquet",
        "l_quantity", "l_discount",
        x_lo=0.0, x_hi=50.0, y_lo=0.0, y_hi=0.1,
        n_bins_x=10, n_bins_y=5,
    ).to_pandas()
    return out.sort_values(["bin_x", "bin_y"]).reset_index(drop=True)


def q_extract_all_numbers_events(sf_dir: str) -> pd.DataFrame:
    """Scraper-style extract-ALL: every digit run in events.props
    exploded to (event_id, match_idx, match) with in-document order
    preserved — one Rust-regex pass per batch."""
    from .relational import regex_extract_all

    out = regex_extract_all(
        f"{sf_dir}/events.parquet", "event_id", "props", "[0-9]+"
    ).to_pandas()
    return out.sort_values(["event_id", "match_idx"]).reset_index(drop=True)


def q_negative_samples_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic contrastive negatives: 3 modular-arithmetic
    partner ids per doc (RNG-free, partition-independent, SQL-exact)."""
    from .curation import negative_samples

    out = negative_samples(
        f"{sf_dir}/documents.parquet", "doc_id", 3
    ).to_pandas()
    return out.sort_values(["doc_id", "neg_rank"]).reset_index(drop=True)


def q_metric_anomaly_events(sf_dir: str) -> pd.DataFrame:
    """deequ-style run-over-run anomaly check: three 'historical runs'
    (event_id%4 slices 0–2) append their range-rule success rates to a
    durable metrics history, then slice 3's rate is z-scored against
    that history (|z| ≤ 3 passes)."""
    import shutil
    import tempfile

    import pyarrow.compute as _pc

    from ..state.metrics_history import MetricsHistory, metric_anomaly_check

    rule = ValidationRule(
        name="value_band", rule_type="range", column="value",
        parameters={"min_value": 0, "max_value": 100},
    )
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "events", "rules": [rule.model_dump()]}],
    )

    def slice_rate(mod: int) -> float:
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        ).map_batches(
            lambda b, m=mod: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 3), m)
            ),
            batch_format="pyarrow",
        )
        r = RayDataValidator(cfg).validate_table(ds, "events").results[0]
        return r.success_rate

    work = tempfile.mkdtemp(prefix="graft_mhist_", dir="/tmp")
    try:
        hist = MetricsHistory(f"{work}/hist")
        for m in (0, 1, 2):
            hist.append(f"run{m}", {"events.value_band.success_rate":
                                    slice_rate(m)})
        cur = slice_rate(3)
        res = metric_anomaly_check(
            hist, "events.value_band.success_rate", cur, k=3.0
        )
        return pd.DataFrame(
            {
                "n_runs": pd.array([res["n_runs"]], dtype="int64"),
                "mean_rate": [res["mean"]],
                "std_rate": [res["std"]],
                "current_rate": [round(cur, 6)],
                "z": [res["z"]],
                "passed": [res["passed"]],
            }
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_multi_table_summary(sf_dir: str) -> pd.DataFrame:
    """One config, THREE tables (events/orders/customer) through
    validate_all_tables — the job surface the CLI drives — with the
    per-rule counts flattened; oracle reproduces every rule's count."""
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[
            {
                "name": "events",
                "rules": [
                    ValidationRule(
                        name="ev_value_range", rule_type="range",
                        column="value",
                        parameters={"min_value": 0, "max_value": 150},
                    ).model_dump(),
                    ValidationRule(
                        name="ev_type_complete", rule_type="completeness",
                        column="event_type",
                    ).model_dump(),
                ],
            },
            {
                "name": "orders",
                "rules": [
                    ValidationRule(
                        name="ord_status_member", rule_type="membership",
                        column="o_orderstatus",
                        parameters={"values": ["O", "F"]},
                    ).model_dump(),
                ],
            },
            {
                "name": "customer",
                "rules": [
                    ValidationRule(
                        name="cust_key_unique", rule_type="uniqueness",
                        column="c_custkey",
                    ).model_dump(),
                ],
            },
        ],
    )
    v = RayDataValidator(cfg)
    summaries = v.validate_all_tables(
        {
            "events": f"{sf_dir}/events.parquet",
            "orders": f"{sf_dir}/orders.parquet",
            "customer": f"{sf_dir}/customer.parquet",
        }
    )
    rows = []
    for tname in ("events", "orders", "customer"):
        for r in summaries[tname].results:
            rows.append(
                {
                    "table_name": tname,
                    "rule_name": r.rule_name,
                    "total_count": r.total_count,
                    "failed_count": r.failed_count,
                }
            )
    out = pd.DataFrame(rows).astype(
        {"total_count": "int64", "failed_count": "int64"}
    )
    return out.sort_values(["table_name", "rule_name"]).reset_index(drop=True)


def q_incremental_near_dup_documents(sf_dir: str) -> pd.DataFrame:
    """Persistent cross-crawl NEAR-dup lifecycle: build the MinHash
    band-key index from crawl A (even doc ids), probe crawl B = odd
    docs PLUS re-crawled copies of A's pages (ids shifted +100000) —
    every copy shares all 32 band keys with history and drops with
    certainty; fresh odd docs keep (no band collision at this corpus
    size with the pinned seed, so the exact-copy SQL oracle holds).
    Then union-merge B's keys and re-probe B: everything with
    shingles now drops."""
    import shutil
    import tempfile

    import pyarrow.compute as _pc

    from ..state.key_index import (
        build_near_dup_index,
        near_dup_against_index,
        update_near_dup_index,
    )

    def docs():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def crawl_a():
        return docs().map_batches(
            lambda b: b.filter(
                _pc.equal(_pc.bit_wise_and(b["doc_id"], 1), 0)
            ),
            batch_format="pyarrow",
        )

    def crawl_b():
        odd = docs().map_batches(
            lambda b: b.filter(
                _pc.equal(_pc.bit_wise_and(b["doc_id"], 1), 1)
            ),
            batch_format="pyarrow",
        )
        recrawled = crawl_a().map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("doc_id"),
                "doc_id",
                _pc.add(b["doc_id"], 100000),
            ),
            batch_format="pyarrow",
        )
        return odd.union(recrawled)

    work = tempfile.mkdtemp(prefix="graft_neardup_", dir="/tmp")
    try:
        idx = f"{work}/idx"
        build_near_dup_index(crawl_a(), idx)
        kept = near_dup_against_index(crawl_b(), idx).to_pandas()
        update_near_dup_index(idx, crawl_b())
        kept_after = near_dup_against_index(crawl_b(), idx).count()
        out = kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
        out["kept_after_update"] = np.int64(kept_after)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_incremental_dedup_orders(sf_dir: str) -> pd.DataFrame:
    """Persistent key-index lifecycle across three simulated crawls:
    build the index from crawl A's customer keys, dedup crawl B
    against it (drop rows whose key was EVER seen), union-merge B's
    keys in (atomic rewrite), then dedup crawl C against the updated
    index — the continuous-ingestion dedup story, 16 bytes of durable
    state per distinct key."""
    import shutil
    import tempfile

    import pyarrow.compute as _pc

    from ..state.key_index import (
        build_key_index,
        dedup_against_index,
        update_key_index,
    )

    def crawl(mod: int):
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(
            lambda b, m=mod: b.filter(
                _pc.equal(_pc.bit_wise_and(b["o_orderkey"], 3), m)
            ),
            batch_format="pyarrow",
        )

    work = tempfile.mkdtemp(prefix="graft_keyidx_", dir="/tmp")
    try:
        idx = f"{work}/idx"
        built = build_key_index(crawl(0), "o_custkey", idx)
        kept_b = dedup_against_index(crawl(1), "o_custkey", idx).count()
        upd = update_key_index(idx, crawl(1), "o_custkey")
        kept_c = dedup_against_index(crawl(2), "o_custkey", idx).count()
        return pd.DataFrame(
            {
                "n_a_keys": pd.array([built["n_keys"]], dtype="int64"),
                "kept_b": pd.array([kept_b], dtype="int64"),
                "n_ab_keys": pd.array([upd["n_keys"]], dtype="int64"),
                "kept_c": pd.array([kept_c], dtype="int64"),
            }
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_incremental_dedup_sharded_orders(sf_dir: str) -> pd.DataFrame:
    """The 10^12-key tier of the persistent index run through the SAME
    three-crawl lifecycle and pinned to the SAME exact-SQL oracle as
    the broadcast tier: h1-range-sharded build (each shard task writes
    only its range), bucketed shard probe (each group loads only its
    shard file), per-shard union-merge update. The driver never holds
    the pair table."""
    import shutil
    import tempfile

    import pyarrow.compute as _pc

    from ..state.key_index import (
        build_key_index,
        dedup_against_index,
        update_key_index,
    )

    def crawl(mod: int):
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(
            lambda b, m=mod: b.filter(
                _pc.equal(_pc.bit_wise_and(b["o_orderkey"], 3), m)
            ),
            batch_format="pyarrow",
        )

    work = tempfile.mkdtemp(prefix="graft_keyidx_sh_", dir="/tmp")
    try:
        idx = f"{work}/idx"
        built = build_key_index(crawl(0), "o_custkey", idx, n_shards=8)
        kept_b = dedup_against_index(crawl(1), "o_custkey", idx).count()
        upd = update_key_index(idx, crawl(1), "o_custkey")
        kept_c = dedup_against_index(crawl(2), "o_custkey", idx).count()
        return pd.DataFrame(
            {
                "n_a_keys": pd.array([built["n_keys"]], dtype="int64"),
                "kept_b": pd.array([kept_b], dtype="int64"),
                "n_ab_keys": pd.array([upd["n_keys"]], dtype="int64"),
                "kept_c": pd.array([kept_c], dtype="int64"),
            }
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_mix_to_budget_documents(sf_dir: str) -> pd.DataFrame:
    """Static data mixing to a char budget: weighted per-domain keep
    rates from pure integer arithmetic + the Knuth-hash row filter —
    byte-reproducible, exactly mirrored in SQL (window sums + the same
    integer permille formula)."""
    from .curation import mix_to_budget

    out = mix_to_budget(
        f"{sf_dir}/documents.parquet",
        budget=60000,
        weights={"src0": 3, "src1": 2},
    ).to_pandas()
    out = out[["doc_id", "source", "n_chars"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def q_temperature_mix_lang_documents(sf_dir: str) -> pd.DataFrame:
    """Temperature (α=0.3) sampling weights per language — the XLM-R /
    mC4 multilingual mixing recipe: q_d ∝ p_d^0.3, low-resource
    languages upweighted. One group-bounded count pass; driver holds
    #langs scalars. Oracle = the same POW/normalize math in SQL."""
    from .curation import temperature_mix_weights

    return temperature_mix_weights(
        f"{sf_dir}/documents.parquet", "lang", alpha=0.3
    )


def q_temperature_mix_chars_documents(sf_dir: str) -> pd.DataFrame:
    """Temperature weights over TOKEN mass instead of doc counts
    (count_col=n_chars): shares come from summed chars per source
    domain, the budget-weighting variant."""
    from .curation import temperature_mix_weights

    return temperature_mix_weights(
        f"{sf_dir}/documents.parquet", "source", alpha=0.5,
        count_col="n_chars",
    )


def q_fit_classifier_events(sf_dir: str) -> pd.DataFrame:
    """Distributed logistic-regression FIT (IRLS — one streaming pass
    of d×d normal-equation partials per Newton iteration) on a
    deterministic planted rule: label = (value > 50) XOR (event_id %
    5 = 0) — a noisy linear signal on `value` plus a nuisance feature
    that must get ~0 weight. Iterative + non-SQL → rows-only; the
    output is deterministic (fixed iterations, float64 partials,
    scatter-add merge) so the hash check pins it run-to-run."""
    import pyarrow.compute as _pc

    from .curation import fit_linear_classifier

    def labeled():
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "value"],
        )

        def add_label(b: pa.Table) -> pa.Table:
            hot = _pc.greater(_pc.coalesce(b["value"], -1e9), 50.0)
            flip = _pc.equal(
                _pc.subtract(
                    b["event_id"],
                    _pc.multiply(_pc.divide(b["event_id"], 5), 5),
                ),
                0,
            )
            y = _pc.cast(_pc.xor(hot, flip), pa.float64())
            nuis = _pc.cast(
                _pc.subtract(
                    b["user_id"],
                    _pc.multiply(_pc.divide(b["user_id"], 100), 100),
                ),
                pa.float64(),
            )
            return pa.table(
                {"value": b["value"], "nuisance": nuis, "y": y}
            )

        return ds.map_batches(add_label, batch_format="pyarrow")

    fit = fit_linear_classifier(
        labeled(), ["value", "nuisance"], "y", n_iters=6
    )
    return pd.DataFrame(
        {
            "w_value": pd.array([fit["weights"][0]], dtype="float64"),
            "w_nuisance": pd.array([fit["weights"][1]], dtype="float64"),
            "bias": pd.array([fit["bias"]], dtype="float64"),
            "n_rows": pd.array([fit["n_rows"]], dtype="int64"),
            "log_loss": pd.array([fit["log_loss"]], dtype="float64"),
        }
    )


def q_ann_recall_report(sf_dir: str) -> pd.DataFrame:
    """The engine auditing its own ANN index: IVF top-10 at each
    nprobe tier vs the exact brute-force neighbors on the same
    queries, reporting measured recall@10 ("measure, don't guess"
    applied to the index; nprobe = n_centroids must hit 1.0 — the
    same exactness the fullprobe oracle query pins). Deterministic:
    k-means init, assignment and tie-breaks are all seeded/ordered."""
    import shutil
    import tempfile

    from .dedup import load_embeddings
    from .similarity import knn_brute, knn_ivf

    path = f"{sf_dir}/embeddings.parquet"
    ids, M = load_embeddings(path)
    Q, qids = M[:20], ids[:20]
    brute = knn_brute(path, Q, qids, k=10)
    truth = {
        q: set(g["neighbor_id"].tolist())
        for q, g in brute.groupby("query_id")
    }
    work = tempfile.mkdtemp(prefix="graft_annrecall_", dir="/tmp")
    rows = []
    try:
        for nprobe in (2, 4, 8, 16):
            approx = knn_ivf(
                path, Q, qids, k=10, n_centroids=16, nprobe=nprobe,
                index_dir=f"{work}/ivf16",
            )
            hits = sum(
                len(set(g["neighbor_id"].tolist()) & truth[q])
                for q, g in approx.groupby("query_id")
            )
            rows.append(
                {
                    "nprobe": np.int64(nprobe),
                    "recall_at_10": round(hits / (10.0 * len(truth)), 6),
                }
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = pd.DataFrame(rows)
    assert out["recall_at_10"].iloc[-1] == 1.0  # fullprobe is exact
    return out


def q_sketch_accuracy_report(sf_dir: str) -> pd.DataFrame:
    """The engine auditing its own sketches: each approximate tier run
    NEXT TO its exact sibling on the same data, reporting the actual
    error — HLL grouped distinct vs exact, t-digest quantiles vs
    quantile_cont, Misra-Gries top-1 count vs the true count, KMV
    union vs exact. "Measure, don't guess" applied to the sketches
    themselves; determinism of every tier makes the report stable."""
    from .integrity import keyset_overlap, kmv_overlap
    from .profile import misra_gries_topk, top_values
    from .relational import (
        grouped_approx_distinct,
        grouped_count_distinct,
        grouped_exact_quantiles,
        grouped_quantiles,
    )

    ev = f"{sf_dir}/events.parquet"
    rows = []

    # HLL vs exact grouped distinct (max relative error across groups)
    hll = grouped_approx_distinct(ev, "event_type", "user_id").to_pandas()
    exact = grouped_count_distinct(ev, "event_type", "user_id").to_pandas()
    est_col = [c for c in hll.columns if c != "event_type"][0]
    exact = exact.rename(columns={
        c: f"{c}_exact" for c in exact.columns if c != "event_type"
    })
    ex_col = [c for c in exact.columns if c != "event_type"][0]
    m = hll.merge(exact, on="event_type")
    rel = (
        (m[est_col].astype(float) - m[ex_col].astype(float)).abs()
        / m[ex_col].astype(float)
    ).max()
    rows.append({"sketch": "hll_grouped_distinct",
                 "max_rel_error": round(float(rel), 6)})

    # t-digest vs exact p50/p95 (max relative-to-spread error)
    td = grouped_quantiles(
        ev, "event_type", "value", quantiles=(0.5, 0.95)
    ).to_pandas()
    eq = grouped_exact_quantiles(
        ev, "event_type", "value", quantiles=(0.5, 0.95)
    ).to_pandas()
    m2 = td.merge(eq, on="event_type", suffixes=("_td", "_ex"))
    spread = (m2["p95_ex"] - m2["p50_ex"]).abs().clip(lower=1e-9)
    err = pd.concat(
        [
            (m2["p50_td"] - m2["p50_ex"]).abs() / spread,
            (m2["p95_td"] - m2["p95_ex"]).abs() / spread,
        ]
    ).max()
    rows.append({"sketch": "tdigest_grouped_quantiles",
                 "max_rel_error": round(float(err), 6)})

    # Misra-Gries top-1 lower bound vs the true count of that value
    mg = misra_gries_topk(ev, "event_type", k=1).to_pandas()
    tv = top_values(ev, "event_type", k=10).to_pandas()
    mg_val = mg.iloc[0]["value"]
    mg_n = float(mg.iloc[0]["est_count"])
    true_n = float(tv.loc[tv.value == mg_val, "n"].iloc[0])
    rows.append({
        "sketch": "misra_gries_top1",
        "max_rel_error": round(abs(true_n - mg_n) / true_n, 6),
    })

    # KMV union estimate vs exact union
    kmv = kmv_overlap(ev, "user_id", f"{sf_dir}/customer.parquet",
                      "c_custkey", k=4096).iloc[0]
    ex_u = keyset_overlap(ev, "user_id", f"{sf_dir}/customer.parquet",
                          "c_custkey").iloc[0]
    rows.append({
        "sketch": "kmv_union",
        "max_rel_error": round(
            abs(float(kmv.est_union) - float(ex_u.n_union))
            / float(ex_u.n_union), 6,
        ),
    })
    return pd.DataFrame(rows).sort_values("sketch").reset_index(drop=True)


def q_pipeline_spec_documents(sf_dir: str) -> pd.DataFrame:
    """Config-driven curation: a YAML-shaped spec (length filter →
    per-domain downsample → leak-safe splits → projection) composes
    into ONE lazy streaming pipeline; the oracle chains the same
    predicates in SQL."""
    from .spec import run_pipeline_spec

    spec = {
        "steps": [
            {"op": "filter_expr", "params": {"expr": "n_chars >= 100"}},
            {
                "op": "domain_sample",
                "params": {
                    "rate_permille": {"src0": 500, "src1": 1000},
                    "default_permille": 250,
                    "id_col": "doc_id",
                    "domain_col": "source",
                },
            },
            {
                "op": "assign_splits",
                "params": {
                    "splits": {"train": 900, "val": 100},
                    "id_col": "doc_id",
                },
            },
            {"op": "select",
             "params": {"columns": ["doc_id", "source", "split"]}},
        ]
    }
    out = run_pipeline_spec(
        spec, f"{sf_dir}/documents.parquet"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pipeline_spec_multi_family(sf_dir: str) -> pd.DataFrame:
    """The spec runner composing FOUR engine families from config —
    filter → hash join (second input via the spec's ``sources:`` map
    and a ``$source`` marker) → exact dedup (keep min event_id per
    user) → daily tumbling-window aggregate — as ONE lazy plan; the
    oracle chains the same relational algebra in SQL."""
    from .spec import run_pipeline_spec

    spec = {
        "sources": {
            "customer": {
                "path": f"{sf_dir}/customer.parquet",
                "columns": ["c_custkey", "c_mktsegment"],
            }
        },
        "steps": [
            {"op": "filter_expr", "params": {"expr": "value > 10"}},
            {
                "op": "hash_join",
                "params": {
                    "right": {"$source": "customer"},
                    "left_key": "user_id",
                    "right_key": "c_custkey",
                    "left_cols": ["event_id", "ts", "value"],
                    "right_cols": ["c_mktsegment"],
                    "num_buckets": 16,
                },
            },
            {
                "op": "exact_dedup",
                "params": {"key": "user_id", "tiebreak": "event_id"},
            },
            {
                "op": "windowed_aggregate",
                "params": {
                    "ts_col": "ts",
                    "value_col": "value",
                    "key_cols": ["c_mktsegment"],
                    "window_seconds": 86400,
                },
            },
        ],
    }
    out = run_pipeline_spec(spec, f"{sf_dir}/events.parquet").to_pandas()
    return out.sort_values(
        ["window_start", "c_mktsegment"]
    ).reset_index(drop=True)


def q_canary_check_documents(sf_dir: str) -> pd.DataFrame:
    """End-to-end canary integrity: three known docs must appear
    exactly once with byte-identical content (md5); one canary is
    given a deliberately wrong expected digest to prove the check can
    fail."""
    import hashlib

    import pyarrow.parquet as _pq

    from .integrity import canary_check

    t = _pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    by_id = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    canaries = {
        10: hashlib.md5((by_id[10] or "").encode()).hexdigest(),
        20: hashlib.md5((by_id[20] or "").encode()).hexdigest(),
        30: "0" * 32,  # planted mismatch
    }
    return canary_check(
        f"{sf_dir}/documents.parquet", "doc_id", "text", canaries
    )


def q_storage_profile_events(sf_dir: str) -> pd.DataFrame:
    """Per-column storage footprint from Parquet footers only (zero
    data read): compressed/uncompressed bytes, ratio, table share."""
    from .layout import storage_profile

    return storage_profile(f"{sf_dir}/events.parquet")


def q_pruning_report_events(sf_dir: str) -> pd.DataFrame:
    """Row-group pruning effectiveness of value-range filters on the
    stored layout — footer min/max stats only, no scan. (The sorted-
    vs-unsorted improvement demo lives in tests/test_layout.py, where
    it asserts inequalities: a parallel sorted REWRITE's block layout
    is not bit-deterministic across runs, so the driver query reports
    only the given file's deterministic footer facts.)"""
    from .layout import pruning_report

    narrow = pruning_report(
        f"{sf_dir}/events.parquet", "value", 100.0, 120.0
    ).iloc[0]
    low = pruning_report(
        f"{sf_dir}/events.parquet", "event_id", 0, 99
    ).iloc[0]
    return pd.DataFrame(
        {
            "filter": ["event_id_0_99", "value_100_120"],
            "row_groups_total": pd.array(
                [low.row_groups_total, narrow.row_groups_total],
                dtype="int64",
            ),
            "row_groups_read": pd.array(
                [low.row_groups_read, narrow.row_groups_read],
                dtype="int64",
            ),
            "rows_total": pd.array(
                [low.rows_total, narrow.rows_total], dtype="int64"
            ),
            "rows_read": pd.array(
                [low.rows_read, narrow.rows_read], dtype="int64"
            ),
        }
    )


def q_compact_files_events(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction with PROOF: events fragments into 16
    per-task files under /tmp, compacts to 2 target-size files, and
    the op's order-independent content checksum of the OUTPUT must
    hash-equal the SQL checksum of the INPUT table (content-preserving
    by construction, verified not assumed)."""
    import shutil
    import tempfile

    from .layout import compact_files

    work = tempfile.mkdtemp(prefix="graft_compact_", dir="/tmp")
    try:
        frag = f"{work}/frag"
        ray.data.read_parquet(f"{sf_dir}/events.parquet").repartition(
            16
        ).write_parquet(frag)
        res = compact_files(
            frag, f"{work}/compact",
            ["event_id", "ts", "event_type", "user_id"],
            target_rows_per_file=(10_000_000 if "sf0.1" in sf_dir else 5000),
        )
        assert res["n_files_out"] < res["n_files_in"]
        return pd.DataFrame(
            {
                "n_rows": pd.array([res["n_rows"]], dtype="int64"),
                "checksum": pd.array([res["checksum"]], dtype="uint64"),
            }
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_grouped_mad_events(sf_dir: str) -> pd.DataFrame:
    """Exact per-type median absolute deviation (robust spread):
    two sorted-segment passes per bucket, bit-exact vs DuckDB mad()."""
    from .relational import grouped_mad

    out = grouped_mad(
        f"{sf_dir}/events.parquet", "event_type", "value"
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_right_join_orders_customer(sf_dir: str) -> pd.DataFrame:
    """RIGHT OUTER shuffle join: every customer row kept, order fields
    NULL-padded for customers with no orders (left-join with the sides
    swapped, columns re-oriented)."""
    from .relational import hash_join

    out = hash_join(
        f"{sf_dir}/orders.parquet",
        f"{sf_dir}/customer.parquet",
        left_key="o_custkey",
        right_key="c_custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=["c_custkey", "c_acctbal"],
        how="right",
    ).to_pandas()
    return out.sort_values(
        ["c_custkey", "o_orderkey"], na_position="last"
    ).reset_index(drop=True)


def q_interarrival_stats_events(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-arrival gap profile (mean gap seconds ROUND 6,
    exact min/max microseconds) — one bucketed key shuffle + one
    vectorized diff sweep per bucket."""
    from .relational import interarrival_stats

    out = interarrival_stats(
        f"{sf_dir}/events.parquet", "user_id", "ts",
        tiebreak_cols=["event_id"],
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_missingness_matrix_events(sf_dir: str) -> pd.DataFrame:
    """Co-null profile of four events columns: pairwise both-null /
    either-null counts and null-overlap Jaccard — one m×m null-mask
    matmul per batch."""
    from .profile import missingness_matrix

    return missingness_matrix(
        f"{sf_dir}/events.parquet", ["ts", "user_id", "event_type", "value"]
    )


def q_ratio_to_report_events(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total window (RATIO_TO_REPORT): each event's share of
    its event_type's total value — computed with NO row shuffle (key-
    bounded combiner sums broadcast back over one probe pass)."""
    from .relational import ratio_to_report

    out = ratio_to_report(
        f"{sf_dir}/events.parquet",
        "event_type",
        "value",
        columns=["event_id"],
    ).to_pandas()
    out = out[["event_id", "event_type", "value", "value_share"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_ratio_to_report_bucketed_events(sf_dir: str) -> pd.DataFrame:
    """The beyond-broadcast tier of RATIO_TO_REPORT: rows shuffle once
    by hash(key) and each bucket computes its keys' sums and shares
    locally — the driver never holds any key sums. Pinned to the SAME
    exact SQL oracle as the broadcast tier."""
    from .relational import ratio_to_report

    out = ratio_to_report(
        f"{sf_dir}/events.parquet",
        "event_type",
        "value",
        columns=["event_id"],
        num_buckets=16,
    ).to_pandas()
    out = out[["event_id", "event_type", "value", "value_share"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_anomaly_zscore_events(sf_dir: str) -> pd.DataFrame:
    """Per-user trailing-window anomaly z-score: each event's value
    scored against the mean/sample-stddev of its user's PRIOR 16
    events (leakage-free ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING);
    NULL until 2 prior values exist or if the history is constant."""
    from .relational import anomaly_zscore

    out = anomaly_zscore(
        f"{sf_dir}/events.parquet",
        "user_id",
        ["ts", "event_id"],
        "value",
        preceding=16,
    ).to_pandas()
    out = out[["user_id", "event_id", "zscore"]]
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_time_range_window_events(sf_dir: str) -> pd.DataFrame:
    """Per-user TIME-based moving window (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW, peers included) over events ordered by
    ts: trailing sum (ROUND 6), min/max and non-NULL count. rng_avg is
    dropped from the driver compare: at hour-wide frames the true mean
    can land exactly on a 7th-decimal half-point, where accumulation
    order (not correctness) decides the rounded hash — sum/min/max/
    count are exactly representable and hash-stable."""
    from .relational import time_range_window

    out = time_range_window(
        f"{sf_dir}/events.parquet",
        "user_id",
        "ts",
        "value",
        preceding_seconds=3600,
    ).to_pandas()
    out = out.drop(columns=["rng_avg"])
    return out.sort_values(
        ["user_id", "ts", "value"], na_position="last"
    ).reset_index(drop=True)


def q_edge_values_events(sf_dir: str) -> pd.DataFrame:
    """Per-user LEAD / FIRST_VALUE / LAST_VALUE (RESPECT NULLS, full
    frame) + partition row count over events ordered by (ts,
    event_id)."""
    from .relational import edge_values

    out = edge_values(
        f"{sf_dir}/events.parquet",
        "user_id",
        ["ts", "event_id"],
        "value",
    ).to_pandas()
    return out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )


def q_unpivot_lineitem(sf_dir: str) -> pd.DataFrame:
    """Wide→long reshape of four lineitem measure columns."""
    from .relational import unpivot

    out = unpivot(
        f"{sf_dir}/lineitem.parquet",
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).to_pandas()
    return out.sort_values(
        ["l_orderkey", "l_linenumber", "variable"]
    ).reset_index(drop=True)


def q_json_extract_events(sf_dir: str) -> pd.DataFrame:
    """Structured extraction of the integer $.k field from the events
    props JSON column (SQL ->> convention: unquoted text, cast)."""
    import pyarrow as _pa

    from .relational import json_extract

    out = json_extract(
        f"{sf_dir}/events.parquet",
        "props",
        {"k": "$.k"},
        types={"k": _pa.int64()},
    ).to_pandas()
    out = out[["event_id", "k"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_rollup_documents(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(lang, source) over documents: counts + n_chars sums at
    every prefix level in one pass."""
    from .relational import rollup_aggregate

    out = rollup_aggregate(
        f"{sf_dir}/documents.parquet", ["lang", "source"], "n_chars"
    ).to_pandas()
    out = out[["level", "lang", "source", "n_rows", "value_sum"]]
    return out.sort_values(
        ["level", "lang", "source"], na_position="last"
    ).reset_index(drop=True)


def q_except_customers_events(sf_dir: str) -> pd.DataFrame:
    """Customers with no event activity: c_custkey EXCEPT
    events.user_id (distinct set semantics — 1350 rows at sf0.01)."""
    from .relational import set_op

    out = set_op(
        f"{sf_dir}/customer.parquet",
        f"{sf_dir}/events.parquet",
        "except",
        ["c_custkey"],
        right_cols=["user_id"],
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_intersect_events_users(sf_dir: str) -> pd.DataFrame:
    """User ids present in BOTH the even- and odd-event_id halves of
    events (INTERSECT distinct)."""
    import pyarrow.compute as _pc

    from .relational import set_op

    def side(parity: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(_pc.bit_wise_and(b["event_id"], 1), p)
            ).select(["user_id"]),
            batch_format="pyarrow",
        )

    out = set_op(side(0), side(1), "intersect", ["user_id"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _lineitem_discount_sides(sf_dir: str):
    """(low-discount, high-discount) projections of lineitem for the
    bag set-op queries — duplicate (flag, qty) rows are the point."""
    import pyarrow.compute as _pc

    def side(low: bool):
        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_discount"],
        )
        op = _pc.less_equal if low else _pc.greater
        return ds.map_batches(
            lambda b, o=op: b.filter(o(b["l_discount"], 0.05)).select(
                ["l_returnflag", "l_quantity"]
            ),
            batch_format="pyarrow",
        )

    return side(True), side(False)


def q_intersect_all_lineitem(sf_dir: str) -> pd.DataFrame:
    """INTERSECT ALL (bag semantics): each (returnflag, quantity) row
    kept min(countL, countR) times across the low/high-discount halves
    of lineitem — duplicates are preserved, unlike `intersect`."""
    from .relational import set_op

    left, right = _lineitem_discount_sides(sf_dir)
    out = set_op(
        left, right, "intersect_all", ["l_returnflag", "l_quantity"]
    ).to_pandas()
    return out.sort_values(["l_returnflag", "l_quantity"]).reset_index(drop=True)


def q_except_all_lineitem(sf_dir: str) -> pd.DataFrame:
    """EXCEPT ALL (bag semantics): each (returnflag, quantity) row kept
    max(countL − countR, 0) times — the multiset difference of the
    low/high-discount halves of lineitem."""
    from .relational import set_op

    left, right = _lineitem_discount_sides(sf_dir)
    out = set_op(
        left, right, "except_all", ["l_returnflag", "l_quantity"]
    ).to_pandas()
    return out.sort_values(["l_returnflag", "l_quantity"]).reset_index(drop=True)


def q_cube_events(sf_dir: str) -> pd.DataFrame:
    """CUBE(event_type, user_id % 4) over events: all four grouping
    sets in one pass; grouping_id is the SQL GROUPING bitmask."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .relational import cube_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    ).map_batches(
        lambda b: b.append_column(
            "user_band",
            _pc.cast(_pc.bit_wise_and(b["user_id"], 3), _pa.int64()),
        ).drop(["user_id"]),
        batch_format="pyarrow",
    )
    out = cube_aggregate(ds, ["event_type", "user_band"], "value").to_pandas()
    out = out[["grouping_id", "event_type", "user_band", "n_rows", "value_sum"]]
    return out.sort_values(
        ["grouping_id", "event_type", "user_band"], na_position="last"
    ).reset_index(drop=True)


def q_top_events_by_value(sf_dir: str) -> pd.DataFrame:
    """Global ORDER BY value DESC LIMIT 100 without a full sort
    (per-batch argpartition partial top-k, driver merge)."""
    from .relational import top_k_rows

    return top_k_rows(
        f"{sf_dir}/events.parquet",
        "value",
        100,
        descending=True,
        tiebreak_cols=["event_id"],
        columns=["event_id", "value"],
    )


def q_global_rank_events(sf_dir: str) -> pd.DataFrame:
    """Global ROW_NUMBER + NTILE(7) over events ordered by
    (value, event_id) — distributed prefix-scan ranking."""
    from .relational import global_rank

    out = global_rank(
        f"{sf_dir}/events.parquet",
        "value",
        tiebreak_cols=["event_id"],
        ntile=7,
        percentiles=True,
    ).to_pandas()
    out = out[
        ["event_id", "value", "rank", "tile", "percent_rank", "cume_dist"]
    ]
    return out.sort_values("rank").reset_index(drop=True)


def q_grouped_stats_lineitem(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag moments: count/avg/var_samp of l_quantity and
    Pearson corr(l_quantity, l_extendedprice) in one pass."""
    from .profile import grouped_stats

    out = grouped_stats(
        f"{sf_dir}/lineitem.parquet",
        ["l_returnflag"],
        "l_quantity",
        "l_extendedprice",
    ).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_correlation_matrix_lineitem(sf_dir: str) -> pd.DataFrame:
    """All-pairs Pearson matrix over four lineitem numerics in ONE
    pass: per-batch masked-matmul moment partials (4 BLAS calls per
    batch), pair-bounded merge."""
    from .profile import correlation_matrix

    return correlation_matrix(
        f"{sf_dir}/lineitem.parquet",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def q_type_conformance_events(sf_dir: str) -> pd.DataFrame:
    """Type-inference profile: props (JSON strings) and event_type
    label columns plus a deterministically DIRTY derived column mixing
    int strings, decimal strings, garbage, empties and timestamp
    strings (built from integer/strftime formatting only — float
    printing differs between engines and is deliberately avoided)."""
    import pyarrow.compute as _pc

    from .profile import type_conformance_profile

    def derive(b: pa.Table) -> pa.Table:
        ids = b["event_id"]
        id_str = _pc.cast(ids, pa.string())
        m = _pc.cast(_pc.bit_wise_and(ids, 3), pa.int64())  # event_id % 4
        # second-unit cast first: Arrow's %S prints fractional seconds
        # for sub-second units (DuckDB's %S never does)
        ts_s = _pc.floor_temporal(b["ts"], unit="second").cast(
            pa.timestamp("s")
        )
        ts_str = _pc.strftime(ts_s, format="%Y-%m-%d %H:%M:%S")
        dirty = _pc.if_else(
            _pc.equal(m, 0), id_str,
            _pc.if_else(
                _pc.equal(m, 1),
                _pc.binary_join_element_wise(id_str, ".5", ""),
                _pc.if_else(_pc.equal(m, 2), pa.scalar("abc"), ts_str),
            ),
        )
        return b.select(["props", "event_type"]).append_column(
            "dirty_str", dirty
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "props", "event_type", "ts"],
    ).map_batches(derive, batch_format="pyarrow")
    return type_conformance_profile(
        ds, ["props", "event_type", "dirty_str"]
    )


def q_weighted_stats_lineitem(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted price stats per returnflag: Σw, Σw·x and the
    weighted mean (mixture-weighting moment pass, combiner partials)."""
    from .profile import grouped_weighted_stats

    out = grouped_weighted_stats(
        f"{sf_dir}/lineitem.parquet",
        ["l_returnflag"],
        "l_extendedprice",
        "l_quantity",
    ).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_join_size_profile_lineitem_orders(sf_dir: str) -> pd.DataFrame:
    """Pre-join cardinality & skew report for lineitem ⋈ orders on the
    order key: exact output rows, shared keys, hottest key's
    contribution and skew ratio — keys-bounded exchange, rows never
    move."""
    from .profile import join_size_profile

    return join_size_profile(
        f"{sf_dir}/lineitem.parquet", "l_orderkey",
        f"{sf_dir}/orders.parquet", "o_orderkey",
    )


def q_numeric_profile_events(sf_dir: str) -> pd.DataFrame:
    """Exact slice of the one-pass table profiler: every numeric column
    of events gets total/null counts and exact min/max/mean (mean
    rounded to 6) from mergeable per-batch partials — the deequ-style
    'first look' surface, oracle-checked."""
    from ..stages.stats import table_profile

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    prof = table_profile(ds)
    num = prof[prof["mean_value"].notna() | (prof["dtype"].isin(
        ["int64", "int32", "double", "float"]))]
    out = num[[
        "column", "total_count", "null_count",
        "min_value", "max_value", "mean_value",
    ]].copy()
    return out.sort_values("column").reset_index(drop=True)


def q_table_profile_events(sf_dir: str) -> pd.DataFrame:
    """Full one-pass profile of EVERY events column, driver-gated as a
    SELF-AUDIT: the profiler's exact fields (counts, numeric
    min/max/mean) check directly against SQL, the HLL approx-distinct
    is audited against a per-column EXACT distinct (driver-side
    pc.unique merge — the gate affordance at sf0.01; the operator
    itself stays the one-pass streaming profiler and at scale exact
    distinct is its own shuffle tier), and ``hll_ok`` flags every
    column's estimate within 5%. Oracle = per-column COUNT(DISTINCT)
    SQL with TRUE flags."""
    import pyarrow.compute as _pc

    from ..stages.stats import table_profile

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    prof = table_profile(ds).sort_values("column").reset_index(drop=True)

    cols = list(prof["column"])
    parts: Dict[str, list] = {c: [] for c in cols}
    for b in ds.iter_batches(batch_size=64 * 1024, batch_format="pyarrow"):
        for c in cols:
            col = b[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts[c].append(_pc.unique(col.drop_null()))
    n_exact = {
        c: (len(_pc.unique(pa.concat_arrays(parts[c]))) if parts[c] else 0)
        for c in cols
    }
    exact = prof["column"].map(n_exact).astype("int64")
    rel = (prof["approx_distinct"] - exact).abs() / exact.clip(lower=1)
    prof = prof.drop(columns=["approx_distinct"])
    prof.insert(4, "n_distinct", exact)
    prof.insert(5, "hll_ok", bool(rel.max() <= 0.05))
    return prof


def q_cat_association_documents(sf_dir: str) -> pd.DataFrame:
    """Chi-squared / Cramér's V / mutual information between
    documents.lang and documents.source — the two-column independence
    profiler (cell-bounded exchange; float math mirrors the SQL
    term-for-term, ROUND 6)."""
    from .profile import cat_association

    return cat_association(
        f"{sf_dir}/documents.parquet", "lang", "source"
    ).to_pandas()


def q_categorical_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Per-column categorical profile (n, nulls, exact distinct,
    Shannon entropy, top-category share) of documents.lang and
    documents.source in ONE pass (distinct-bounded partials)."""
    from .profile import categorical_profile

    return categorical_profile(
        f"{sf_dir}/documents.parquet", ["lang", "source"]
    ).to_pandas()


def q_robust_scale_events(sf_dir: str) -> pd.DataFrame:
    """Per-event_type robust scaling (v − median)/IQR with exact
    quantile_cont constants — the outlier-insensitive sibling of the
    z-score tier (one grouped-quantile shuffle, then a broadcast-lookup
    transform pass)."""
    from .profile import robust_scale_by_group

    out = robust_scale_by_group(
        f"{sf_dir}/events.parquet", "event_type", "value", out_col="r"
    ).to_pandas()
    out = out[["event_id", "value", "r"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_standardize_events_value(sf_dir: str) -> pd.DataFrame:
    """Z-score feature scaling of events.value (two streaming passes:
    mergeable moments → broadcast-constants transform; nothing
    shuffles)."""
    from .profile import standardize_column

    out = standardize_column(
        f"{sf_dir}/events.parquet", "value", out_col="z"
    ).to_pandas()
    out = out[["event_id", "value", "z"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_snapshot_diff_events(sf_dir: str) -> pd.DataFrame:
    """Dataset-version diff (CDC-style audit): old = event_id < 8000,
    new = event_id >= 2000 with every 5th value bumped — added /
    removed / changed rows only, NULL-safe compare."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .relational import snapshot_diff

    def side(lo: "int | None", hi: "int | None", bump: bool):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        )

        def fn(b: _pa.Table) -> _pa.Table:
            keep = _pa.array(np.ones(b.num_rows, bool))
            if lo is not None:
                keep = _pc.and_(keep, _pc.greater_equal(b["event_id"], lo))
            if hi is not None:
                keep = _pc.and_(keep, _pc.less(b["event_id"], hi))
            b = b.filter(keep)
            if bump:
                # event_id % 5 == 0 via truncating int divide (ids >= 0)
                mod5 = _pc.equal(
                    _pc.subtract(
                        b["event_id"],
                        _pc.multiply(
                            _pc.divide(b["event_id"], 5), 5
                        ),
                    ),
                    0,
                )
                v = _pc.if_else(
                    mod5, _pc.add(b["value"], 1.0), b["value"]
                )
                b = b.set_column(
                    b.schema.get_field_index("value"), "value", v
                )
            return b

        return ds.map_batches(fn, batch_format="pyarrow")

    out = snapshot_diff(
        side(None, 8000, False),
        side(2000, None, True),
        ["event_id"],
        ["value"],
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_rank_dense_events(sf_dir: str) -> pd.DataFrame:
    """Tie-aware RANK() and DENSE_RANK() over a banded value
    (floor(value/100), deliberately tie-heavy): tie runs never cross
    range-partition buckets, so RANK costs no extra exchange; DENSE
    adds one distinct-bounded pre-pass."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .relational import global_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(
        lambda b: b.append_column(
            "band",
            _pc.cast(
                _pc.floor(_pc.divide(b["value"], 100.0)), _pa.float64()
            ),
        ).drop(["value"]),
        batch_format="pyarrow",
    )
    out = (
        global_rank(ds, "band", tiebreak_cols=["event_id"],
                    rank_ties=True, dense=True)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return out[["event_id", "band", "rank_ties", "dense_rank"]]


def q_quantile_bucketize_events(sf_dir: str) -> pd.DataFrame:
    """Quartile feature binning of events.value: exact quantile_cont
    edges from the global-rank prefix scan, then a broadcast
    searchsorted assignment (bit-exact edge comparisons vs SQL)."""
    from .profile import quantile_bucketize

    out = quantile_bucketize(
        f"{sf_dir}/events.parquet", "value", n_bins=4
    ).to_pandas()
    out = out[["event_id", "value", "bin"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_grouped_mode_events(sf_dir: str) -> pd.DataFrame:
    """Per-user modal event_type (ties → smallest value): per-batch
    (group, value) count combiner + bucketed argmax merge."""
    from .profile import grouped_mode

    out = grouped_mode(
        f"{sf_dir}/events.parquet", ["user_id"], "event_type"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_explode_embeddings(sf_dir: str) -> pd.DataFrame:
    """UNNEST WITH ORDINALITY of the embedding list column (1-based
    pos, one row per element)."""
    from .relational import explode_column

    out = explode_column(
        f"{sf_dir}/embeddings.parquet",
        "embedding",
        keep_cols=["vec_id"],
        value_name="emb_val",
    ).to_pandas()
    return out.sort_values(["vec_id", "pos"]).reset_index(drop=True)


def q_dup_span_stats_documents(sf_dir: str) -> pd.DataFrame:
    """Duplicated-span coverage (Lee et al. substring-dedup signal):
    per doc, tokens covered by any 8-gram occurring >=2 times
    corpus-wide (2430 of 27165 tokens at sf0.01)."""
    from .curation import duplicated_span_stats

    out = duplicated_span_stats(
        f"{sf_dir}/documents.parquet", n=8, min_count=2
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_forward_fill_events(sf_dir: str) -> pd.DataFrame:
    """Per-user forward fill (LOCF) over events ordered by
    (ts, event_id) — LAST_VALUE IGNORE NULLS window parity. The sf
    tables carry no NULLs, so every 5th event_id's value is NULLed
    deterministically on BOTH sides to exercise the fill."""
    import pyarrow.compute as _pc

    from .relational import forward_fill

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("value"),
            "value",
            _pc.if_else(
                _pc.equal(
                    _pc.subtract(
                        b["event_id"],
                        _pc.multiply(_pc.divide(b["event_id"], 5), 5),
                    ),
                    0,
                ),
                None,
                b["value"],
            ),
        ),
        batch_format="pyarrow",
    )
    out = forward_fill(
        ds, "user_id", ["ts", "event_id"], "value"
    ).to_pandas()
    out = out[["user_id", "ts", "event_id", "value", "value_filled"]]
    return out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )


def q_grouped_top_k_events(sf_dir: str) -> pd.DataFrame:
    """Top-3 events per user by value (QUALIFY ROW_NUMBER <= 3
    pattern; per-batch combiner bounds the exchange)."""
    from .relational import grouped_top_k

    out = grouped_top_k(
        f"{sf_dir}/events.parquet",
        ["user_id"],
        "value",
        3,
        descending=True,
        tiebreak_cols=["event_id"],
    ).to_pandas()
    out = out[["user_id", "event_id", "value"]]
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_calendar_agg_events(sf_dir: str) -> pd.DataFrame:
    """Calendar-week aggregation (date_trunc('week') parity: Monday
    weeks, calendar-aware) of events.value per event_type."""
    from .relational import calendar_aggregate

    out = calendar_aggregate(
        f"{sf_dir}/events.parquet",
        "ts",
        "value",
        key_cols=["event_type"],
        unit="week",
    ).to_pandas()
    out = out[["period", "event_type", "n_events", "value_sum", "value_avg"]]
    return out.sort_values(["period", "event_type"]).reset_index(drop=True)


def q_regex_extract_events(sf_dir: str) -> pd.DataFrame:
    """Named-group RE2 extraction from the props JSON text (engine
    NULL-on-no-match ≡ oracle NULLIF(regexp_extract, ''))."""
    from .relational import regex_extract

    out = regex_extract(
        f"{sf_dir}/events.parquet",
        "props",
        r'"k": (?P<kraw>\d+)',
        keep_cols=["event_id"],
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_try_cast_events(sf_dir: str) -> pd.DataFrame:
    """TRY_CAST over a deterministically dirtied string column (every
    7th event_id becomes 'bad'): invalid strings land as NULL, valid
    ones parse back exactly."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .relational import try_cast_columns

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id"]
    ).map_batches(
        lambda b: b.append_column(
            "s",
            _pc.if_else(
                _pc.equal(
                    _pc.subtract(
                        b["event_id"],
                        _pc.multiply(_pc.divide(b["event_id"], 7), 7),
                    ),
                    0,
                ),
                "bad",
                _pc.cast(b["event_id"], _pa.string()),
            ),
        ),
        batch_format="pyarrow",
    )
    out = try_cast_columns(ds, {"s": _pa.int64()}).to_pandas()
    out = out.rename(columns={"s": "parsed"})
    return out.sort_values("event_id").reset_index(drop=True)


def q_embedding_drift_splits(sf_dir: str) -> pd.DataFrame:
    """Embedding-space drift between the even/odd vec_id halves: the
    cosine and L2 distance of the two mean vectors — one (n, Σx)
    moment pass per side, nothing else moves."""
    import pyarrow.compute as _pc

    from .similarity import embedding_mean_drift

    def side(par: int):
        return ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).map_batches(
            lambda b, p=par: b.filter(
                _pc.equal(_pc.bit_wise_and(b["vec_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    return embedding_mean_drift(side(0), side(1))


def q_embedding_norms(sf_dir: str) -> pd.DataFrame:
    """Per-vector L2 norm audit (un-normalized / zero vectors) — one
    streaming pass, float64 einsum per batch, no shuffle."""
    from .similarity import embedding_norms

    out = embedding_norms(f"{sf_dir}/embeddings.parquet").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Sample covariance matrix of the embedding corpus (PCA/whitening
    input), long form (i, j, cov) with 1-based dims, ROUND 6."""
    from .similarity import embedding_covariance

    mean, cov, n = embedding_covariance(
        f"{sf_dir}/embeddings.parquet"
    )
    d = len(mean)
    i = np.repeat(np.arange(1, d + 1), d)
    j = np.tile(np.arange(1, d + 1), d)
    return pd.DataFrame(
        {
            "i": i.astype(np.int64),
            "j": j.astype(np.int64),
            "cov": np.round(cov.reshape(-1), 6),
        }
    ).sort_values(["i", "j"]).reset_index(drop=True)


def q_pca_project_embeddings(sf_dir: str) -> pd.DataFrame:
    """PCA-reduce embeddings to 8 components (rows-only: no SQL
    eigendecomposition; sign-fixed components keep reruns stable).
    Emits per-vector projections rounded to 6."""
    from .similarity import pca_project

    ds, comps, evar = pca_project(
        f"{sf_dir}/embeddings.parquet", 8
    )
    out = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    proj = np.round(np.stack(out["pca"].to_numpy()), 6)
    cols = {"vec_id": out["vec_id"].to_numpy(np.int64)}
    for c in range(proj.shape[1]):
        cols[f"pc{c + 1}"] = proj[:, c]
    return pd.DataFrame(cols)


def q_scd2_events_user_type(sf_dir: str) -> pd.DataFrame:
    """SCD Type-2 history build: the events stream is a change log of
    each user's `event_type` attribute; collapse it into versioned
    dimension rows (new version only when the attribute actually
    changes, `valid_from`/`valid_to` interval chain, `is_current` on
    the open version). One key-bucketed shuffle, vectorized per
    bucket."""
    from .relational import scd2_build

    out = scd2_build(
        f"{sf_dir}/events.parquet",
        "user_id",
        ["event_type"],
        ["ts", "event_id"],
    ).to_pandas()
    return out.sort_values(
        ["user_id", "valid_from"]
    ).reset_index(drop=True)


def q_disc_quantiles_events(sf_dir: str) -> Any:
    """PERCENTILE_DISC tier of the exact grouped quantiles (actual
    elements at max(ceil(q·n),1), no interpolation) — value copies,
    hash-exact without rounding."""
    from .relational import grouped_exact_quantiles

    return grouped_exact_quantiles(
        f"{sf_dir}/events.parquet",
        "event_type",
        "value",
        quantiles=(0.25, 0.5, 0.9),
        interpolation="disc",
    )


def q_bucketed_join_lineitem_orders(sf_dir: str) -> Any:
    """Shuffle-FREE join from co-partitioned storage: both tables are
    written once as hash-bucketed hive layouts on the order key
    (bucket manifests pin the layout), then the join is one Ray task
    per aligned bucket pair — zero exchange, the durable form of
    'pick one partitioning key and reuse it across stages'."""
    import tempfile
    from pathlib import Path

    from .layout import bucketed_join, write_bucketed

    tag = Path(sf_dir).name
    ldir = f"{tempfile.gettempdir()}/graft_bkt_li_{tag}"
    rdir = f"{tempfile.gettempdir()}/graft_bkt_ord_{tag}"
    if not Path(ldir).exists():
        write_bucketed(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_linenumber", "l_quantity"],
            ),
            ldir, "l_orderkey", num_buckets=16,
        )
    if not Path(rdir).exists():
        write_bucketed(
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_totalprice"],
            ),
            rdir, "o_orderkey", num_buckets=16,
        )
    return bucketed_join(
        ldir, rdir,
        left_key="l_orderkey", right_key="o_orderkey",
        right_cols=["o_totalprice"],
    )


def q_group_limit_events_user(sf_dir: str) -> pd.DataFrame:
    """group_limit rule (grouped-HAVING family): every user's event
    COUNT must be ≤ 60; group-level verdict from the bucketed
    combiner shuffle."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="g", rule_type="group_limit", column=None,
            parameters={
                "keys": ["user_id"], "agg": "count",
                "op": "<=", "bound": 60,
            },
        ),
    )


def q_group_limit_orders_avg(sf_dir: str) -> pd.DataFrame:
    """group_limit rule with a value aggregate: every customer's AVG
    order total must be ≤ 300000."""
    return _single_rule_counts(
        sf_dir, "orders",
        ValidationRule(
            name="g", rule_type="group_limit", column=None,
            parameters={
                "keys": ["o_custkey"], "agg": "avg",
                "agg_column": "o_totalprice",
                "op": "<=", "bound": 300000,
            },
        ),
    )


def q_correlation_lineitem(sf_dir: str) -> pd.DataFrame:
    """correlation rule (deequ hasCorrelation): Pearson r of
    (l_quantity, l_extendedprice) must lie in [−0.1, 0.1] —
    moment-sum partials in the fused pass, no shuffle; emits the
    measured r (ROUND 6) alongside the verdict counts."""
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "lineitem", "rules": [
            {"name": "c", "rule_type": "correlation",
             "column": "l_quantity",
             "parameters": {"other": "l_extendedprice",
                            "min_value": -0.1, "max_value": 0.1}},
        ]}],
    )
    v = RayDataValidator(cfg)
    summary = v.validate_table(f"{sf_dir}/lineitem.parquet", "lineitem")
    r = summary.results[0]
    if r.total_count < 0:
        raise RuntimeError(f"rule failed: {r.message}")
    return pd.DataFrame(
        {
            "total_count": pd.Series([r.total_count], dtype="int64"),
            "failed_count": pd.Series([r.failed_count], dtype="int64"),
            "corr": [round(r.metadata["correlation"], 6)],
        }
    )


def q_entropy_events_type(sf_dir: str) -> pd.DataFrame:
    """entropy rule (deequ hasEntropy): Shannon entropy (natural log)
    of event_type's value distribution must lie in [0.5, 3.0] —
    value-count partials ride the fused pass (distinct-bounded, no
    shuffle); emits the measured entropy (ROUND 6) and distinct count
    alongside the verdict."""
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "events", "rules": [
            {"name": "e", "rule_type": "entropy", "column": "event_type",
             "parameters": {"min_value": 0.5, "max_value": 3.0}},
        ]}],
    )
    v = RayDataValidator(cfg)
    summary = v.validate_table(f"{sf_dir}/events.parquet", "events")
    r = summary.results[0]
    if r.total_count < 0:
        raise RuntimeError(f"rule failed: {r.message}")
    return pd.DataFrame(
        {
            "total_count": pd.Series([r.total_count], dtype="int64"),
            "failed_count": pd.Series([r.failed_count], dtype="int64"),
            "entropy": [round(r.metadata["entropy"], 6)],
            "distinct_count": pd.Series(
                [r.metadata["distinct_count"]], dtype="int64"
            ),
        }
    )


def _one_rule_metrics(
    sf_dir: str,
    table: str,
    rule: dict,
    metric_cols: "list[tuple[str, str, str]]",
) -> pd.DataFrame:
    """Run ONE rule through the fused validator pass and shape its
    verdict + named metadata into the driver-comparable frame
    (metric_cols: (out_name, metadata_key, dtype); dtype 'round6'
    rounds a float for hash-stable oracle compare)."""
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": table, "rules": [rule]}],
    )
    v = RayDataValidator(cfg)
    summary = v.validate_table(f"{sf_dir}/{table}.parquet", table)
    r = summary.results[0]
    if r.total_count < 0:
        raise RuntimeError(f"rule failed: {r.message}")
    out = {
        "total_count": pd.Series([r.total_count], dtype="int64"),
        "failed_count": pd.Series([r.failed_count], dtype="int64"),
    }
    for name, key, dtype in metric_cols:
        val = r.metadata[key]
        if dtype == "round6":
            out[name] = [round(val, 6) if val is not None else None]
        else:
            out[name] = pd.Series([val], dtype=dtype)
    return pd.DataFrame(out)


def q_distinctness_documents_lang(sf_dir: str) -> pd.DataFrame:
    """distinctness rule (deequ hasDistinctness): DISTINCT/non-NULL
    ratio of documents.lang must stay ≤ 0.5 (a categorical column —
    near-zero distinctness expected); value-count partials ride the
    fused pass, distinct-bounded, no shuffle."""
    return _one_rule_metrics(
        sf_dir, "documents",
        {"name": "d", "rule_type": "distinctness", "column": "lang",
         "parameters": {"min_value": 0.0, "max_value": 0.5}},
        [("distinctness", "distinctness", "round6"),
         ("distinct_count", "distinct_count", "int64"),
         ("non_null_count", "non_null_count", "int64")],
    )


def q_unique_value_ratio_orders(sf_dir: str) -> pd.DataFrame:
    """unique_value_ratio rule (deequ hasUniqueValueRatio): fraction
    of o_totalprice's distinct values occurring exactly once must be
    ≥ 0.5 (prices are near-unique); same distinct-bounded value-count
    partials as entropy/distinctness."""
    return _one_rule_metrics(
        sf_dir, "orders",
        {"name": "u", "rule_type": "unique_value_ratio",
         "column": "o_totalprice",
         "parameters": {"min_value": 0.5, "max_value": 1.0}},
        [("unique_value_ratio", "unique_value_ratio", "round6"),
         ("unique_count", "unique_count", "int64"),
         ("distinct_count", "distinct_count", "int64")],
    )


def q_mutual_information_documents(sf_dir: str) -> pd.DataFrame:
    """mutual_information rule (deequ hasMutualInformation): MI (nats)
    between documents.lang and documents.source must lie in [0, 1];
    pair-count partials (Arrow group_by per batch, pair-distinct-
    bounded driver merge) — the 2-D categorical dependence check."""
    return _one_rule_metrics(
        sf_dir, "documents",
        {"name": "m", "rule_type": "mutual_information", "column": "lang",
         "parameters": {"other": "source",
                        "min_value": 0.0, "max_value": 1.0}},
        [("mutual_information", "mutual_information", "round6"),
         ("n_pairs", "n_pairs", "int64"),
         ("distinct_pairs", "distinct_pairs", "int64")],
    )


def q_string_length_documents_text(sf_dir: str) -> pd.DataFrame:
    """string_length rule (deequ MinLength/MaxLength, row-resolved):
    non-NULL documents.text whose character length falls outside
    [100, 500] are violations (NULLs never fail); observed min/max
    length ride the partials free."""
    return _one_rule_metrics(
        sf_dir, "documents",
        {"name": "s", "rule_type": "string_length", "column": "text",
         "parameters": {"min_length": 100, "max_length": 500}},
        [("min_length", "min_length", "int64"),
         ("max_length", "max_length", "int64")],
    )


def q_label_encode_events(sf_dir: str) -> Any:
    """Deterministic label encoding of event_type (StringIndexer):
    sorted-vocabulary ranks, NULL → NULL; distinct-partials pass +
    broadcast searchsorted probe, no shuffle."""
    from .profile import label_encode

    ds = label_encode(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
        ),
        "event_type",
    )
    return ds.map_batches(
        lambda b: b.select(["event_id", "event_type", "event_type_idx"]),
        batch_format="pyarrow",
    )


def q_target_encode_events(sf_dir: str) -> Any:
    """Smoothed target encoding of event_type by mean(value) (m=10
    additive shrinkage toward the global mean); category-bounded
    combiner pass + broadcast probe."""
    from .profile import target_encode

    ds = target_encode(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        ),
        "event_type",
        "value",
        smoothing=10.0,
    )
    return ds.map_batches(
        lambda b: b.select(["event_id", "event_type_te"]),
        batch_format="pyarrow",
    )


def q_grouping_sets_events(sf_dir: str) -> pd.DataFrame:
    """Arbitrary GROUPING SETS ((event_type), (user_band), ()) — the
    general form ROLLUP/CUBE delegate to; one pass, SQL GROUPING
    bitmask ids."""
    from .relational import grouping_sets_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    ).map_batches(
        lambda b: b.append_column(
            "user_band",
            pc.cast(pc.bit_wise_and(b["user_id"], 3), pa.int64()),
        ).drop(["user_id"]),
        batch_format="pyarrow",
    )
    out = grouping_sets_aggregate(
        ds,
        ["event_type", "user_band"],
        "value",
        [["event_type"], ["user_band"], []],
    ).to_pandas()
    out = out[["grouping_id", "event_type", "user_band", "n_rows", "value_sum"]]
    return out.sort_values(
        ["grouping_id", "event_type", "user_band"], na_position="last"
    ).reset_index(drop=True)


def q_pivot_sums_events(sf_dir: str) -> Any:
    """Pivoted per-category value SUMs + counts per user (the
    aggregate sibling of pivot_counts): fixed-layout one-hot combiner,
    no post-shuffle pivot stage."""
    from .relational import pivot_sums

    return pivot_sums(
        f"{sf_dir}/events.parquet",
        "user_id",
        "event_type",
        ["click", "purchase", "view"],
        "value",
    )


def q_range_checksums_events(sf_dir: str) -> pd.DataFrame:
    """Merkle-style per-range content digests of events (event_id
    ranges of 1000): the anti-entropy primitive — compare digests,
    re-ship only differing ranges."""
    from .integrity import range_checksums

    return range_checksums(
        f"{sf_dir}/events.parquet",
        ["event_id", "ts", "event_type", "user_id"],
        "event_id",
        width=1000,
    )


def q_bloom_join_lineitem_orders(sf_dir: str) -> Any:
    """Bloom-prefiltered shuffle join: lineitem × the ~10 % of orders
    over 450k — right keys fold into OR-reduced partial Bloom filters,
    the merged filter broadcasts once and drops ~90 % of lineitem
    BEFORE the exchange; output identical to the plain join."""
    from .relational import bloom_prefilter_join

    def big_orders(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["o_totalprice"], 450000.0))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(big_orders, batch_format="pyarrow")
    return bloom_prefilter_join(
        f"{sf_dir}/lineitem.parquet",
        orders,
        left_key="l_orderkey",
        right_key="o_orderkey",
        left_cols=["l_orderkey", "l_linenumber", "l_quantity"],
        right_cols=["o_orderkey", "o_totalprice"],
    )


def q_bloom_anti_join_customers(sf_dir: str) -> pd.DataFrame:
    """Bloom-pruned ANTI join (the incremental-dedup shape): customers
    with no event activity. Bloom misses — the ~90 % of customers whose
    key can't be in events — stream straight to the output with NO
    shuffle; only Bloom-positive candidates go through the exact anti
    join."""
    from .relational import bloom_prefilter_join

    out = bloom_prefilter_join(
        f"{sf_dir}/customer.parquet",
        f"{sf_dir}/events.parquet",
        left_key="c_custkey",
        right_key="user_id",
        left_cols=["c_custkey", "c_name"],
        right_cols=["user_id"],
        how="anti",
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_ohlc_events(sf_dir: str) -> Any:
    """Hourly OHLC bars per user (time-series downsampling): one
    bucketed key shuffle, vectorized per-bucket head/tail/min/max;
    open/close are SQL FIRST_VALUE/LAST_VALUE raw-row parity (exact
    value copies — no rounding needed)."""
    from .relational import ohlc_resample

    return ohlc_resample(
        f"{sf_dir}/events.parquet",
        "user_id",
        "ts",
        "value",
        window_seconds=3600,
        tiebreak_cols=["event_id"],
    )


def q_phrase_search_documents(sf_dir: str) -> pd.DataFrame:
    """Exact phrase retrieval ('value table') over a positional
    inverted index: only the terms' shards are read, term-i postings
    shift to anchors p−i, and a (doc, anchor) groupby counts anchors
    holding all slots — overlap-correct occurrence counts, corpus
    never touched."""
    import tempfile
    from pathlib import Path

    from .search import build_positional_index, phrase_search

    tag = Path(sf_dir).name
    idx = f"{tempfile.gettempdir()}/graft_posidx_{tag}"
    if not Path(idx).exists():
        build_positional_index(
            f"{sf_dir}/documents.parquet", idx, num_shards=16
        )
    out = phrase_search(idx, ["value", "table"]).to_pandas()
    if "doc_id" not in out.columns:  # empty result loses schema
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "n_matches": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def q_monotonic_events_value(sf_dir: str) -> pd.DataFrame:
    """Monotonicity rule (R8): per-user, `value` must be non-decreasing
    in (ts, event_id) order — SQL LAG parity, NULLs never violate;
    verdict from the bucketed per-key shuffle stage."""
    return _single_rule_counts(
        sf_dir, "events",
        ValidationRule(
            name="m", rule_type="monotonic", column="value",
            parameters={
                "keys": ["user_id"],
                "order_by": ["ts", "event_id"],
                "direction": "non_decreasing",
            },
        ),
    )


def q_grouped_acf_events(sf_dir: str) -> Any:
    """Per-user lag-1..3 autocorrelation of event values in
    (ts, event_id) order — one bucketed shuffle, shifted-compare pair
    sweeps, moment-sum Pearson; SQL CORR-over-LAG conventions."""
    from .relational import grouped_acf

    return grouped_acf(
        f"{sf_dir}/events.parquet",
        "user_id",
        ["ts", "event_id"],
        "value",
        max_lag=3,
    )


def q_pareto_customers(sf_dir: str) -> Any:
    """Skyline of customers maximizing (total spend, order count):
    exact int64-cents aggregate (in-batch combiner + global sum), then
    per-batch partial frontiers merged in one final sweep (frontier of
    a union = frontier of union of frontiers)."""
    from ray.data.aggregate import Sum

    from .relational import pareto_frontier

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                + 0.5
            ).astype(np.int64)
        )
        t = pa.table({"o_custkey": batch["o_custkey"], "c": cents})
        g = t.group_by("o_custkey").aggregate([("c", "sum"), ("c", "count")])
        return g.rename_columns(["o_custkey", "sc", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("sc", alias_name="spend_cents"),
                   Sum("n", alias_name="n_orders"))
    )

    def tidy(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "spend_cents": pc.cast(batch["spend_cents"], pa.int64()),
                "n_orders": pc.cast(batch["n_orders"], pa.int64()),
            }
        )

    return pareto_frontier(
        agg.map_batches(tidy, batch_format="pyarrow"),
        "o_custkey",
        "spend_cents",
        "n_orders",
    )


def q_revenue_by_nation(sf_dir: str) -> Any:
    """TPC-H-Q5-style composition chained entirely in Ray (no driver
    collect between operators): customer enriched with nation via a
    broadcast join, orders enriched with the customer's nation via a
    broadcast join, lineitem reduced per batch to exact fixed-point
    revenue units then shuffle-joined to orders on the order key, and
    one nation-grouped int64 sum. Revenue units are
    ``FLOOR(l_extendedprice·(1−l_discount)·10⁴ + 0.5)`` — bit-identical
    in numpy and SQL, so the grouped sums are order-free exact."""
    from ray.data.aggregate import Sum

    from .relational import broadcast_join, hash_join

    cust = broadcast_join(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ),
        on="c_nationkey",
        right_on="n_nationkey",
        right_cols=["n_name"],
    )
    orders = broadcast_join(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ),
        cust,
        on="o_custkey",
        right_on="c_custkey",
        right_cols=["n_name"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        units = np.floor(p * (1.0 - d) * 10000.0 + 0.5).astype(np.int64)
        t = pa.table(
            {"l_orderkey": batch["l_orderkey"], "u": pa.array(units)}
        )
        g = t.group_by("l_orderkey").aggregate([("u", "sum")])
        return g.rename_columns(["l_orderkey", "u"])

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")

    joined = hash_join(
        li,
        orders,
        left_key="l_orderkey",
        right_key="o_orderkey",
        left_cols=["l_orderkey", "u"],
        right_cols=["o_orderkey", "n_name"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["n_name", "u"]).group_by("n_name").aggregate(
            [("u", "sum")]
        )
        return g.rename_columns(["n_name", "u"])

    out = (
        joined.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("u", alias_name="units"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        rev = pc.divide(
            pc.cast(batch["units"], pa.float64()), pa.scalar(10000.0)
        )
        return pa.table({"n_name": batch["n_name"], "revenue": rev})

    return out.map_batches(finalize, batch_format="pyarrow")


def q_chunk_documents(sf_dir: str) -> Any:
    """Sliding-window chunking (window 32, stride 24 whitespace
    tokens) — the LLM context-packing transform; zero shuffle, one
    explode + flat-take + binary_join per batch."""
    from .text import chunk_tokens

    return chunk_tokens(
        f"{sf_dir}/documents.parquet", window=32, stride=24
    )


def q_embedding_outliers(sf_dir: str) -> pd.DataFrame:
    """Cosine of each vector to the corpus centroid (embedding-outlier
    curation signal): one (n, Σx) partials pass + one broadcast-mean
    scoring pass; ROUND 6 both sides."""
    from .similarity import embedding_outlier_scores

    out = embedding_outlier_scores(
        f"{sf_dir}/embeddings.parquet"
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_cooccurrence_edges_suppliers(sf_dir: str) -> Any:
    """Distinct supplier co-occurrence edges (suppliers sharing an
    order) derived from the lineitem hyperedge table: per-batch
    distinct (order, supplier) combiner, ONE bucketed shuffle on the
    order key, quadratic pair sweep per group, edge dedup."""
    from .graph import cooccurrence_edges

    return cooccurrence_edges(
        f"{sf_dir}/lineitem.parquet", "l_orderkey", "l_suppkey"
    )


def q_triangle_count_suppliers(sf_dir: str) -> pd.DataFrame:
    """Exact triangle count of the supplier co-occurrence graph via
    degree-ordered orientation (out-degree capped at O(√m)), wedge
    generation in one bucketed pass and a closing-edge (a, b) bucketed
    match."""
    from .graph import cooccurrence_edges, triangle_count

    edges = cooccurrence_edges(
        f"{sf_dir}/lineitem.parquet", "l_orderkey", "l_suppkey"
    )
    return triangle_count(edges)


def q_pagerank_suppliers(sf_dir: str) -> pd.DataFrame:
    """Fixed-iteration (3) PageRank over the supplier co-occurrence
    graph — ranks as a Dataset, one shuffle join + one node-bounded
    grouped sum per iteration; ROUND 6 on both sides (sum order
    differs between engines at ~1e-16)."""
    from .graph import cooccurrence_edges, pagerank

    edges = cooccurrence_edges(
        f"{sf_dir}/lineitem.parquet", "l_orderkey", "l_suppkey"
    )
    out = pagerank(edges, iterations=3, damping=0.85).to_pandas()
    out["pr"] = out["pr"].round(6)
    return out.sort_values("node").reset_index(drop=True)


def queries() -> Dict[str, Callable[[str], Any]]:
    return {
        "completeness_documents_text": q_completeness_documents_text,
        "uniqueness_events_event_id": q_uniqueness_events_event_id,
        "uniqueness_composite_events": q_uniqueness_composite_events,
        "range_events_value": q_range_events_value,
        "range_events_ts": q_range_events_ts,
        "scoped_range_events": q_scoped_range_events,
        "scoped_uniqueness_events": q_scoped_uniqueness_events,
        "pattern_documents_lang": q_pattern_documents_lang,
        "membership_documents_lang": q_membership_documents_lang,
        "custom_orders_totalprice": q_custom_orders_totalprice,
        "custom_lineitem_expr": q_custom_lineitem_expr,
        "custom_orders_recent": q_custom_orders_recent,
        "custom_orders_having": q_custom_orders_having,
        "referential_events_user": q_referential_events_user,
        "referential_orders_cust": q_referential_orders_cust,
        "referential_events_nation_approx": q_referential_events_nation_approx,
        "referential_composite_lineitem": q_referential_composite_lineitem,
        "json_validity_events_props": q_json_validity_events_props,
        "fd_orders_cust_priority": q_fd_orders_cust_priority,
        "fd_composite_orders": q_fd_composite_orders,
        "late_arrival_events": q_late_arrival_events,
        "js_events_split": q_js_events_split,
        "freshness_events_ts": q_freshness_events_ts,
        "filter_documents": q_filter_documents,
        "filter_lineitem_custom": q_filter_lineitem_custom,
        "violations_events_value": q_violations_events_value,
        "stats_lineitem_quantity": q_stats_lineitem_quantity,
        "grouped_documents_lang": q_grouped_documents_lang,
        "dedup_exact_documents": q_dedup_exact_documents,
        "dedup_keep_newest_documents": q_dedup_keep_newest_documents,
        "token_count_documents": q_token_count_documents,
        "flagship_webpages": q_flagship_webpages,
        "partition_verdicts_webpages": q_partition_verdicts_webpages,
        "approx_uniqueness_events": q_approx_uniqueness_events,
        "ngram_jaccard_documents": q_ngram_jaccard_documents,
        "minhash_near_dup_documents": q_minhash_near_dup_documents,
        "near_dup_dedup_documents": q_near_dup_dedup_documents,
        "cc_labels_documents": q_cc_labels_documents,
        "simhash_documents": q_simhash_documents,
        "embedding_cosine_pairs": q_embedding_cosine_pairs,
        "embedding_cosine_pairs_blocked": q_embedding_cosine_pairs_blocked,
        "embedding_lsh_pairs": q_embedding_lsh_pairs,
        "embedding_lsh_pairs_sketch": q_embedding_lsh_pairs_sketch,
        "embedding_dedup_collapse_embeddings": q_embedding_dedup_collapse_embeddings,
        "knn_brute_embeddings": q_knn_brute_embeddings,
        "knn_join_embeddings": q_knn_join_embeddings,
        "knn_join_ivf_fullprobe_embeddings": q_knn_join_ivf_fullprobe_embeddings,
        "knn_graph_embeddings": q_knn_graph_embeddings,
        "knn_graph_clustered_embeddings": q_knn_graph_clustered_embeddings,
        "knn_ivf_embeddings": q_knn_ivf_embeddings,
        "knn_ivf_fullprobe_embeddings": q_knn_ivf_fullprobe_embeddings,
        "quality_stats_documents": q_quality_stats_documents,
        "language_id_documents": q_language_id_documents,
        "fingerprint_documents": q_fingerprint_documents,
        "text_profile_documents": q_text_profile_documents,
        "winnow_fingerprints_documents": q_winnow_fingerprints_documents,
        "drift_events_value": q_drift_events_value,
        "drift_events_value_fixed": q_drift_events_value_fixed,
        "rowcount_events": q_rowcount_events,
        "runner_documents_resume": q_runner_documents_resume,
        "windowed_events": q_windowed_events,
        "asof_events_orders": q_asof_events_orders,
        "range_join_events_bands": q_range_join_events_bands,
        "interval_join_events_orders": q_interval_join_events_orders,
        "multimodal_image_decode": q_multimodal_image_decode,
        "phash_images_media": q_phash_images_media,
        "phash_near_dup_media": q_phash_near_dup_media,
        "multimodal_audio_decode": q_multimodal_audio_decode,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "gopher_stats_documents": q_gopher_stats_documents,
        "gopher_filter_documents": q_gopher_filter_documents,
        "pii_redact_documents": q_pii_redact_documents,
        "decontaminate_documents": q_decontaminate_documents,
        "decontaminate_bloom_documents": q_decontaminate_bloom_documents,
        "domain_sample_documents": q_domain_sample_documents,
        "sample_n_events": q_sample_n_events,
        "sample_weighted_events": q_sample_weighted_events,
        "pack_shards_documents": q_pack_shards_documents,
        "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
        "curation_profile_documents": q_curation_profile_documents,
        "full_profile_documents": q_full_profile_documents,
        "assign_splits_documents": q_assign_splits_documents,
        "top_ngrams_documents": q_top_ngrams_documents,
        "top_values_events_user": q_top_values_events_user,
        "grouped_higher_moments_events": q_grouped_higher_moments_events,
        "misra_gries_events_user": q_misra_gries_events_user,
        "histogram_events_value": q_histogram_events_value,
        "repetition_rule_documents": q_repetition_rule_documents,
        "pii_rule_documents": q_pii_rule_documents,
        "url_profile_documents": q_url_profile_documents,
        "url_dedup_documents": q_url_dedup_documents,
        "domain_counts_documents": q_domain_counts_documents,
        "url_blocklist_documents": q_url_blocklist_documents,
        "cap_per_domain_documents": q_cap_per_domain_documents,
        "line_filter_documents": q_line_filter_documents,
        "robots_meta_documents": q_robots_meta_documents,
        "token_doc_freq_documents": q_token_doc_freq_documents,
        "vocab_coverage_documents": q_vocab_coverage_documents,
        "pattern_scan_documents": q_pattern_scan_documents,
        "tfidf_top_terms_documents": q_tfidf_top_terms_documents,
        "unigram_logprob_documents": q_unigram_logprob_documents,
        "unigram_logprob_capped_documents": q_unigram_logprob_capped_documents,
        "perplexity_buckets_documents": q_perplexity_buckets_documents,
        "perplexity_buckets_by_lang_documents": (
            q_perplexity_buckets_by_lang_documents
        ),
        "ccnet_pipeline_documents": q_ccnet_pipeline_documents,
        "fineweb_pipeline_documents": q_fineweb_pipeline_documents,
        "pipeline_spec_fineweb": q_pipeline_spec_fineweb,
        "pipeline_spec_ccnet": q_pipeline_spec_ccnet,
        "bigram_logprob_documents": q_bigram_logprob_documents,
        "bigram_logprob_capped_documents": q_bigram_logprob_capped_documents,
        "dsir_weights_documents": q_dsir_weights_documents,
        "dsir_weights_capped_documents": q_dsir_weights_capped_documents,
        "dsir_weights_fused_documents": q_dsir_weights_fused_documents,
        "dsir_select_documents": q_dsir_select_documents,
        "token_entropy_documents": q_token_entropy_documents,
        "quality_classifier_documents": q_quality_classifier_documents,
        "bpe_token_count_documents": q_bpe_token_count_documents,
        "normalize_text_documents": q_normalize_text_documents,
        "transform_runner_documents": q_transform_runner_documents,
        "sessionize_events": q_sessionize_events,
        "funnel_events": q_funnel_events,
        "cohort_retention_events": q_cohort_retention_events,
        "event_transitions_events": q_event_transitions_events,
        "cdc_apply_customer_events": q_cdc_apply_customer_events,
        "grouped_ols_events": q_grouped_ols_events,
        "key_skew_events": q_key_skew_events,
        "fuzzy_dup_pairs_documents": q_fuzzy_dup_pairs_documents,
        "boolean_search_documents": q_boolean_search_documents,
        "bm25_search_documents": q_bm25_search_documents,
        "hybrid_search_documents": q_hybrid_search_documents,
        "stream_validate_events": q_stream_validate_events,
        "stream_validate_delta_events": q_stream_validate_delta_events,
        "delta_maintenance_events": q_delta_maintenance_events,
        "delta_cdc_events": q_delta_cdc_events,
        "delta_source_events": q_delta_source_events,
        "grouped_ewma_events": q_grouped_ewma_events,
        "winsorize_events_value": q_winsorize_events_value,
        "ppjoin_jaccard_documents": q_ppjoin_jaccard_documents,
        "interval_coverage_events": q_interval_coverage_events,
        "orc_source_events": q_orc_source_events,
        "warc_source_documents": q_warc_source_documents,
        "parse_logs_events": q_parse_logs_events,
        "table_checksum_events": q_table_checksum_events,
        "schema_diff_events": q_schema_diff_events,
        "time_weighted_avg_events": q_time_weighted_avg_events,
        "benford_events_value": q_benford_events_value,
        "null_rate_by_day_events": q_null_rate_by_day_events,
        "association_rules_events": q_association_rules_events,
        "throttle_dedup_events": q_throttle_dedup_events,
        "grouped_cusum_events": q_grouped_cusum_events,
        "keyset_overlap_events_customer": q_keyset_overlap_events_customer,
        "kmv_overlap_events_customer": q_kmv_overlap_events_customer,
        "pmi_collocations_documents": q_pmi_collocations_documents,
        "top_users_by_type_events": q_top_users_by_type_events,
        "quantize_embeddings": q_quantize_embeddings,
        "containment_pairs_documents": q_containment_pairs_documents,
        "group_sample_documents": q_group_sample_documents,
        "approx_distinct_users_by_type": q_approx_distinct_users_by_type,
        "compression_stats_documents": q_compression_stats_documents,
        "broadcast_join_events": q_broadcast_join_events,
        "grouped_quantiles_events": q_grouped_quantiles_events,
        "hopping_window_events": q_hopping_window_events,
        "hopping_window_user_events": q_hopping_window_user_events,
        "hash_join_lineitem_orders": q_hash_join_lineitem_orders,
        "hash_join_salted_events": q_hash_join_salted_events,
        "hash_join_left_customer_events": q_hash_join_left_customer_events,
        "hash_join_full_customer_events": q_hash_join_full_customer_events,
        "anti_join_events_customer": q_anti_join_events_customer,
        "semi_join_events_bigspenders": q_semi_join_events_bigspenders,
        "anti_join_orders_lineitem": q_anti_join_orders_lineitem,
        "string_agg_events_by_user": q_string_agg_events_by_user,
        "count_distinct_events_by_type": q_count_distinct_events_by_type,
        "spine_fill_events": q_spine_fill_events,
        "distinct_rows_events": q_distinct_rows_events,
        "pivot_counts_events": q_pivot_counts_events,
        "exact_quantiles_events": q_exact_quantiles_events,
        "iqr_outliers_events": q_iqr_outliers_events,
        "psi_events_split": q_psi_events_split,
        "chi2_lang_split_documents": q_chi2_lang_split_documents,
        "charset_profile_documents": q_charset_profile_documents,
        "reconcile_orders_lineitem": q_reconcile_orders_lineitem,
        "partition_anomaly_events": q_partition_anomaly_events,
        "psi_by_group_events": q_psi_by_group_events,
        "ks_by_group_events": q_ks_by_group_events,
        "ks_events_split": q_ks_events_split,
        "ks_auto_events_split": q_ks_auto_events_split,
        "wasserstein_events_split": q_wasserstein_events_split,
        "cat_association_documents": q_cat_association_documents,
        "categorical_profile_documents": q_categorical_profile_documents,
        "interpolate_events_value": q_interpolate_events_value,
        "union_by_name_events": q_union_by_name_events,
        "incremental_agg_orders_events": q_incremental_agg_orders_events,
        "zorder_events": q_zorder_events,
        "suggest_rules_events": q_suggest_rules_events,
        "paragraph_dedup_documents": q_paragraph_dedup_documents,
        "domain_boilerplate_documents": q_domain_boilerplate_documents,
        "domain_gate_documents": q_domain_gate_documents,
        "seeded_shuffle_documents": q_seeded_shuffle_documents,
        "running_window_events": q_running_window_events,
        "moving_window_events": q_moving_window_events,
        "anomaly_zscore_events": q_anomaly_zscore_events,
        "ratio_to_report_events": q_ratio_to_report_events,
        "ratio_to_report_bucketed_events": q_ratio_to_report_bucketed_events,
        "interarrival_stats_events": q_interarrival_stats_events,
        "grouped_mad_events": q_grouped_mad_events,
        "period_over_period_events": q_period_over_period_events,
        "daily_active_users_events": q_daily_active_users_events,
        "weekly_active_users_events": q_weekly_active_users_events,
        "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
        "compact_files_events": q_compact_files_events,
        "float_anomaly_events": q_float_anomaly_events,
        "incremental_dedup_orders": q_incremental_dedup_orders,
        # rows-only: LSH near-dup semantics (banded collisions are the
        # POINT — a 31-token vocab makes some odd/even doc pairs
        # genuine near-dups); determinism + planted-copy certainty
        # pinned by tests/test_state.py
        "incremental_near_dup_documents": q_incremental_near_dup_documents,
        "incremental_dedup_sharded_orders": q_incremental_dedup_sharded_orders,
        "storage_profile_events": q_storage_profile_events,
        "canary_check_documents": q_canary_check_documents,
        "pipeline_spec_documents": q_pipeline_spec_documents,
        "pipeline_spec_multi_family": q_pipeline_spec_multi_family,
        "mix_to_budget_documents": q_mix_to_budget_documents,
        "temperature_mix_lang_documents": q_temperature_mix_lang_documents,
        "temperature_mix_chars_documents": q_temperature_mix_chars_documents,
        "fit_classifier_events": q_fit_classifier_events,
        "sketch_accuracy_report": q_sketch_accuracy_report,
        # rows-only: IVF recall is approximate by design; the report
        # IS the accuracy evidence (fullprobe row asserts 1.0)
        "ann_recall_report": q_ann_recall_report,
        "pruning_report_events": q_pruning_report_events,
        "multi_table_summary": q_multi_table_summary,
        "metric_anomaly_events": q_metric_anomaly_events,
        "negative_samples_documents": q_negative_samples_documents,
        "extract_all_numbers_events": q_extract_all_numbers_events,
        "histogram2d_lineitem": q_histogram2d_lineitem,
        "group_split_events": q_group_split_events,
        "top_users_plus_other_events": q_top_users_plus_other_events,
        "right_join_orders_customer": q_right_join_orders_customer,
        "missingness_matrix_events": q_missingness_matrix_events,
        "late_window_aggregate_events": q_late_window_aggregate_events,
        "time_range_window_events": q_time_range_window_events,
        "edge_values_events": q_edge_values_events,
        "unpivot_lineitem": q_unpivot_lineitem,
        "json_extract_events": q_json_extract_events,
        "rollup_documents": q_rollup_documents,
        "except_customers_events": q_except_customers_events,
        "intersect_events_users": q_intersect_events_users,
        "intersect_all_lineitem": q_intersect_all_lineitem,
        "except_all_lineitem": q_except_all_lineitem,
        "cube_events": q_cube_events,
        "top_events_by_value": q_top_events_by_value,
        "global_rank_events": q_global_rank_events,
        "grouped_stats_lineitem": q_grouped_stats_lineitem,
        "correlation_matrix_lineitem": q_correlation_matrix_lineitem,
        "type_conformance_events": q_type_conformance_events,
        "weighted_stats_lineitem": q_weighted_stats_lineitem,
        "join_size_profile_lineitem_orders": q_join_size_profile_lineitem_orders,
        "standardize_events_value": q_standardize_events_value,
        "robust_scale_events": q_robust_scale_events,
        "numeric_profile_events": q_numeric_profile_events,
        "table_profile_events": q_table_profile_events,
        "quantile_bucketize_events": q_quantile_bucketize_events,
        "rank_dense_events": q_rank_dense_events,
        "snapshot_diff_events": q_snapshot_diff_events,
        "grouped_mode_events": q_grouped_mode_events,
        "explode_embeddings": q_explode_embeddings,
        "dup_span_stats_documents": q_dup_span_stats_documents,
        "remove_dup_spans_documents": q_remove_dup_spans_documents,
        "forward_fill_events": q_forward_fill_events,
        "grouped_top_k_events": q_grouped_top_k_events,
        "calendar_agg_events": q_calendar_agg_events,
        "regex_extract_events": q_regex_extract_events,
        "try_cast_events": q_try_cast_events,
        "embedding_covariance_matrix": q_embedding_covariance,
        "embedding_norms": q_embedding_norms,
        "embedding_drift_splits": q_embedding_drift_splits,
        "pca_project_embeddings": q_pca_project_embeddings,
        "scd2_events_user_type": q_scd2_events_user_type,
        "disc_quantiles_events": q_disc_quantiles_events,
        "bucketed_join_lineitem_orders": q_bucketed_join_lineitem_orders,
        "group_limit_events_user": q_group_limit_events_user,
        "group_limit_orders_avg": q_group_limit_orders_avg,
        "correlation_lineitem": q_correlation_lineitem,
        "entropy_events_type": q_entropy_events_type,
        "distinctness_documents_lang": q_distinctness_documents_lang,
        "unique_value_ratio_orders": q_unique_value_ratio_orders,
        "mutual_information_documents": q_mutual_information_documents,
        "string_length_documents_text": q_string_length_documents_text,
        "label_encode_events": q_label_encode_events,
        "target_encode_events": q_target_encode_events,
        "grouping_sets_events": q_grouping_sets_events,
        "pivot_sums_events": q_pivot_sums_events,
        "range_checksums_events": q_range_checksums_events,
        "bloom_join_lineitem_orders": q_bloom_join_lineitem_orders,
        "bloom_anti_join_customers": q_bloom_anti_join_customers,
        "ohlc_events": q_ohlc_events,
        "phrase_search_documents": q_phrase_search_documents,
        "monotonic_events_value": q_monotonic_events_value,
        "grouped_acf_events": q_grouped_acf_events,
        "pareto_customers": q_pareto_customers,
        "revenue_by_nation": q_revenue_by_nation,
        "chunk_documents": q_chunk_documents,
        "embedding_outliers": q_embedding_outliers,
        "cooccurrence_edges_suppliers": q_cooccurrence_edges_suppliers,
        "triangle_count_suppliers": q_triangle_count_suppliers,
        "pagerank_suppliers": q_pagerank_suppliers,
    }


def oracle_sql() -> Dict[str, str]:
    counts = "SELECT COUNT(*)::BIGINT AS total_count, {failed}::BIGINT AS failed_count FROM {t}"
    # Morton interleave of two 8-bit grids as explicit bit arithmetic
    # (mirrors pipelines/layout.py zorder_key term-for-term)
    zterms = " + ".join(
        f"(((g0 >> {b}) & 1) << {2 * b}) + (((g1 >> {b}) & 1) << {2 * b + 1})"
        for b in range(8)
    )
    # constraint-suggestion reconstruction: one 0-or-1-row aggregate
    # branch per (column, rule_type) decision, mirroring stages/suggest
    _sg_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    _sg_num = ["event_id", "user_id", "value"]
    _sg_str = ["event_type", "props"]
    _sg = []
    for c in _sg_cols:
        _sg.append(
            f"SELECT '{c}' AS \"column\", 'completeness' AS rule_type, "
            "NULL::DOUBLE AS min_value, NULL::DOUBLE AS max_value, "
            "NULL::VARCHAR AS allowed FROM events "
            f"HAVING COUNT(*) FILTER (WHERE {c} IS NULL) = 0 "
            "AND COUNT(*) > 0"
        )
        _sg.append(
            f"SELECT '{c}', 'uniqueness', NULL::DOUBLE, NULL::DOUBLE, "
            "NULL::VARCHAR FROM events "
            f"HAVING COUNT(DISTINCT {c}) = COUNT({c}) AND COUNT({c}) > 0 "
            f"AND COUNT(*) = COUNT({c})"
        )
    for c in _sg_num:
        _sg.append(
            f"SELECT '{c}', 'range', MIN({c})::DOUBLE, MAX({c})::DOUBLE, "
            f"NULL::VARCHAR FROM events HAVING COUNT({c}) > 0"
        )
    for c in _sg_str:
        _sg.append(
            f"SELECT '{c}', 'membership', NULL::DOUBLE, NULL::DOUBLE, "
            f"string_agg(DISTINCT {c}, ',' ORDER BY {c}) FROM events "
            f"HAVING COUNT(DISTINCT {c}) <= 20 AND COUNT({c}) > 0"
        )
    suggest_oracle = (
        "SELECT * FROM (" + " UNION ALL ".join(_sg) +
        ') ORDER BY "column", rule_type'
    )
    planted_pairs = (
        "SELECT {id}::BIGINT AS id_a, ({id} + 1000000000)::BIGINT AS id_b "
        "FROM {t} ORDER BY id_a"
    )
    return {
        "flagship_webpages": _FLAGSHIP_ORACLE_SQL,
        "partition_verdicts_webpages": (
            "WITH " + _WEBPAGES_W_CTE + " "
            "SELECT COALESCE(length(url) % 8, -1)::BIGINT AS shard, "
            "COUNT(*)::BIGINT AS n_rows, "
            "COUNT(*) FILTER (WHERE warc_ts IS NULL)::BIGINT AS ts_null, "
            "COUNT(*) FILTER (WHERE warc_ts IS NOT NULL AND "
            "(warc_ts < TIMESTAMP '2013-01-01 00:00:00' OR "
            "warc_ts > TIMESTAMP '2026-01-01 00:00:00'))::BIGINT AS ts_oow, "
            "COUNT(*) FILTER (WHERE text = '')::BIGINT AS text_empty, "
            "((1.0 - COUNT(*) FILTER (WHERE warc_ts IS NULL)::DOUBLE "
            "/ COUNT(*)) >= 0.98 AND "
            "(1.0 - COUNT(*) FILTER (WHERE warc_ts IS NOT NULL AND "
            "(warc_ts < TIMESTAMP '2013-01-01 00:00:00' OR "
            "warc_ts > TIMESTAMP '2026-01-01 00:00:00'))::DOUBLE "
            "/ COUNT(*)) >= 0.96 AND "
            "(1.0 - COUNT(*) FILTER (WHERE text = '')::DOUBLE "
            "/ COUNT(*)) >= 0.97) AS passed "
            "FROM w GROUP BY 1 ORDER BY 1"
        ),
        "approx_uniqueness_events": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) - COUNT(DISTINCT event_id))::BIGINT AS failed_count, "
            "TRUE AS hll_ok FROM events"
        ),
        "approx_distinct_users_by_type": (
            "SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS "
            "n_distinct, TRUE AS hll_ok FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "misra_gries_events_user": (
            "WITH d AS (SELECT CASE WHEN event_id % 2 = 0 "
            "THEN user_id % 8 ELSE user_id + 10000 END AS hh "
            "FROM events WHERE user_id IS NOT NULL) "
            "SELECT hh::BIGINT AS value, COUNT(*)::BIGINT AS n_rows "
            "FROM d GROUP BY hh "
            "HAVING COUNT(*) > (SELECT COUNT(*) FROM d) / 65.0 "
            "ORDER BY value"
        ),
        "grouped_quantiles_events": (
            "SELECT event_type, "
            "ROUND(quantile_cont(value, 0.5), 6) AS p50, "
            "ROUND(quantile_cont(value, 0.95), 6) AS p95, "
            "ROUND(quantile_cont(value, 0.99), 6) AS p99, "
            "TRUE AS td_ok FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        # crawl B's kept set = odd docs minus those at exact 3-gram
        # J >= 0.5 with an even (crawl-A) doc: recrawled copies share
        # all band keys (certain drop), true near-dups band-collide and
        # exact-verify, and the pinned seed produces no spurious
        # collisions on this corpus (verified sf0.001 + sf0.01).
        # kept_after_update = docs too short to shingle (none here).
        "incremental_near_dup_documents": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(generate_series(1, len(t)-2), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle "
            "FROM toks), "
            "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i "
            "FROM sh a JOIN sh b ON a.shingle = b.shingle "
            "AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0 GROUP BY 1, 2), "
            "dropped AS (SELECT DISTINCT ia AS doc_id FROM inter "
            "JOIN sizes sa ON sa.doc_id = ia "
            "JOIN sizes sb ON sb.doc_id = ib "
            "WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5), "
            "short AS (SELECT COUNT(*)::BIGINT AS n FROM documents "
            "WHERE len(string_split(COALESCE(text, ''), ' ')) < 3) "
            "SELECT doc_id::BIGINT AS doc_id, "
            "(SELECT n FROM short) AS kept_after_update "
            "FROM documents WHERE doc_id % 2 = 1 "
            "AND doc_id NOT IN (SELECT doc_id FROM dropped) "
            "ORDER BY doc_id"
        ),
        "table_profile_events": (
            "SELECT * FROM ("
            + " UNION ALL ".join(
                "SELECT '{c}' AS \"column\", '{dt}' AS dtype, "
                "COUNT(*)::BIGINT AS total_count, "
                "(COUNT(*) - COUNT({c}))::BIGINT AS null_count, "
                "COUNT(DISTINCT {c})::BIGINT AS n_distinct, "
                "TRUE AS hll_ok, {mn} AS min_value, {mx} AS max_value, "
                "{mean} AS mean_value FROM events".format(
                    c=c, dt=dt,
                    mn=f"MIN({c})::DOUBLE" if num else "NULL::DOUBLE",
                    mx=f"MAX({c})::DOUBLE" if num else "NULL::DOUBLE",
                    mean=f"ROUND(AVG({c}), 6)" if num else "NULL::DOUBLE",
                )
                for c, dt, num in [
                    ("event_id", "int64", True),
                    ("ts", "timestamp[us]", False),
                    ("user_id", "int64", True),
                    ("event_type", "string", False),
                    ("value", "double", True),
                    ("props", "string", False),
                ]
            )
            + ') ORDER BY "column"'
        ),
        "simhash_documents": planted_pairs.format(id="doc_id", t="documents"),
        "embedding_lsh_pairs": planted_pairs.format(
            id="vec_id", t="embeddings"
        ),
        "embedding_lsh_pairs_sketch": planted_pairs.format(
            id="vec_id", t="embeddings"
        ),
        "semantic_dedup_embeddings": (
            "SELECT COUNT(*)::BIGINT AS n_copies, "
            "0::BIGINT AS n_copies_surviving, "
            "TRUE AS all_copies_dropped FROM embeddings"
        ),
        "knn_graph_clustered_embeddings": (
            "SELECT q AS query_id, 1::BIGINT AS rank, n AS neighbor_id "
            "FROM (SELECT vec_id::BIGINT AS q, "
            "(vec_id + 1000000000)::BIGINT AS n FROM embeddings "
            "UNION ALL SELECT (vec_id + 1000000000)::BIGINT, "
            "vec_id::BIGINT FROM embeddings) ORDER BY query_id"
        ),
        "knn_ivf_embeddings": (
            "SELECT vec_id::BIGINT AS query_id, 1::BIGINT AS rank, "
            "(vec_id + 1000000000)::BIGINT AS neighbor_id "
            "FROM embeddings WHERE vec_id < 5 ORDER BY query_id"
        ),
        "completeness_documents_text": counts.format(
            failed="COUNT(*) FILTER (WHERE text IS NULL)", t="documents"
        ),
        "uniqueness_events_event_id": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) - COUNT(DISTINCT event_id))::BIGINT AS failed_count FROM events"
        ),
        "uniqueness_composite_events": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) - COUNT(DISTINCT CASE WHEN user_id IS NOT NULL "
            "AND event_type IS NOT NULL THEN (user_id, event_type) END))"
            "::BIGINT AS failed_count FROM events"
        ),
        "range_events_value": counts.format(
            failed="COUNT(*) FILTER (WHERE value < 0 OR value > 100)", t="events"
        ),
        "scoped_range_events": counts.format(
            failed="COUNT(*) FILTER (WHERE value < 0 OR value > 90)",
            t="events WHERE event_type = 'click'",
        ),
        "scoped_uniqueness_events": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) - COUNT(DISTINCT user_id))::BIGINT AS failed_count "
            "FROM events WHERE event_type = 'click'"
        ),
        "range_events_ts": counts.format(
            failed="COUNT(*) FILTER (WHERE ts < TIMESTAMP '2024-01-01 00:00:00' "
                   "OR ts > TIMESTAMP '2024-06-30 23:59:59')",
            t="events",
        ),
        "pattern_documents_lang": counts.format(
            failed="COUNT(*) FILTER (WHERE NOT regexp_matches(lang, '^[a-z]{2}$'))",
            t="documents",
        ),
        "membership_documents_lang": counts.format(
            failed="COUNT(*) FILTER (WHERE lang IS NOT NULL AND "
                   "lang NOT IN ('en','de','fr','es','zh'))",
            t="documents",
        ),
        "custom_orders_totalprice": counts.format(
            failed="COUNT(*) FILTER (WHERE o_totalprice > 150000)", t="orders"
        ),
        "custom_lineitem_expr": counts.format(
            failed="COUNT(*) FILTER (WHERE l_extendedprice * (1 - l_discount) > 30000 "
                   "AND l_returnflag != 'R' AND l_shipdate >= DATE '1995-01-01')",
            t="lineitem",
        ),
        "custom_orders_recent": counts.format(
            failed="COUNT(*) FILTER (WHERE o_orderdate < "
                   "CURRENT_DATE - INTERVAL 30 YEAR)",
            t="orders",
        ),
        "custom_orders_having": (
            # the oracle literally runs the HAVING query, DuckDB
            # fetchone semantics with no-row → 0
            "SELECT (SELECT COUNT(*) FROM orders)::BIGINT AS total_count, "
            "COALESCE((SELECT COUNT(*) - COUNT(o_custkey) FROM orders "
            "HAVING COUNT(*) > 100), 0)::BIGINT AS failed_count"
        ),
        "referential_events_user": counts.format(
            failed="COUNT(*) FILTER (WHERE user_id IS NOT NULL AND user_id NOT IN "
                   "(SELECT c_custkey FROM customer))",
            t="events",
        ),
        "referential_orders_cust": counts.format(
            failed="COUNT(*) FILTER (WHERE o_custkey IS NOT NULL AND o_custkey NOT IN "
                   "(SELECT c_custkey FROM customer))",
            t="orders",
        ),
        "referential_events_nation_approx": counts.format(
            failed="COUNT(*) FILTER (WHERE user_id IS NOT NULL AND user_id NOT IN "
                   "(SELECT n_nationkey FROM nation))",
            t="events",
        ),
        "json_validity_events_props": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE props IS NOT NULL "
            "AND NOT json_valid(props)))::BIGINT AS failed_count "
            "FROM events"
        ),
        "referential_composite_lineitem": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL "
            "AND l_partkey IS NOT NULL AND NOT EXISTS ("
            "SELECT 1 FROM lineitem r WHERE r.l_linenumber = 1 "
            "AND r.l_orderkey = l.l_orderkey "
            "AND r.l_partkey = l.l_partkey)))::BIGINT AS failed_count "
            "FROM lineitem l"
        ),
        "fd_orders_cust_priority": (
            # determinant-level FD verdict: total = distinct custkeys,
            # failed = custkeys mapping to >1 distinct priority
            "WITH g AS (SELECT o_custkey, "
            "COUNT(DISTINCT o_orderpriority) AS c FROM orders "
            "WHERE o_custkey IS NOT NULL GROUP BY o_custkey) "
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE c > 1))::BIGINT AS failed_count FROM g"
        ),
        "late_arrival_events": (
            # running event-time watermark over arrival order; NULL ts
            # rows are never late and never advance the watermark
            "WITH w AS (SELECT user_id, epoch_us(ts) AS t, "
            "MAX(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS pm FROM events) "
            "SELECT user_id, COUNT(*)::BIGINT AS n, "
            "(COUNT(*) FILTER (WHERE t < pm))::BIGINT AS n_late, "
            "COALESCE(MAX(CASE WHEN t < pm THEN pm - t END), 0)::BIGINT "
            "AS max_lateness_us, "
            "ROUND((COUNT(*) FILTER (WHERE t < pm))::DOUBLE / COUNT(*), 6) "
            "AS frac_late "
            "FROM w GROUP BY user_id ORDER BY user_id"
        ),
        "fd_composite_orders": (
            "WITH g AS (SELECT o_custkey, o_orderpriority, "
            "COUNT(DISTINCT o_orderstatus) AS c FROM orders "
            "WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL "
            "GROUP BY o_custkey, o_orderpriority) "
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE c > 1))::BIGINT AS failed_count FROM g"
        ),
        "js_events_split": (
            # same searchsorted-right binning as psi_events_split; JS
            # with m = (p+q)/2, 0*ln0 = 0, no epsilon floor
            "WITH edges AS (SELECT [0.0,10.0,20.0,30.0,40.0,50.0,60.0,"
            "70.0,80.0,90.0,100.0] AS e), "
            "b AS (SELECT len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events "
            "WHERE event_id % 2 = 0 AND value IS NOT NULL), "
            "c AS (SELECT len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events "
            "WHERE event_id % 2 = 1 AND value IS NOT NULL), "
            "grid AS (SELECT unnest(generate_series(0, 11)) AS bin), "
            "bp AS (SELECT grid.bin, COALESCE(cnt, 0) / "
            "(SELECT COUNT(*)::DOUBLE FROM b) AS p FROM grid "
            "LEFT JOIN (SELECT bin, COUNT(*)::DOUBLE AS cnt FROM b "
            "GROUP BY bin) t USING (bin)), "
            "cp AS (SELECT grid.bin, COALESCE(cnt, 0) / "
            "(SELECT COUNT(*)::DOUBLE FROM c) AS p FROM grid "
            "LEFT JOIN (SELECT bin, COUNT(*)::DOUBLE AS cnt FROM c "
            "GROUP BY bin) t USING (bin)) "
            "SELECT (SELECT COUNT(*) FROM b)::BIGINT AS n_base, "
            "(SELECT COUNT(*) FROM c)::BIGINT AS n_current, "
            "ROUND(SUM(CASE WHEN bp.p > 0 THEN 0.5 * bp.p * "
            "LN(bp.p / ((bp.p + cp.p) / 2)) ELSE 0 END + "
            "CASE WHEN cp.p > 0 THEN 0.5 * cp.p * "
            "LN(cp.p / ((bp.p + cp.p) / 2)) ELSE 0 END), 6) AS js_value "
            "FROM bp JOIN cp USING (bin)"
        ),
        "freshness_events_ts": (
            "SELECT (EXTRACT(EPOCH FROM (TIMESTAMP '2024-02-05 00:00:00' "
            "- MAX(ts))) <= 7 * 86400) AS passed, "
            "ROUND(EXTRACT(EPOCH FROM (TIMESTAMP '2024-02-05 00:00:00' "
            "- MAX(ts))), 6) AS lag_seconds, "
            "1::BIGINT AS total_count, "
            "(CASE WHEN EXTRACT(EPOCH FROM (TIMESTAMP '2024-02-05 00:00:00' "
            "- MAX(ts))) <= 7 * 86400 THEN 0 ELSE 1 END)::BIGINT "
            "AS failed_count FROM events"
        ),
        "filter_documents": (
            "SELECT * FROM documents WHERE text IS NOT NULL "
            "AND n_chars >= 100 AND n_chars <= 5000 "
            "AND regexp_matches(lang, '^[a-z]{2}$')"
        ),
        "filter_lineitem_custom": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
            "l_discount FROM lineitem "
            "WHERE l_extendedprice * (1 - l_discount) >= 1000 "
            "AND l_shipdate < DATE '1998-01-01' "
            "AND l_quantity >= 5 AND l_quantity <= 45"
        ),
        "violations_events_value": (
            "SELECT *, 'value_range' AS rule_name FROM events "
            "WHERE value < 0 OR value > 100"
        ),
        "stats_lineitem_quantity": (
            "SELECT MIN(l_quantity) AS min_value, MAX(l_quantity) AS max_value, "
            "COUNT(*) FILTER (WHERE l_quantity IS NULL)::BIGINT AS null_count, "
            "COUNT(*)::BIGINT AS total_count FROM lineitem"
        ),
        "grouped_documents_lang": (
            "SELECT lang, COUNT(*)::BIGINT AS total_count, "
            "COALESCE(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END), 0)::BIGINT "
            "AS short_count FROM documents GROUP BY lang"
        ),
        "dedup_exact_documents": (
            "SELECT MIN(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text"
        ),
        "dedup_keep_newest_documents": (
            "SELECT doc_id, lang, source FROM documents"
            " QUALIFY row_number() OVER ("
            "   PARTITION BY lang ORDER BY doc_id DESC) = 1"
            " ORDER BY lang"
        ),
        "token_count_documents": (
            "SELECT doc_id, length(regexp_extract_all(text, '\\S+'))::BIGINT "
            "AS n_tokens FROM documents"
        ),
        "ngram_jaccard_documents": _NGRAM_JACCARD_SQL.format(threshold=0.2),
        "minhash_near_dup_documents": _NGRAM_JACCARD_SQL.format(threshold=0.5),
        "ppjoin_jaccard_documents": _NGRAM_JACCARD_SQL.format(threshold=0.5),
        "near_dup_dedup_documents": _NEAR_DUP_DEDUP_SQL,
        "cc_labels_documents": _CC_LABELS_SQL,
        "windowed_events": (
            "SELECT time_bucket(INTERVAL 3600 SECONDS, ts) AS window_start, "
            "event_type, COUNT(*)::BIGINT AS n_events, "
            "ROUND(SUM(value), 6) AS value_sum, MIN(value) AS value_min, "
            "MAX(value) AS value_max, ROUND(AVG(value), 6) AS value_avg "
            "FROM events WHERE ts IS NOT NULL "
            "GROUP BY window_start, event_type "
            "ORDER BY window_start, event_type"
        ),
        "range_join_events_bands": (
            "SELECT e.event_id, b.band FROM events e JOIN (VALUES "
            "(0.0, 10.0, 'xs'), (10.0, 25.0, 's'), (25.0, 50.0, 'm'), "
            "(50.0, 100.0, 'l'), (100.0, 1e9, 'xl')) AS b(lo, hi, band) "
            "ON e.value >= b.lo AND e.value < b.hi ORDER BY e.event_id"
        ),
        "interval_join_events_orders": (
            "WITH iv AS (SELECT o_orderkey AS iv_key, "
            "o_totalprice / 1000.0 AS lo, o_totalprice / 1000.0 + 5 AS hi "
            "FROM orders WHERE o_orderkey % 20 = 0) "
            "SELECT e.event_id, iv.iv_key, ROUND(iv.lo, 6) AS lo, "
            "ROUND(iv.hi, 6) AS hi "
            "FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi "
            "ORDER BY e.event_id, iv.iv_key"
        ),
        "asof_events_orders": (
            "WITH r AS (SELECT o_custkey, o_orderdate, "
            "           MAX(o_orderkey) AS o_orderkey "
            "           FROM orders GROUP BY o_custkey, o_orderdate), "
            "r2 AS (SELECT r.o_custkey, r.o_orderdate, r.o_orderkey, "
            "              o.o_totalprice "
            "       FROM r JOIN orders o ON o.o_orderkey = r.o_orderkey) "
            "SELECT e.event_id, e.user_id, e.ts, r2.o_orderkey, "
            "r2.o_totalprice "
            "FROM events e ASOF JOIN r2 "
            "ON e.user_id = r2.o_custkey AND e.ts >= r2.o_orderdate "
            "ORDER BY e.event_id"
        ),
        "embedding_cosine_pairs": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4 "
            "ORDER BY id_a, id_b"
        ),
        "embedding_cosine_pairs_blocked": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4 "
            "ORDER BY id_a, id_b"
        ),
        "embedding_dedup_collapse_embeddings": (
            "WITH RECURSIVE pairs AS ("
            " SELECT a.vec_id AS id_a, b.vec_id AS id_b"
            " FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id"
            " WHERE list_cosine_similarity(a.embedding, b.embedding)"
            "       >= 0.4"
            "), edges AS ("
            "  SELECT id_a AS a, id_b AS b FROM pairs"
            "  UNION SELECT id_b, id_a FROM pairs"
            "), reach(src, dst) AS ("
            "  SELECT a, b FROM edges"
            "  UNION SELECT r.src, e.b FROM reach r JOIN edges e"
            "    ON r.dst = e.a"
            "), lbl AS ("
            "  SELECT src, LEAST(src, MIN(dst)) AS root FROM reach"
            "  GROUP BY src"
            ") "
            "SELECT vec_id::BIGINT AS vec_id FROM embeddings "
            "WHERE vec_id NOT IN (SELECT src FROM lbl WHERE root < src) "
            "ORDER BY vec_id"
        ),
        "knn_brute_embeddings": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "           FROM embeddings WHERE vec_id < 5), "
            "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "             list_cosine_similarity(q.qe, e.embedding) AS cos "
            "      FROM q, embeddings e WHERE e.vec_id != q.query_id), "
            "r AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC"
            "      ) AS rank FROM s) "
            "SELECT query_id, rank::BIGINT AS rank, neighbor_id "
            "FROM r WHERE rank <= 10 ORDER BY query_id, rank"
        ),
        "knn_join_embeddings": _KNN_JOIN_SQL,
        # full probe is exact — the IVF actor-pool tier shares the oracle
        "knn_join_ivf_fullprobe_embeddings": _KNN_JOIN_SQL,
        "knn_graph_embeddings": (
            "WITH s AS (SELECT a.vec_id AS query_id, "
            "b.vec_id AS neighbor_id, "
            "list_cosine_similarity(a.embedding, b.embedding) AS cos "
            "FROM embeddings a, embeddings b "
            "WHERE a.vec_id != b.vec_id), "
            "r AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC"
            ") AS rank FROM s) "
            "SELECT query_id, rank::BIGINT AS rank, neighbor_id "
            "FROM r WHERE rank <= 5 ORDER BY query_id, rank"
        ),
        # full-probe IVF is exact, so the brute-force oracle applies —
        # this pins the index build/layout/scored-merge path to SQL
        "knn_ivf_fullprobe_embeddings": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "           FROM embeddings WHERE vec_id < 5), "
            "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "             list_cosine_similarity(q.qe, e.embedding) AS cos "
            "      FROM q, embeddings e WHERE e.vec_id != q.query_id), "
            "r AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC"
            "      ) AS rank FROM s) "
            "SELECT query_id, rank::BIGINT AS rank, neighbor_id "
            "FROM r WHERE rank <= 10 ORDER BY query_id, rank"
        ),
        "quality_stats_documents": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars, "
            "len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT "
            "AS n_tokens, "
            f"len(list_filter(string_split(text, ' '), x -> x IN ({_EN_STOP})))"
            "::BIGINT AS n_stopwords, "
            "len(list_distinct(list_filter(string_split(text, ' '), "
            "x -> x <> '')))::BIGINT AS n_unique_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "quality_classifier_documents": (
            "WITH q AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
            "len(list_filter(string_split(text, ' '), x -> x <> ''))"
            "::BIGINT AS n_tokens, "
            f"len(list_filter(string_split(text, ' '), x -> x IN ({_EN_STOP})))"
            "::BIGINT AS n_stopwords, "
            "len(list_distinct(list_filter(string_split(text, ' '), "
            "x -> x <> '')))::BIGINT AS n_unique_tokens FROM documents), "
            "z AS (SELECT *, 0.0005 * n_chars + 0.02 * n_tokens + "
            "0.08 * n_stopwords - 0.03 * n_unique_tokens - 1.5 AS zv "
            "FROM q) "
            "SELECT doc_id, n_chars, n_tokens, n_stopwords, "
            "n_unique_tokens, "
            "ROUND(1.0 / (1.0 + EXP(-zv)), 6) AS score, "
            "(1.0 / (1.0 + EXP(-zv)) >= 0.5)::BIGINT AS label "
            "FROM z ORDER BY doc_id"
        ),
        "language_id_documents": _LANGUAGE_ID_SQL,
        "text_profile_documents": (
            "WITH q AS ({q}), l AS ({l}), f AS ({f}) "
            "SELECT q.*, l.* EXCLUDE (doc_id), f.fingerprint "
            "FROM q JOIN l ON q.doc_id = l.doc_id "
            "JOIN f ON q.doc_id = f.doc_id ORDER BY q.doc_id"
        ).format(
            q="SELECT doc_id, length(text)::BIGINT AS n_chars, "
              "len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT "
              "AS n_tokens, "
              f"len(list_filter(string_split(text, ' '), x -> x IN ({_EN_STOP})))"
              "::BIGINT AS n_stopwords, "
              "len(list_distinct(list_filter(string_split(text, ' '), "
              "x -> x <> '')))::BIGINT AS n_unique_tokens FROM documents",
            l=_LANGUAGE_ID_SQL.replace(" ORDER BY doc_id", ""),
            f="SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', "
              "'g'))) AS fingerprint FROM documents",
        ),
        "multimodal_image_decode": (
            "WITH seq AS (SELECT (row_number() OVER ()) - 1 AS media_id "
            "FROM documents), "
            "ids AS (SELECT media_id FROM seq WHERE media_id % 3 = 0) "
            "SELECT media_id, (8 + media_id % 32)::BIGINT AS width, "
            "(8 + (media_id * 7) % 32)::BIGINT AS height, "
            "(1 + media_id % 3)::BIGINT AS channels, "
            "(9 + (8 + media_id % 32) * (8 + (media_id * 7) % 32) * "
            "(1 + media_id % 3))::BIGINT AS n_bytes "
            "FROM ids ORDER BY media_id"
        ),
        "multimodal_audio_decode": (
            "WITH seq AS (SELECT (row_number() OVER ()) - 1 AS media_id "
            "FROM documents), "
            "ids AS (SELECT media_id FROM seq WHERE media_id % 3 = 1) "
            "SELECT media_id, "
            "(8000 + (media_id % 4) * 4000)::BIGINT AS sample_rate, "
            "(256 + (media_id * 13) % 1024)::BIGINT AS n_samples, "
            "((256 + (media_id * 13) % 1024) * 1000 // "
            "(8000 + (media_id % 4) * 4000))::BIGINT AS duration_ms, "
            "(12 + 2 * (256 + (media_id * 13) % 1024))::BIGINT AS n_bytes "
            "FROM ids ORDER BY media_id"
        ),
        # every-2nd-frame sampling: nf = 4 + id%8 per the payload
        # header formula; range() is exclusive-stop, stride 2
        "multimodal_frame_sample": (
            "WITH seq AS (SELECT (row_number() OVER ()) - 1 AS media_id "
            "FROM documents), "
            "ids AS (SELECT media_id FROM seq WHERE media_id % 3 = 2) "
            "SELECT media_id, "
            "unnest(range(0, 4 + media_id % 8, 2))::BIGINT AS frame_idx "
            "FROM ids ORDER BY media_id, frame_idx"
        ),
        "runner_documents_resume": (
            "WITH rpf AS (SELECT CAST(CEIL(COUNT(*) / 8.0) AS BIGINT) AS v "
            "             FROM documents), "
            "p AS (SELECT doc_id // (SELECT v FROM rpf) AS partition_id, "
            "             text, n_chars, lang FROM documents) "
            "SELECT partition_id::BIGINT AS partition_id, "
            "'text_complete' AS rule_name, COUNT(*)::BIGINT AS total_count, "
            "COUNT(*) FILTER (WHERE text IS NULL)::BIGINT AS failed_count "
            "FROM p GROUP BY partition_id "
            "UNION ALL "
            "SELECT partition_id::BIGINT, 'chars_range', COUNT(*)::BIGINT, "
            "COUNT(*) FILTER (WHERE n_chars < 100 OR n_chars > 5000)::BIGINT "
            "FROM p GROUP BY partition_id "
            "UNION ALL "
            "SELECT partition_id::BIGINT, 'lang_pattern', COUNT(*)::BIGINT, "
            "COUNT(*) FILTER (WHERE NOT regexp_matches(lang, '^[a-z]{2}$'))"
            "::BIGINT FROM p GROUP BY partition_id "
            "ORDER BY partition_id, rule_name"
        ),
        "fingerprint_documents": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', "
            "'g'))) AS fingerprint FROM documents ORDER BY doc_id"
        ),
        "gopher_stats_documents": _GOPHER_STATS_SQL,
        "gopher_filter_documents": _GOPHER_FILTER_SQL,
        "pii_redact_documents": _PII_REDACT_SQL,
        "decontaminate_documents": _DECONTAMINATE_SQL,
        # bloom tier vs the EXACT-tier SQL: false negatives are
        # impossible and the FP probability at sf0.01 cardinalities is
        # ~1e-15 with deterministic hashing, so the comparison is exact
        "decontaminate_bloom_documents": _DECONTAMINATE_SQL,
        "domain_sample_documents": _DOMAIN_SAMPLE_SQL,
        "sample_n_events": (
            "SELECT event_id, user_id, value FROM ("
            "SELECT event_id, user_id, value FROM events "
            "ORDER BY (event_id * 2654435761) % 4294967296, event_id "
            "LIMIT 200) ORDER BY event_id"
        ),
        "sample_weighted_events": (
            "SELECT event_id, user_id, value FROM ("
            "SELECT event_id, user_id, value FROM events "
            "WHERE value IS NOT NULL AND value > 0 "
            "ORDER BY (((event_id * 2654435761) % 4294967296) + 1)"
            " / 4294967296.0 / value, event_id "
            "LIMIT 150) ORDER BY event_id"
        ),
        "pack_shards_documents": _PACK_SHARDS_SQL,
        "curation_profile_documents": _CURATION_PROFILE_SQL,
        "full_profile_documents": _FULL_PROFILE_SQL,
        "top_ngrams_documents": (
            "WITH base AS (SELECT list_filter(string_split("
            "coalesce(text, ''), ' '), x -> x <> '') AS toks"
            " FROM documents),"
            " g AS (SELECT unnest(list_transform("
            "generate_series(1, len(toks) - 1),"
            " i -> toks[i] || ' ' || toks[i+1])) AS ngram FROM base) "
            "SELECT ngram, COUNT(*)::BIGINT AS n FROM g"
            " GROUP BY 1 ORDER BY n DESC, ngram ASC LIMIT 20"
        ),
        "assign_splits_documents": (
            "WITH h AS (SELECT doc_id,"
            " (doc_id * 2654435761) % 1000 AS hh FROM documents) "
            "SELECT doc_id, CASE WHEN hh < 980 THEN 'train'"
            " WHEN hh < 990 THEN 'val' ELSE 'test' END AS split"
            " FROM h ORDER BY doc_id"
        ),
        "top_values_events_user": (
            "SELECT user_id AS value, COUNT(*)::BIGINT AS n FROM events"
            " GROUP BY 1 ORDER BY n DESC, value ASC LIMIT 10"
        ),
        "grouped_higher_moments_events": (
            "SELECT user_id, COUNT(value)::BIGINT AS n_x, "
            "ROUND(skewness(value), 6) AS skew_x, "
            "ROUND(kurtosis(value), 6) AS kurt_x "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "histogram_events_value": (
            "WITH v AS (SELECT value FROM events"
            "  WHERE value IS NOT NULL AND value >= 0 AND value < 512),"
            " b AS (SELECT LEAST(CAST(FLOOR(value / 16.0) AS BIGINT), 31)"
            "       AS bin_id FROM v) "
            "SELECT bin_id, bin_id * 16.0 AS bin_lo,"
            " (bin_id + 1) * 16.0 AS bin_hi, COUNT(*)::BIGINT AS n"
            " FROM b GROUP BY 1 ORDER BY 1"
        ),
        "repetition_rule_documents": _REPETITION_RULE_SQL,
        "pii_rule_documents": _PII_RULE_SQL,
        "url_profile_documents": _URL_PROFILE_SQL,
        "url_blocklist_documents": _URL_BLOCKLIST_SQL,
        "cap_per_domain_documents": _CAP_PER_DOMAIN_SQL,
        "line_filter_documents": _LINE_FILTER_SQL,
        "robots_meta_documents": (
            "WITH h AS ("
            "  SELECT doc_id,"
            "    '<html><head>' ||"
            "    CASE WHEN doc_id % 9 = 0 AND doc_id % 13 = 0 THEN"
            "      '<meta name=\"robots\" content=\"noindex, nofollow\">'"
            "    WHEN doc_id % 9 = 0 THEN"
            "      '<meta name=\"robots\" content=\"noindex\">'"
            "    WHEN doc_id % 13 = 0 THEN"
            "      '<meta name=\"robots\" content=\"nofollow\">'"
            "    ELSE '' END ||"
            "    '</head><body><p>page</p></body></html>' AS html"
            "  FROM documents"
            ") "
            "SELECT doc_id,"
            " regexp_matches(html,"
            "   '(?i)<meta[^>]*robots[^>]*content\\s*=\\s*\"[^\"]*\\b(nofollow)\\b')"
            "   AS robots_nofollow"
            " FROM h"
            " WHERE NOT regexp_matches(html,"
            "   '(?i)<meta[^>]*robots[^>]*content\\s*=\\s*\"[^\"]*\\b(noindex)\\b')"
            " ORDER BY doc_id"
        ),
        "url_dedup_documents": _URL_DEDUP_SQL,
        "domain_counts_documents": _DOMAIN_COUNTS_SQL,
        "token_doc_freq_documents": _TOKEN_DF_SQL,
        "vocab_coverage_documents": (
            "WITH tok AS ("
            "  SELECT doc_id, unnest(list_filter("
            "    string_split(coalesce(text, ''), ' '), x -> x <> ''"
            "  )) AS token FROM documents"
            "), vocab AS ("
            "  SELECT token FROM ("
            "    SELECT token, count(*) AS c FROM tok GROUP BY token"
            "    ORDER BY c DESC, token LIMIT 256)"
            "), per AS ("
            "  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,"
            "    SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT"
            "      AS n_oov"
            "  FROM tok t LEFT JOIN vocab v ON t.token = v.token"
            "  GROUP BY t.doc_id"
            ") "
            "SELECT d.doc_id, COALESCE(p.n_tokens, 0)::BIGINT AS n_tokens, "
            "COALESCE(p.n_oov, 0)::BIGINT AS n_oov, "
            "p.n_oov / p.n_tokens AS oov_rate "
            "FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id "
            "ORDER BY d.doc_id"
        ),
        "pattern_scan_documents": (
            "WITH pats AS (SELECT unnest(["
            + ", ".join(f"'{p}'" for p in _SCAN_PATTERNS)
            + "]) AS pattern) "
            "SELECT p.pattern, "
            "COALESCE(SUM((length(d.text) - "
            "length(replace(d.text, p.pattern, ''))) "
            "// length(p.pattern)), 0)::BIGINT AS n_occurrences, "
            "COALESCE(SUM(CASE WHEN contains(d.text, p.pattern) "
            "THEN 1 ELSE 0 END), 0)::BIGINT AS n_docs "
            "FROM pats p CROSS JOIN documents d "
            "GROUP BY p.pattern ORDER BY p.pattern"
        ),
        "tfidf_top_terms_documents": _TFIDF_SQL,
        "bpe_token_count_documents": (
            "SELECT doc_id, len(regexp_extract_all(COALESCE(text, ''), "
            r"' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))::BIGINT "
            "AS n_pretokens FROM documents ORDER BY doc_id"
        ),
        "unigram_logprob_documents": _UNIGRAM_LOGPROB_SQL,
        # same oracle: the 4096 cap exceeds the corpus's 31 distinct
        # tokens, so the distributed top-V tier must be byte-identical
        "unigram_logprob_capped_documents": _UNIGRAM_LOGPROB_SQL,
        "perplexity_buckets_documents": (
            "WITH base AS (" + _UNIGRAM_LOGPROB_SQL + "), "
            "cuts AS (SELECT "
            "quantile_cont(logprob_mean, 1.0/3.0) AS c1, "
            "quantile_cont(logprob_mean, 2.0/3.0) AS c2 FROM base) "
            "SELECT doc_id, logprob_mean, "
            "CASE WHEN logprob_mean IS NULL THEN NULL "
            "WHEN logprob_mean <= c1 THEN 'tail' "
            "WHEN logprob_mean <= c2 THEN 'middle' "
            "ELSE 'head' END AS bucket "
            "FROM base CROSS JOIN cuts ORDER BY doc_id"
        ),
        "perplexity_buckets_by_lang_documents": (
            "WITH base AS (" + _UNIGRAM_LOGPROB_SQL + "), "
            "j AS (SELECT base.doc_id, d.lang, base.logprob_mean "
            "FROM base JOIN documents d USING (doc_id)), "
            "cuts AS (SELECT lang, "
            "quantile_cont(logprob_mean, 1.0/3.0) AS c1, "
            "quantile_cont(logprob_mean, 2.0/3.0) AS c2 "
            "FROM j GROUP BY lang) "
            "SELECT j.doc_id, j.lang, j.logprob_mean, "
            "CASE WHEN j.logprob_mean IS NULL THEN NULL "
            "WHEN j.logprob_mean <= c.c1 THEN 'tail' "
            "WHEN j.logprob_mean <= c.c2 THEN 'middle' "
            "ELSE 'head' END AS bucket "
            "FROM j LEFT JOIN cuts c USING (lang) ORDER BY j.doc_id"
        ),
        "bigram_logprob_documents": _BIGRAM_LOGPROB_SQL,
        # same oracle: the 4096 cap exceeds the corpus's 916 distinct
        # pairs, so the distributed top-V tier must be byte-identical
        "bigram_logprob_capped_documents": _BIGRAM_LOGPROB_SQL,
        "ccnet_pipeline_documents": _CCNET_SQL,
        "fineweb_pipeline_documents": _FINEWEB_SQL,
        "pipeline_spec_fineweb": _FINEWEB_SQL,
        # same oracle: the YAML spec runner composes the identical
        # plan (incl. the save_as self-join), so it must be bit-exact
        "pipeline_spec_ccnet": _CCNET_SQL,
        "dsir_weights_documents": _DSIR_SQL,
        # same oracle: the 4096 cap exceeds the corpus's union vocab,
        # so the distributed two-sided top-V tier must be byte-identical
        "dsir_weights_capped_documents": _DSIR_SQL,
        # same oracle: the fused one-read counts pass must produce the
        # identical two-model table (target = lang='en' subset flag)
        "dsir_weights_fused_documents": _DSIR_SQL,
        "dsir_select_documents": (
            "WITH w AS (" + _DSIR_SQL.replace(" ORDER BY d.doc_id", "") + ") "
            "SELECT doc_id, n_tokens, logratio_sum FROM w "
            "WHERE logratio_sum IS NOT NULL "
            "ORDER BY logratio_sum DESC, doc_id LIMIT 50"
        ),
        "token_entropy_documents": (
            "WITH tok AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS t "
            "FROM documents), "
            "cnt AS (SELECT doc_id, t, COUNT(*)::DOUBLE AS c FROM tok "
            "GROUP BY doc_id, t), "
            "tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*)::BIGINT AS d "
            "FROM cnt GROUP BY doc_id), "
            "ent AS (SELECT cnt.doc_id, "
            "ROUND(-SUM((c / n) * LN(c / n)), 6) AS token_entropy "
            "FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id) "
            "SELECT d.doc_id, COALESCE(tot.n, 0)::BIGINT AS n_tokens, "
            "COALESCE(tot.d, 0)::BIGINT AS distinct_tokens, "
            "ent.token_entropy FROM documents d "
            "LEFT JOIN tot USING (doc_id) "
            "LEFT JOIN ent ON d.doc_id = ent.doc_id ORDER BY d.doc_id"
        ),
        "normalize_text_documents": (
            "SELECT doc_id, trim(regexp_replace("
            "lower(nfc_normalize(coalesce(text, ''))),"
            " '[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')"
            " AS norm_text FROM documents ORDER BY doc_id"
        ),
        "transform_runner_documents": _TRANSFORM_RUNNER_SQL,
        "sessionize_events": _SESSIONIZE_SQL,
        "hopping_window_events": _HOPPING_WINDOW_SQL,
        "hopping_window_user_events": _HOPPING_WINDOW_USER_SQL,
        "hash_join_lineitem_orders": (
            "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,"
            " o.o_custkey, o.o_totalprice"
            " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
            " ORDER BY l.l_orderkey, l.l_linenumber"
        ),
        "hash_join_salted_events": (
            "SELECT e.user_id, e.event_id, c.c_acctbal"
            " FROM events e JOIN customer c ON e.user_id = c.c_custkey"
            " ORDER BY e.event_id"
        ),
        "hash_join_left_customer_events": (
            "SELECT c.c_custkey, c.c_name, e.event_id"
            " FROM customer c LEFT JOIN events e ON c.c_custkey = e.user_id"
            " ORDER BY c.c_custkey, e.event_id"
        ),
        "hash_join_full_customer_events": (
            "SELECT COALESCE(c.c_custkey, e.user_id) AS c_custkey,"
            " c.c_acctbal, e.event_id, e.value"
            " FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c"
            " FULL JOIN (SELECT * FROM events WHERE event_id % 5 = 0) e"
            "   ON c.c_custkey = e.user_id"
            " ORDER BY 1, 3"
        ),
        "anti_join_events_customer": (
            "SELECT event_id, user_id FROM events e"
            " WHERE NOT EXISTS (SELECT 1 FROM customer c"
            "   WHERE c.c_custkey = e.user_id AND c.c_custkey % 3 = 0)"
            " ORDER BY event_id"
        ),
        "count_distinct_events_by_type": (
            "SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_users"
            " FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "spine_fill_events": (
            "WITH agg AS (SELECT date_trunc('day', ts) AS period, "
            "event_type, COUNT(*)::BIGINT AS n_events, "
            "CASE WHEN COUNT(value) > 0 THEN ROUND(SUM(value), 6) END "
            "AS value_sum, "
            "CASE WHEN COUNT(value) > 0 THEN "
            "ROUND(SUM(value) / COUNT(value), 6) END AS value_avg "
            "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), "
            "spine AS (SELECT unnest(generate_series("
            "(SELECT MIN(period) FROM agg), (SELECT MAX(period) FROM agg), "
            "INTERVAL 1 DAY)) AS period), "
            "keys AS (SELECT DISTINCT event_type FROM agg) "
            "SELECT s.period, k.event_type, "
            "COALESCE(a.n_events, 0) AS n_events, a.value_sum, a.value_avg "
            "FROM spine s CROSS JOIN keys k "
            "LEFT JOIN agg a ON a.period = s.period "
            "AND a.event_type = k.event_type "
            "ORDER BY s.period, k.event_type"
        ),
        "distinct_rows_events": (
            "SELECT DISTINCT user_id, event_type FROM events"
            " ORDER BY user_id, event_type"
        ),
        "anti_join_orders_lineitem": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o"
            " WHERE NOT EXISTS (SELECT 1 FROM lineitem l"
            "   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)"
            " ORDER BY o_orderkey"
        ),
        "semi_join_events_bigspenders": (
            "SELECT event_id, user_id, value FROM events e"
            " WHERE EXISTS (SELECT 1 FROM customer c"
            "   WHERE c.c_custkey = e.user_id AND c.c_acctbal > 9000)"
            " ORDER BY event_id"
        ),
        "string_agg_events_by_user": (
            "SELECT user_id, string_agg(event_id::VARCHAR, ','"
            " ORDER BY ts, event_id) AS ids"
            " FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "pivot_counts_events": (
            "SELECT user_id,"
            " COUNT(*) FILTER (WHERE event_type = 'click')::BIGINT"
            "   AS n_click,"
            " COUNT(*) FILTER (WHERE event_type = 'error')::BIGINT"
            "   AS n_error,"
            " COUNT(*) FILTER (WHERE event_type = 'purchase')::BIGINT"
            "   AS n_purchase,"
            " COUNT(*) FILTER (WHERE event_type = 'signup')::BIGINT"
            "   AS n_signup,"
            " COUNT(*) FILTER (WHERE event_type = 'view')::BIGINT"
            "   AS n_view"
            " FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "broadcast_join_events": (
            "SELECT e.event_id, e.user_id, c.c_name, c.c_nationkey"
            " FROM events e JOIN customer c ON e.user_id = c.c_custkey"
            " ORDER BY e.event_id"
        ),
        "group_sample_documents": _GROUP_SAMPLE_SQL,
        "exact_quantiles_events": (
            "SELECT event_type,"
            " ROUND(quantile_cont(value, 0.25), 6) AS p25,"
            " ROUND(quantile_cont(value, 0.50), 6) AS p50,"
            " ROUND(quantile_cont(value, 0.75), 6) AS p75,"
            " ROUND(quantile_cont(value, 0.95), 6) AS p95"
            " FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "iqr_outliers_events": (
            "WITH q AS (SELECT event_type,"
            " quantile_cont(value, 0.25) AS q1,"
            " quantile_cont(value, 0.75) AS q3"
            " FROM events GROUP BY event_type)"
            " SELECT e.event_id, e.event_type, ROUND(e.value, 6) AS value"
            " FROM events e JOIN q USING (event_type)"
            " WHERE e.value < q.q1 - 1.5 * (q.q3 - q.q1)"
            "    OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)"
            " ORDER BY e.event_id"
        ),
        "rowcount_events": (
            "WITH n AS (SELECT COUNT(*)::BIGINT AS rc FROM events), "
            "b AS (SELECT COUNT(*)::BIGINT AS bc FROM orders) "
            "SELECT 'volume' AS rule_name, "
            "(n.rc >= 1 AND n.rc BETWEEN b.bc * 0.5 AND b.bc * 1.5) AS passed, "
            "n.rc AS row_count, b.bc AS baseline_count, 1::BIGINT AS total_count, "
            "(CASE WHEN n.rc >= 1 AND n.rc BETWEEN b.bc * 0.5 AND b.bc * 1.5 "
            "THEN 0 ELSE 1 END)::BIGINT AS failed_count "
            "FROM n CROSS JOIN b"
        ),
        "drift_events_value_fixed": (
            # the drift RULE's fixed-edges PSI tier, end to end: base =
            # raw lineitem.l_quantity, current = events.value, interior
            # edges 0..100 step 10 (12 bins, searchsorted-right
            # membership), clip(1e-6) + renormalize, verdict at 0.2
            "WITH edges AS (SELECT [0.0,10.0,20.0,30.0,40.0,50.0,60.0,"
            "70.0,80.0,90.0,100.0] AS e), "
            "b AS (SELECT len(list_filter((SELECT e FROM edges), "
            "x -> l_quantity >= x)) AS bin FROM lineitem "
            "WHERE l_quantity IS NOT NULL), "
            "c AS (SELECT len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events "
            "WHERE value IS NOT NULL), "
            "grid AS (SELECT unnest(generate_series(0, 11)) AS bin), "
            "bn AS (SELECT grid.bin, GREATEST(COALESCE(cnt, 0), 1e-6) AS n "
            "FROM grid LEFT JOIN (SELECT bin, COUNT(*)::DOUBLE AS cnt "
            "FROM b GROUP BY bin) t USING (bin)), "
            "cn AS (SELECT grid.bin, GREATEST(COALESCE(cnt, 0), 1e-6) AS n "
            "FROM grid LEFT JOIN (SELECT bin, COUNT(*)::DOUBLE AS cnt "
            "FROM c GROUP BY bin) t USING (bin)), "
            "bp AS (SELECT bin, n / SUM(n) OVER () AS p FROM bn), "
            "cp AS (SELECT bin, n / SUM(n) OVER () AS p FROM cn), "
            "s AS (SELECT SUM((cp.p - bp.p) * LN(cp.p / bp.p)) AS psi "
            "FROM bp JOIN cp USING (bin)) "
            "SELECT 'value_drift_fixed' AS rule_name, (psi <= 0.2) AS passed, "
            "ROUND(psi, 6) AS stat, 1::BIGINT AS total_count, "
            "(CASE WHEN psi <= 0.2 THEN 0 ELSE 1 END)::BIGINT AS failed_count "
            "FROM s"
        ),
        "psi_events_split": (
            # bin = count of edges <= v (searchsorted right), 12 bins
            # over interior edges 0,10,..,100; comparison-based (no
            # division) so membership is bit-exact vs the engine
            "WITH edges AS (SELECT [0.0,10.0,20.0,30.0,40.0,50.0,60.0,"
            "70.0,80.0,90.0,100.0] AS e), "
            "b AS (SELECT len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events "
            "WHERE event_id % 2 = 0 AND value IS NOT NULL), "
            "c AS (SELECT len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events "
            "WHERE event_id % 2 = 1 AND value IS NOT NULL), "
            "grid AS (SELECT unnest(generate_series(0, 11)) AS bin), "
            "bn AS (SELECT grid.bin, GREATEST(COALESCE(cnt, 0), 1e-6) AS n "
            "FROM grid LEFT JOIN (SELECT bin, COUNT(*)::DOUBLE AS cnt "
            "FROM b GROUP BY bin) t USING (bin)), "
            "cn AS (SELECT grid.bin, GREATEST(COALESCE(cnt, 0), 1e-6) AS n "
            "FROM grid LEFT JOIN (SELECT bin, COUNT(*)::DOUBLE AS cnt "
            "FROM c GROUP BY bin) t USING (bin)), "
            "bp AS (SELECT bin, n / SUM(n) OVER () AS p FROM bn), "
            "cp AS (SELECT bin, n / SUM(n) OVER () AS p FROM cn) "
            "SELECT (SELECT COUNT(*) FROM b)::BIGINT AS n_base, "
            "(SELECT COUNT(*) FROM c)::BIGINT AS n_current, "
            "ROUND(SUM((cp.p - bp.p) * LN(cp.p / bp.p)), 6) AS psi_value "
            "FROM bp JOIN cp USING (bin)"
        ),
        "reconcile_orders_lineitem": (
            # fixed-point integer micro-units: a 6-decimal ROUND of a
            # ~1e5-magnitude double lands 1 ulp apart between engines,
            # so only integers are safe under an exact value-hash
            "WITH f AS (SELECT l_orderkey AS key, "
            "CAST(ROUND(SUM(l_extendedprice * (1 - l_discount) * "
            "(1 + l_tax)) * 1e6) AS BIGINT) AS fact_sum_micros "
            "FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1), "
            "j AS (SELECT COALESCE(f.key, o.o_orderkey) AS key, "
            "f.fact_sum_micros, "
            "CAST(ROUND(o.o_totalprice * 1e6) AS BIGINT) AS "
            "expected_micros "
            "FROM f FULL OUTER JOIN orders o ON f.key = o.o_orderkey) "
            "SELECT key, fact_sum_micros, expected_micros, "
            "ABS(fact_sum_micros - expected_micros) AS diff_micros, "
            "CASE WHEN fact_sum_micros IS NULL THEN 'missing_fact' "
            "WHEN expected_micros IS NULL THEN 'missing_header' "
            "WHEN ABS(fact_sum_micros - expected_micros) <= 10000 "
            "THEN 'matched' ELSE 'mismatched' END AS status "
            "FROM j ORDER BY key"
        ),
        "charset_profile_documents": (
            "SELECT doc_id, "
            "LENGTH(COALESCE(text, '')) AS n_chars, "
            "LEN(regexp_extract_all(COALESCE(text, ''), "
            "'[^\\x00-\\x7F]')) AS n_non_ascii, "
            "LEN(regexp_extract_all(COALESCE(text, ''), "
            "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]')) AS n_control, "
            "LEN(regexp_extract_all(COALESCE(text, ''), '�')) "
            "AS n_replacement, "
            "LEN(regexp_extract_all(COALESCE(text, ''), '[0-9]')) "
            "AS n_digits, "
            "LEN(regexp_extract_all(COALESCE(text, ''), '[A-Z]')) "
            "AS n_upper, "
            "LEN(regexp_extract_all(COALESCE(text, ''), '[ \\t\\n\\r]')) "
            "AS n_whitespace "
            "FROM documents ORDER BY doc_id"
        ),
        "funnel_events": (
            "WITH s1 AS (SELECT user_id, MIN(ts) t1 FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, MIN(e.ts) t2 FROM events e "
            "JOIN s1 USING (user_id) WHERE e.event_type = 'click' "
            "AND e.ts > s1.t1 GROUP BY 1), "
            "s3 AS (SELECT e.user_id, MIN(e.ts) t3 FROM events e "
            "JOIN s2 USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.ts > s2.t2 GROUP BY 1) "
            "SELECT 1::BIGINT AS step_idx, 'view' AS step, "
            "(SELECT COUNT(*) FROM s1)::BIGINT AS n_keys "
            "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2) "
            "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3) "
            "ORDER BY step_idx"
        ),
        "cohort_retention_events": (
            "WITH f AS (SELECT user_id, MIN(date_trunc('week', ts)) cw "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "GROUP BY 1), "
            "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) w "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL) "
            "SELECT cw::DATE AS cohort_week, "
            "CAST(date_diff('day', cw::DATE, w::DATE) / 7 AS BIGINT) "
            "AS week_offset, COUNT(*)::BIGINT AS n_active_keys "
            "FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "event_transitions_events": (
            "WITH s AS (SELECT user_id, event_type e, "
            "LEAD(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) nx FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL) "
            "SELECT e AS from_event, nx AS to_event, "
            "COUNT(*)::BIGINT AS n_transitions "
            "FROM s WHERE nx IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "cdc_apply_customer_events": (
            "WITH ch AS (SELECT user_id k, CASE WHEN "
            "event_type = 'error' THEN 'D' ELSE 'U' END op, value v, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) rn "
            "FROM events WHERE user_id IS NOT NULL), "
            "last AS (SELECT k, op, v FROM ch WHERE rn = 1), "
            "merged AS (SELECT COALESCE(s.c_custkey, l.k) AS user_id, "
            "l.op, CASE WHEN l.op = 'U' THEN l.v ELSE s.c_acctbal END "
            "AS val FROM customer s FULL OUTER JOIN last l "
            "ON s.c_custkey = l.k) "
            "SELECT user_id, ROUND(val, 6) AS val FROM merged "
            "WHERE op IS NULL OR op = 'U' ORDER BY user_id"
        ),
        "grouped_ols_events": (
            "SELECT event_type, "
            "regr_count(value, event_id::DOUBLE)::BIGINT AS regr_n, "
            "ROUND(regr_slope(value, event_id::DOUBLE), 6) AS slope, "
            "ROUND(regr_intercept(value, event_id::DOUBLE), 6) "
            "AS intercept, "
            "ROUND(regr_r2(value, event_id::DOUBLE), 6) AS r2 "
            "FROM events WHERE event_type IS NOT NULL "
            "GROUP BY 1 ORDER BY 1"
        ),
        "key_skew_events": (
            "WITH c AS (SELECT user_id, COUNT(*)::BIGINT n FROM events "
            "WHERE user_id IS NOT NULL GROUP BY 1), "
            "r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) i FROM c), "
            "t AS (SELECT COUNT(*)::BIGINT nk, SUM(n)::BIGINT nr "
            "FROM c), "
            "tk AS (SELECT SUM(n)::BIGINT s10 FROM "
            "(SELECT n FROM c ORDER BY n DESC LIMIT 10)), "
            "g AS (SELECT SUM(i * n)::BIGINT s1 FROM r) "
            "SELECT t.nk AS n_keys, t.nr AS n_rows, "
            "ROUND((SELECT MAX(n) FROM c)::DOUBLE / t.nr, 6) "
            "AS top1_share, "
            "ROUND(tk.s10::DOUBLE / t.nr, 6) AS topk_share, "
            "ROUND((2.0 * g.s1) / (t.nk * t.nr) - (t.nk + 1.0) / t.nk, "
            "6) AS gini FROM t, tk, g"
        ),
        "fuzzy_dup_pairs_documents": (
            "WITH d AS (SELECT doc_id, lang, substr(text, 1, 12) p, "
            "substr(text, 1, 48) c FROM documents "
            "WHERE text IS NOT NULL AND lang IS NOT NULL) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "levenshtein(a.c, b.c)::BIGINT AS dist "
            "FROM d a JOIN d b ON a.lang = b.lang AND a.p = b.p "
            "AND a.doc_id < b.doc_id "
            "WHERE levenshtein(a.c, b.c) <= 8 ORDER BY 1, 2"
        ),
        "boolean_search_documents": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) "
            "t FROM documents WHERE text IS NOT NULL) "
            "SELECT doc_id FROM tok "
            "WHERE t IN ('batch', 'join', 'filter') GROUP BY doc_id "
            "HAVING COUNT(DISTINCT t) = 3 ORDER BY doc_id"
        ),
        "bm25_search_documents": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) "
            "t FROM documents WHERE text IS NOT NULL), "
            "len AS (SELECT doc_id, COUNT(*)::DOUBLE dl FROM tok "
            "GROUP BY 1), "
            "stats AS (SELECT COUNT(*)::DOUBLE n, AVG(dl) avgdl "
            "FROM len), "
            "tf AS (SELECT doc_id, t, COUNT(*)::DOUBLE tf FROM tok "
            "WHERE t IN ('batch', 'join', 'filter') GROUP BY 1, 2), "
            "df AS (SELECT t, COUNT(*)::DOUBLE df FROM tf GROUP BY 1), "
            "sc AS (SELECT tf.doc_id, "
            "SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
            "tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * (1.0 - 0.75 + "
            "0.75 * len.dl / stats.avgdl))) s "
            "FROM tf, stats JOIN df ON tf.t = df.t "
            "JOIN len ON tf.doc_id = len.doc_id GROUP BY 1) "
            "SELECT doc_id, ROUND(s, 6) AS score FROM sc "
            "ORDER BY s DESC, doc_id LIMIT 10"
        ),
        "hybrid_search_documents": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) "
            "t FROM documents WHERE text IS NOT NULL), "
            "len AS (SELECT doc_id, COUNT(*)::DOUBLE dl FROM tok "
            "GROUP BY 1), "
            "stats AS (SELECT COUNT(*)::DOUBLE n, AVG(dl) avgdl "
            "FROM len), "
            "tf AS (SELECT doc_id, t, COUNT(*)::DOUBLE tf FROM tok "
            "WHERE t IN ('batch', 'join', 'filter') GROUP BY 1, 2), "
            "df AS (SELECT t, COUNT(*)::DOUBLE df FROM tf GROUP BY 1), "
            "sc AS (SELECT tf.doc_id, "
            "SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
            "tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * (1.0 - 0.75 + "
            "0.75 * len.dl / stats.avgdl))) s "
            "FROM tf, stats JOIN df ON tf.t = df.t "
            "JOIN len ON tf.doc_id = len.doc_id GROUP BY 1), "
            "cand AS (SELECT doc_id FROM sc "
            "ORDER BY s DESC, doc_id LIMIT 50), "
            "qv AS (SELECT embedding AS qe FROM embeddings "
            "WHERE vec_id = 0), "
            "r AS (SELECT e.vec_id AS doc_id, ROW_NUMBER() OVER ("
            "ORDER BY list_cosine_similarity(qv.qe, e.embedding) DESC, "
            "e.vec_id ASC) AS rank "
            "FROM cand JOIN embeddings e ON e.vec_id = cand.doc_id, qv) "
            "SELECT rank::BIGINT AS rank, doc_id FROM r "
            "WHERE rank <= 10 ORDER BY rank"
        ),
        "stream_validate_events": (
            "WITH hi AS (SELECT MAX(event_id) + 1 AS m FROM events), "
            "b AS (SELECT event_id * 5 // hi.m AS batch_id, value, "
            "user_id FROM events, hi), "
            "agg AS (SELECT batch_id, COUNT(*) AS n_rows, "
            "SUM(CASE WHEN value >= 0 AND value <= 300 "
            "AND user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_clean, "
            "SUM(CASE WHEN value < 0 OR value > 300 "
            "THEN 1 ELSE 0 END) AS range_failed, "
            "SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) "
            "AS comp_failed FROM b GROUP BY 1) "
            "SELECT batch_id, n_rows::BIGINT AS n_rows, "
            "n_clean::BIGINT AS n_clean, "
            "(CASE WHEN (n_rows - range_failed)::DOUBLE / n_rows "
            ">= 0.998 THEN 1 ELSE 0 END + "
            "CASE WHEN comp_failed = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS passed_rules, "
            "(CASE WHEN (n_rows - range_failed)::DOUBLE / n_rows "
            ">= 0.998 THEN 0 ELSE 1 END + "
            "CASE WHEN comp_failed = 0 THEN 0 ELSE 1 END)::BIGINT "
            "AS failed_rules FROM agg ORDER BY batch_id"
        ),
        "grouped_ewma_events": (
            "WITH s AS (SELECT user_id, value, "
            "ROW_NUMBER() OVER w rn, "
            "COUNT(*) OVER (PARTITION BY user_id) cnt "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, COUNT(*)::BIGINT n, "
            "ROUND(SUM(CASE WHEN rn = 1 THEN pow(0.7, cnt - 1) * value "
            "ELSE 0.3 * pow(0.7, cnt - rn) * value END), 6) AS ewma "
            "FROM s GROUP BY 1 ORDER BY 1"
        ),
        "winsorize_events_value": (
            "WITH q AS (SELECT quantile_cont(value, 0.01) lo, "
            "quantile_cont(value, 0.99) hi FROM events) "
            "SELECT event_id, "
            "ROUND(LEAST(GREATEST(value, q.lo), q.hi), 6) "
            "AS value_wins FROM events, q ORDER BY event_id"
        ),
        "interval_coverage_events": (
            "WITH iv AS (SELECT user_id k, ts s, "
            "ts + CAST(FLOOR(value) AS BIGINT) * INTERVAL 1 SECOND e "
            "FROM events WHERE user_id IS NOT NULL "
            "AND ts IS NOT NULL AND value IS NOT NULL), "
            "o AS (SELECT k, s, e, MAX(e) OVER (PARTITION BY k "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) pm FROM iv), "
            "c AS (SELECT k, "
            "CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END isl, "
            "CASE WHEN pm IS NULL THEN date_diff('microsecond', s, e) "
            "ELSE GREATEST(0, date_diff('microsecond', "
            "GREATEST(s, pm), e)) END dur FROM o) "
            "SELECT k AS user_id, SUM(dur)::BIGINT AS covered_us, "
            "SUM(isl)::BIGINT AS n_islands FROM c GROUP BY 1 ORDER BY 1"
        ),
        "warc_source_documents": (
            "SELECT doc_id, COALESCE(text, '') AS text, "
            "doc_id AS warc_epoch_s FROM documents ORDER BY doc_id"
        ),
        "orc_source_events": (
            "SELECT event_type, COUNT(*)::BIGINT AS n, "
            "ROUND(SUM(value), 6) AS sum_value FROM events "
            "WHERE event_type IS NOT NULL GROUP BY 1 ORDER BY 1"
        ),
        "stream_validate_delta_events": (
            "WITH hi AS (SELECT MAX(event_id) + 1 AS m FROM events), "
            "b AS (SELECT event_id * 5 // hi.m AS batch_id, value, "
            "user_id FROM events, hi), "
            "agg AS (SELECT batch_id, COUNT(*) AS n_rows, "
            "SUM(CASE WHEN value >= 0 AND value <= 300 "
            "AND user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_clean, "
            "SUM(CASE WHEN value < 0 OR value > 300 "
            "THEN 1 ELSE 0 END) AS range_failed, "
            "SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) "
            "AS comp_failed FROM b GROUP BY 1) "
            "SELECT batch_id, n_rows::BIGINT AS n_rows, "
            "n_clean::BIGINT AS n_clean, "
            "(CASE WHEN (n_rows - range_failed)::DOUBLE / n_rows "
            ">= 0.998 THEN 1 ELSE 0 END + "
            "CASE WHEN comp_failed = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS passed_rules, "
            "(CASE WHEN (n_rows - range_failed)::DOUBLE / n_rows "
            ">= 0.998 THEN 0 ELSE 1 END + "
            "CASE WHEN comp_failed = 0 THEN 0 ELSE 1 END)::BIGINT "
            "AS failed_rules FROM agg ORDER BY batch_id"
        ),
        "delta_cdc_events": (
            "WITH hi AS (SELECT MAX(event_id) + 1 AS m FROM events), "
            "fin AS (SELECT event_type, "
            "CASE WHEN event_id >= hi.m // 4 THEN value + 1000 "
            "ELSE value END AS v FROM events, hi "
            "WHERE event_id < 3 * hi.m // 4) "
            "SELECT event_type, COUNT(*)::BIGINT AS n, "
            "ROUND(SUM(v), 6) AS sum_value FROM fin "
            "WHERE event_type IS NOT NULL GROUP BY 1 ORDER BY 1"
        ),
        "delta_maintenance_events": (
            "SELECT COUNT(*)::BIGINT AS n_rows, "
            "SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT "
            "AS n_null, ROUND(SUM(value), 6) AS sum_value FROM events "
            "WHERE value IS NULL OR value < 100 OR value > 200"
        ),
        "delta_source_events": (
            "SELECT event_type, COUNT(*)::BIGINT AS n, "
            "ROUND(SUM(value), 6) AS sum_value FROM events "
            "WHERE event_type IS NOT NULL AND value <= 300 "
            "GROUP BY 1 ORDER BY 1"
        ),
        "parse_logs_events": (
            "SELECT event_type AS level, COUNT(*)::BIGINT AS n, "
            "ROUND(SUM(value), 6) AS sum_val, "
            "MIN(epoch_us(ts))::BIGINT AS min_ts_us, "
            "MAX(epoch_us(ts))::BIGINT AS max_ts_us FROM events "
            "WHERE ts IS NOT NULL AND event_type IS NOT NULL "
            "AND user_id IS NOT NULL AND value IS NOT NULL "
            "GROUP BY 1 ORDER BY 1"
        ),
        "table_checksum_events": (
            "WITH s AS (SELECT "
            "COALESCE(CAST(event_id AS VARCHAR), '') || '|' || "
            "COALESCE(CAST(epoch_us(ts) AS VARCHAR), '') || '|' || "
            "COALESCE(event_type, '') || '|' || "
            "COALESCE(CAST(user_id AS VARCHAR), '') AS row_str "
            "FROM events) "
            "SELECT COUNT(*)::BIGINT AS n_rows, "
            "CAST(SUM(md5_number_lower(row_str)::HUGEINT) % "
            "18446744073709551616 AS UBIGINT) AS checksum FROM s"
        ),
        "top_users_plus_other_events": (
            "WITH s AS (SELECT event_type, user_id, SUM(value) v "
            "FROM events WHERE event_type IS NOT NULL AND user_id IS "
            "NOT NULL GROUP BY 1, 2), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY v DESC, user_id) rn FROM s) "
            "SELECT event_type, CAST(user_id AS VARCHAR) AS key_out, "
            "ROUND(v, 6) AS value_sum, 1::BIGINT AS n_keys "
            "FROM r WHERE rn <= 3 "
            "UNION ALL SELECT event_type, '<other>', ROUND(SUM(v), 6), "
            "COUNT(*)::BIGINT FROM r WHERE rn > 3 GROUP BY event_type "
            "ORDER BY event_type, key_out"
        ),
        "group_split_events": (
            # split = per-mille band of (user_id*KNUTH)%1000:
            # [0,800) train, [800,900) val, [900,1000) test
            "WITH lab AS (SELECT event_id, user_id, "
            "CASE WHEN (user_id * 2654435761) % 1000 < 800 THEN 'train' "
            "WHEN (user_id * 2654435761) % 1000 < 900 THEN 'val' "
            "ELSE 'test' END AS split FROM events) "
            "SELECT split, COUNT(*)::BIGINT AS n_rows, "
            "COUNT(DISTINCT user_id)::BIGINT AS n_users "
            "FROM lab GROUP BY split ORDER BY split"
        ),
        "histogram2d_lineitem": (
            # widths written as the SAME division the engine computes
            # ((hi-lo)/bins) — a 0.02 literal can differ by 1 ulp from
            # 0.1/5 and flip boundary bins
            "SELECT CAST(FLOOR((l_quantity - 0.0) / ((50.0 - 0.0) / 10)) "
            "AS BIGINT) AS bin_x, "
            "CAST(FLOOR((l_discount - 0.0) / ((0.1 - 0.0) / 5)) "
            "AS BIGINT) AS bin_y, "
            "COUNT(*)::BIGINT AS n FROM lineitem "
            "WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL "
            "AND l_quantity >= 0 AND l_quantity < 50 "
            "AND l_discount >= 0 AND l_discount < 0.1 "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "extract_all_numbers_events": (
            "SELECT event_id, "
            "generate_subscripts(l, 1)::BIGINT AS match_idx, "
            "unnest(l) AS match FROM "
            "(SELECT event_id, regexp_extract_all(coalesce(props, ''), "
            "'[0-9]+') AS l FROM events) WHERE len(l) > 0 "
            "ORDER BY event_id, match_idx"
        ),
        "negative_samples_documents": (
            "WITH n AS (SELECT COUNT(*) c FROM documents), "
            "r AS (SELECT unnest([1, 2, 3]) AS neg_rank) "
            "SELECT d.doc_id, r.neg_rank, "
            "CASE WHEN (d.doc_id * 2654435761 + r.neg_rank * 2654435769) "
            "% n.c = d.doc_id "
            "THEN ((d.doc_id * 2654435761 + r.neg_rank * 2654435769) "
            "% n.c + 1) % n.c "
            "ELSE (d.doc_id * 2654435761 + r.neg_rank * 2654435769) % n.c "
            "END AS neg_id "
            "FROM documents d CROSS JOIN r CROSS JOIN n "
            "ORDER BY d.doc_id, r.neg_rank"
        ),
        "metric_anomaly_events": (
            # per-slice success rate = (total - failed)/total of the
            # range rule; z of slice 3 vs mean/std of slices 0-2
            "WITH r AS (SELECT event_id % 4 AS m, "
            "COUNT(*)::DOUBLE AS t, "
            "(COUNT(*) FILTER (WHERE value < 0 OR value > 100))::DOUBLE f "
            "FROM events GROUP BY 1), "
            "rates AS (SELECT m, (t - f) / t AS rate FROM r), "
            "h AS (SELECT AVG(rate) mu, STDDEV_SAMP(rate) sd, "
            "COUNT(*)::BIGINT n FROM rates WHERE m < 3), "
            "c AS (SELECT rate FROM rates WHERE m = 3) "
            "SELECT h.n AS n_runs, ROUND(h.mu, 6) AS mean_rate, "
            "ROUND(h.sd, 6) AS std_rate, ROUND(c.rate, 6) AS "
            "current_rate, ROUND((c.rate - h.mu) / h.sd, 6) AS z, "
            "abs((c.rate - h.mu) / h.sd) <= 3.0 AS passed "
            "FROM h, c"
        ),
        "multi_table_summary": (
            "SELECT 'customer' AS table_name, 'cust_key_unique' AS "
            "rule_name, (SELECT COUNT(*) FROM customer)::BIGINT AS "
            "total_count, (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) "
            "FROM customer)::BIGINT AS failed_count "
            "UNION ALL SELECT 'events', 'ev_type_complete', "
            "(SELECT COUNT(*) FROM events), "
            "(SELECT COUNT(*) - COUNT(event_type) FROM events) "
            "UNION ALL SELECT 'events', 'ev_value_range', "
            "(SELECT COUNT(*) FROM events), "
            "(SELECT COUNT(*) FILTER (WHERE value < 0 OR value > 150) "
            "FROM events) "
            "UNION ALL SELECT 'orders', 'ord_status_member', "
            "(SELECT COUNT(*) FROM orders), "
            "(SELECT COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL "
            "AND o_orderstatus NOT IN ('O', 'F')) FROM orders) "
            "ORDER BY table_name, rule_name"
        ),
        "incremental_dedup_orders": _INCREMENTAL_DEDUP_SQL,
        # same lifecycle, same exact counts — the sharded tier must be
        # value-identical to the broadcast tier
        "incremental_dedup_sharded_orders": _INCREMENTAL_DEDUP_SQL,
        "mix_to_budget_documents": (
            "WITH t AS (SELECT source, SUM(n_chars)::BIGINT AS tt "
            "FROM documents GROUP BY source), "
            "wt AS (SELECT SUM(CASE source WHEN 'src0' THEN 3 "
            "WHEN 'src1' THEN 2 ELSE 1 END)::BIGINT AS w FROM t), "
            "r AS (SELECT source, LEAST(1000, "
            "(1000 * 60000 * CASE source WHEN 'src0' THEN 3 "
            "WHEN 'src1' THEN 2 ELSE 1 END) // (wt.w * t.tt)) AS pm "
            "FROM t, wt) "
            "SELECT d.doc_id, d.source, d.n_chars "
            "FROM documents d JOIN r USING (source) "
            "WHERE (d.doc_id * 2654435761) % 1000 < r.pm "
            "ORDER BY d.doc_id"
        ),
        "temperature_mix_lang_documents": (
            "WITH c AS (SELECT lang, COUNT(*)::BIGINT AS n "
            "FROM documents GROUP BY lang), "
            "t AS (SELECT SUM(n)::DOUBLE AS tot FROM c), "
            "w AS (SELECT lang, n, n / t.tot AS p, "
            "POW(n / t.tot, 0.3) AS wr FROM c, t), "
            "s AS (SELECT SUM(wr) AS ws FROM w) "
            "SELECT lang, n, ROUND(p, 6) AS share, "
            "ROUND(wr / s.ws, 6) AS weight "
            "FROM w, s ORDER BY lang"
        ),
        "temperature_mix_chars_documents": (
            "WITH c AS (SELECT source, SUM(n_chars)::BIGINT AS n "
            "FROM documents GROUP BY source), "
            "t AS (SELECT SUM(n)::DOUBLE AS tot FROM c), "
            "w AS (SELECT source, n, n / t.tot AS p, "
            "POW(n / t.tot, 0.5) AS wr FROM c, t), "
            "s AS (SELECT SUM(wr) AS ws FROM w) "
            "SELECT source, n, ROUND(p, 6) AS share, "
            "ROUND(wr / s.ws, 6) AS weight "
            "FROM w, s ORDER BY source"
        ),
        "pipeline_spec_multi_family": (
            "WITH f AS (SELECT * FROM events WHERE value > 10), "
            "j AS (SELECT e.user_id, e.event_id, e.ts, e.value, "
            "c.c_mktsegment FROM f e "
            "JOIN customer c ON e.user_id = c.c_custkey), "
            "d AS (SELECT user_id, event_id, ts, value, c_mktsegment "
            "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY event_id) AS rn FROM j) WHERE rn = 1) "
            "SELECT time_bucket(INTERVAL 86400 SECONDS, ts) "
            "AS window_start, c_mktsegment, "
            "COUNT(*)::BIGINT AS n_events, "
            "ROUND(SUM(value), 6) AS value_sum, MIN(value) AS value_min, "
            "MAX(value) AS value_max, ROUND(AVG(value), 6) AS value_avg "
            "FROM d WHERE ts IS NOT NULL "
            "GROUP BY window_start, c_mktsegment "
            "ORDER BY window_start, c_mktsegment"
        ),
        "pipeline_spec_documents": (
            "SELECT doc_id, source, "
            "CASE WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'train' "
            "ELSE 'val' END AS split "
            "FROM documents WHERE n_chars >= 100 "
            "AND (doc_id * 2654435761) % 1000 < "
            "CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 1000 "
            "ELSE 250 END "
            "ORDER BY doc_id"
        ),
        "canary_check_documents": (
            "SELECT CAST(doc_id AS VARCHAR) AS canary_id, "
            "COUNT(*)::BIGINT AS n_copies, "
            "(CASE doc_id WHEN 30 THEN FALSE "
            "ELSE md5(MIN(coalesce(text, ''))) = "
            "md5(MIN(coalesce(text, ''))) END) AS md5_matches "
            "FROM documents WHERE doc_id IN (10, 20, 30) "
            "GROUP BY doc_id ORDER BY canary_id"
        ),
        "float_anomaly_events": (
            "WITH src AS (SELECT value, CASE event_id % 8 "
            "WHEN 0 THEN 'Infinity'::DOUBLE "
            "WHEN 1 THEN '-Infinity'::DOUBLE "
            "WHEN 2 THEN 'NaN'::DOUBLE "
            "WHEN 3 THEN 0.0 WHEN 4 THEN -1.5 "
            "WHEN 5 THEN NULL ELSE value::DOUBLE END AS dirty_float "
            "FROM events), "
            "u AS (SELECT 'value' AS col, value::DOUBLE v FROM src "
            "UNION ALL SELECT 'dirty_float', dirty_float FROM src) "
            "SELECT col AS \"column\", COUNT(*)::BIGINT AS n, "
            "(COUNT(*) - COUNT(v))::BIGINT AS n_null, "
            "(COUNT(*) FILTER (WHERE isnan(v)))::BIGINT AS n_nan, "
            "(COUNT(*) FILTER (WHERE v = 'Infinity'::DOUBLE))::BIGINT "
            "AS n_posinf, "
            "(COUNT(*) FILTER (WHERE v = '-Infinity'::DOUBLE))::BIGINT "
            "AS n_neginf, "
            "(COUNT(*) FILTER (WHERE v = 0))::BIGINT AS n_zero, "
            "(COUNT(*) FILTER (WHERE v < 0 AND v > '-Infinity'::DOUBLE"
            "))::BIGINT AS n_negative "
            "FROM u GROUP BY col ORDER BY col"
        ),
        "compact_files_events": (
            # the SQL checksum of the INPUT — equal iff compaction
            # preserved every row byte-identically
            "WITH s AS (SELECT "
            "COALESCE(CAST(event_id AS VARCHAR), '') || '|' || "
            "COALESCE(CAST(epoch_us(ts) AS VARCHAR), '') || '|' || "
            "COALESCE(event_type, '') || '|' || "
            "COALESCE(CAST(user_id AS VARCHAR), '') AS row_str "
            "FROM events) "
            "SELECT COUNT(*)::BIGINT AS n_rows, "
            "CAST(SUM(md5_number_lower(row_str)::HUGEINT) % "
            "18446744073709551616 AS UBIGINT) AS checksum FROM s"
        ),
        "schema_diff_events": (
            "WITH a AS (SELECT column_name, column_type FROM "
            "(DESCRIBE SELECT * FROM events)), "
            "b AS (SELECT column_name, column_type FROM "
            "(DESCRIBE SELECT event_id, ts, user_id, event_type, "
            "CAST(value AS VARCHAR) AS value, 1::BIGINT AS extra_col "
            "FROM events)) "
            "SELECT COALESCE(a.column_name, b.column_name) "
            "AS column_name, a.column_type AS type_a, "
            "b.column_type AS type_b, "
            "CASE WHEN a.column_name IS NULL THEN 'added' "
            "WHEN b.column_name IS NULL THEN 'removed' "
            "WHEN a.column_type = b.column_type THEN 'same' "
            "ELSE 'changed' END AS status "
            "FROM a FULL OUTER JOIN b USING (column_name) ORDER BY 1"
        ),
        "time_weighted_avg_events": (
            "WITH s AS (SELECT user_id, ts, value, "
            "LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, value) "
            "nts FROM events WHERE user_id IS NOT NULL "
            "AND ts IS NOT NULL AND value IS NOT NULL), "
            "a AS (SELECT user_id, COUNT(*)::BIGINT n_points, "
            "SUM(CASE WHEN nts IS NULL THEN 0 ELSE value * "
            "date_diff('microsecond', ts, nts) END) w, "
            "date_diff('microsecond', MIN(ts), MAX(ts)) span "
            "FROM s GROUP BY 1) "
            "SELECT user_id, n_points, "
            "CASE WHEN span > 0 THEN ROUND(w / span, 6) END AS twavg "
            "FROM a ORDER BY 1"
        ),
        "benford_events_value": (
            "WITH x AS (SELECT ABS(value) v FROM events "
            "WHERE value IS NOT NULL AND value <> 0), "
            "e0 AS (SELECT v, FLOOR(LOG10(v)) e FROM x), "
            "m0 AS (SELECT CASE WHEN e >= 0 THEN v / POW(10, e) "
            "ELSE v * POW(10, -e) END m FROM e0), "
            "m1 AS (SELECT CASE WHEN m >= 10 THEN m / 10 ELSE m END m "
            "FROM m0), "
            "m2 AS (SELECT CASE WHEN m < 1 THEN m * 10 ELSE m END m "
            "FROM m1), "
            "c AS (SELECT CAST(FLOOR(m) AS BIGINT) AS digit, "
            "COUNT(*)::BIGINT observed FROM m2 GROUP BY 1), "
            "t AS (SELECT SUM(observed)::DOUBLE n FROM c) "
            "SELECT digit, observed, "
            "ROUND(t.n * LOG10(1.0 + 1.0 / digit), 6) AS expected, "
            "ROUND(POW(observed - t.n * LOG10(1.0 + 1.0 / digit), 2) "
            "/ (t.n * LOG10(1.0 + 1.0 / digit)), 6) AS chi2_term "
            "FROM c, t ORDER BY 1"
        ),
        "null_rate_by_day_events": (
            "SELECT CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS "
            "n_rows, "
            "SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT "
            "AS value_nulls, "
            "ROUND(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 "
            "END)::DOUBLE / COUNT(*), 6) AS value_null_rate, "
            "SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT "
            "AS user_id_nulls, "
            "ROUND(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 "
            "END)::DOUBLE / COUNT(*), 6) AS user_id_null_rate "
            "FROM events WHERE ts IS NOT NULL GROUP BY 1 ORDER BY 1"
        ),
        "association_rules_events": (
            "WITH b AS (SELECT DISTINCT user_id k, event_type i "
            "FROM events WHERE user_id IS NOT NULL "
            "AND event_type IS NOT NULL), "
            "n AS (SELECT COUNT(DISTINCT k)::BIGINT nk FROM b), "
            "ic AS (SELECT i, COUNT(*)::BIGINT c FROM b GROUP BY 1), "
            "p AS (SELECT a.i ia, c.i ib, COUNT(*)::BIGINT nab "
            "FROM b a JOIN b c ON a.k = c.k AND a.i < c.i "
            "GROUP BY 1, 2) "
            "SELECT ia AS item_a, ib AS item_b, nab AS n_ab, "
            "x.c AS n_a, y.c AS n_b, "
            "ROUND(nab::DOUBLE / n.nk, 6) AS support, "
            "ROUND(nab::DOUBLE / x.c, 6) AS conf_a_b, "
            "ROUND(nab::DOUBLE / y.c, 6) AS conf_b_a, "
            "ROUND(nab::DOUBLE * n.nk / (x.c * y.c), 6) AS lift "
            "FROM p JOIN ic x ON p.ia = x.i JOIN ic y ON p.ib = y.i, "
            "n ORDER BY 1, 2"
        ),
        "throttle_dedup_events": (
            "WITH s AS (SELECT event_id, ts, LAG(ts) OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id) "
            "pts FROM events WHERE user_id IS NOT NULL "
            "AND event_type IS NOT NULL AND ts IS NOT NULL) "
            "SELECT event_id FROM s WHERE pts IS NULL OR "
            "date_diff('microsecond', pts, ts) > 3600000000 "
            "ORDER BY event_id"
        ),
        "grouped_cusum_events": (
            "WITH s0 AS (SELECT user_id, value, SUM(value) OVER w cs, "
            "ROW_NUMBER() OVER w rn, "
            "COUNT(*) OVER (PARTITION BY user_id) n FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)), "
            "s AS (SELECT *, LAST_VALUE(cs) OVER (PARTITION BY user_id "
            "ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "UNBOUNDED FOLLOWING) total FROM s0), "
            "d AS (SELECT user_id, n, n * cs - rn * total AS dev "
            "FROM s) "
            "SELECT user_id, COUNT(*)::BIGINT n, "
            "ROUND(MAX(dev) / ANY_VALUE(d.n), 6) cusum_max, "
            "ROUND(MIN(dev) / ANY_VALUE(d.n), 6) cusum_min, "
            "ROUND(MAX(dev) / ANY_VALUE(d.n) - "
            "MIN(dev) / ANY_VALUE(d.n), 6) cusum_range "
            "FROM d GROUP BY 1 ORDER BY 1"
        ),
        "keyset_overlap_events_customer": (
            "WITH a AS (SELECT DISTINCT user_id k FROM events "
            "WHERE user_id IS NOT NULL), "
            "b AS (SELECT DISTINCT c_custkey k FROM customer "
            "WHERE c_custkey IS NOT NULL), "
            "i AS (SELECT COUNT(*)::BIGINT c FROM a JOIN b USING (k)), "
            "u AS (SELECT COUNT(*)::BIGINT c FROM "
            "(SELECT k FROM a UNION SELECT k FROM b)), "
            "na AS (SELECT COUNT(*)::BIGINT c FROM a), "
            "nb AS (SELECT COUNT(*)::BIGINT c FROM b) "
            "SELECT na.c AS n_a, nb.c AS n_b, i.c AS n_intersect, "
            "u.c AS n_union, ROUND(i.c::DOUBLE / u.c, 6) AS jaccard, "
            "ROUND(i.c::DOUBLE / na.c, 6) AS containment_a_in_b, "
            "ROUND(i.c::DOUBLE / nb.c, 6) AS containment_b_in_a "
            "FROM na, nb, i, u"
        ),
        "kmv_overlap_events_customer": (
            # unsaturated KMV is exact — the oracle is the true overlap
            "WITH a AS (SELECT DISTINCT user_id k FROM events "
            "WHERE user_id IS NOT NULL), "
            "b AS (SELECT DISTINCT c_custkey k FROM customer "
            "WHERE c_custkey IS NOT NULL), "
            "i AS (SELECT COUNT(*)::BIGINT c FROM a JOIN b USING (k)), "
            "u AS (SELECT COUNT(*)::BIGINT c FROM "
            "(SELECT k FROM a UNION SELECT k FROM b)), "
            "na AS (SELECT COUNT(*)::BIGINT c FROM a), "
            "nb AS (SELECT COUNT(*)::BIGINT c FROM b) "
            "SELECT 4096::BIGINT AS k, na.c::DOUBLE AS est_n_a, "
            "nb.c::DOUBLE AS est_n_b, u.c::DOUBLE AS est_union, "
            "i.c::DOUBLE AS est_intersect, "
            "i.c::DOUBLE / u.c AS est_jaccard "
            "FROM na, nb, i, u"
        ),
        "pmi_collocations_documents": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) "
            "t FROM documents WHERE text IS NOT NULL), "
            "seq AS (SELECT doc_id, t, LEAD(t) OVER "
            "(PARTITION BY doc_id ORDER BY rowid) nt FROM "
            "(SELECT row_number() OVER () rowid, doc_id, t FROM tok)), "
            "big AS (SELECT t a, nt b, COUNT(*)::BIGINT c FROM seq "
            "WHERE nt IS NOT NULL GROUP BY 1, 2), "
            "uni AS (SELECT t, COUNT(*)::BIGINT c FROM tok GROUP BY 1), "
            "n1 AS (SELECT SUM(c)::DOUBLE v FROM uni), "
            "n2 AS (SELECT SUM(c)::DOUBLE v FROM big) "
            "SELECT a || ' ' || b AS bigram, big.c AS n_ab, "
            "x.c AS n_a, y.c AS n_b, "
            "ROUND(LN(big.c / n2.v) - LN(x.c / n1.v) - "
            "LN(y.c / n1.v), 6) AS pmi "
            "FROM big JOIN uni x ON big.a = x.t "
            "JOIN uni y ON big.b = y.t, n1, n2 "
            "WHERE big.c >= 5 ORDER BY pmi DESC, bigram LIMIT 20"
        ),
        "top_users_by_type_events": (
            "WITH a AS (SELECT event_type, user_id, "
            "ROUND(SUM(value), 6) AS total_value FROM events "
            "WHERE event_type IS NOT NULL AND user_id IS NOT NULL "
            "GROUP BY 1, 2), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY "
            "event_type ORDER BY total_value DESC, user_id) rn "
            "FROM a) "
            "SELECT event_type, user_id, total_value FROM r "
            "WHERE rn <= 3 ORDER BY event_type, total_value DESC, "
            "user_id"
        ),
        "quantize_embeddings": (
            "WITH b AS (SELECT vec_id, embedding e, "
            "list_aggregate(embedding, 'min')::DOUBLE mn, "
            "list_aggregate(embedding, 'max')::DOUBLE mx "
            "FROM embeddings WHERE embedding IS NOT NULL), "
            "s AS (SELECT vec_id, e, mn, mx, (mx - mn) / 255.0 sc "
            "FROM b), "
            "m AS (SELECT vec_id, mn, mx, sc, "
            "CASE WHEN sc = 0 THEN 0.0 ELSE "
            "list_sum(list_transform(e, x -> POW(x::DOUBLE - "
            "(mn + FLOOR((x::DOUBLE - mn) / sc + 0.5) * sc), 2))) "
            "/ len(e) END mse FROM s) "
            "SELECT vec_id, ROUND(mn, 6) vmin, ROUND(mx, 6) vmax, "
            "ROUND(sc, 6) scale, ROUND(mse, 12) mse "
            "FROM m ORDER BY vec_id"
        ),
        "containment_pairs_documents": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') "
            "AS t FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(generate_series(1, len(t) - 2), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle "
            "FROM toks), "
            "sizes AS (SELECT doc_id, count(*) AS sz FROM sh "
            "GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) i "
            "FROM sh a JOIN sh b ON a.shingle = b.shingle "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id_a, id_b, i::BIGINT intersection, "
            "sa.sz::BIGINT size_a, sb.sz::BIGINT size_b, "
            "ROUND(i * 1.0 / LEAST(sa.sz, sb.sz), 6) AS containment "
            "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
            "JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE i * 1.0 / LEAST(sa.sz, sb.sz) >= 0.6 "
            "ORDER BY id_a, id_b"
        ),
        "chi2_lang_split_documents": (
            "WITH a AS (SELECT lang AS cat, COUNT(*)::DOUBLE AS ca "
            "FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL "
            "GROUP BY lang), "
            "b AS (SELECT lang AS cat, COUNT(*)::DOUBLE AS cb "
            "FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL "
            "GROUP BY lang), "
            "u AS (SELECT COALESCE(a.cat, b.cat) AS cat, "
            "COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb "
            "FROM a FULL OUTER JOIN b ON a.cat = b.cat), "
            "t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM u) "
            "SELECT na::BIGINT AS n_base, nb::BIGINT AS n_current, "
            "COUNT(*)::BIGINT AS n_categories, "
            "(COUNT(*) - 1)::BIGINT AS dof, "
            "ROUND(SUM(POWER(ca - na * (ca + cb) / (na + nb), 2) "
            "/ (na * (ca + cb) / (na + nb)) "
            "+ POWER(cb - nb * (ca + cb) / (na + nb), 2) "
            "/ (nb * (ca + cb) / (na + nb))), 6) AS chi2_value "
            "FROM u CROSS JOIN t GROUP BY na, nb"
        ),
        "partition_anomaly_events": (
            "WITH p AS (SELECT user_id % 16 AS partition, "
            "COUNT(*)::BIGINT AS n, "
            "ROUND((COUNT(*) - COUNT(value)) / CAST(COUNT(*) AS DOUBLE), 6)"
            " AS null_rate, ROUND(AVG(value), 6) AS mean_value "
            "FROM events WHERE user_id IS NOT NULL GROUP BY 1), "
            "m AS (SELECT MEDIAN(mean_value) AS med_m, "
            "MEDIAN(null_rate) AS med_n FROM p), "
            "d AS (SELECT p.*, ROUND(ABS(mean_value - med_m), 6) AS "
            "dev_mean, ROUND(ABS(null_rate - med_n), 6) AS dev_null_rate "
            "FROM p CROSS JOIN m), "
            "t AS (SELECT ROUND(3.0 * MEDIAN(dev_mean), 6) AS thr_m, "
            "ROUND(3.0 * MEDIAN(dev_null_rate), 6) AS thr_n FROM d) "
            "SELECT partition, n, null_rate, mean_value, dev_mean, "
            "dev_null_rate, (dev_mean > thr_m OR dev_null_rate > thr_n) "
            "AS is_anomaly FROM d CROSS JOIN t ORDER BY partition"
        ),
        "psi_by_group_events": (
            # per-event_type PSI between halves: same bin/clip math as
            # psi_events_split, grids and renormalization per group
            "WITH edges AS (SELECT [0.0,10.0,20.0,30.0,40.0,50.0,60.0,"
            "70.0,80.0,90.0,100.0] AS e), "
            "b AS (SELECT event_type, len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events WHERE event_id % 2 = 0 "
            "AND value IS NOT NULL AND event_type IS NOT NULL), "
            "c AS (SELECT event_type, len(list_filter((SELECT e FROM edges), "
            "x -> value >= x)) AS bin FROM events WHERE event_id % 2 = 1 "
            "AND value IS NOT NULL AND event_type IS NOT NULL), "
            "grps AS (SELECT DISTINCT event_type FROM ("
            "SELECT event_type FROM b UNION ALL SELECT event_type FROM c)), "
            "grid AS (SELECT g.event_type, t.bin FROM grps g CROSS JOIN "
            "(SELECT unnest(generate_series(0, 11)) AS bin) t), "
            "bn AS (SELECT grid.event_type, grid.bin, "
            "GREATEST(COALESCE(cnt, 0), 1e-6) AS n FROM grid "
            "LEFT JOIN (SELECT event_type, bin, COUNT(*)::DOUBLE AS cnt "
            "FROM b GROUP BY event_type, bin) t USING (event_type, bin)), "
            "cn AS (SELECT grid.event_type, grid.bin, "
            "GREATEST(COALESCE(cnt, 0), 1e-6) AS n FROM grid "
            "LEFT JOIN (SELECT event_type, bin, COUNT(*)::DOUBLE AS cnt "
            "FROM c GROUP BY event_type, bin) t USING (event_type, bin)), "
            "bp AS (SELECT event_type, bin, n / SUM(n) OVER "
            "(PARTITION BY event_type) AS p FROM bn), "
            "cp AS (SELECT event_type, bin, n / SUM(n) OVER "
            "(PARTITION BY event_type) AS p FROM cn), "
            "nb AS (SELECT event_type, COUNT(*)::BIGINT AS n_base FROM b "
            "GROUP BY event_type), "
            "nc AS (SELECT event_type, COUNT(*)::BIGINT AS n_current FROM c "
            "GROUP BY event_type) "
            "SELECT g.event_type, COALESCE(nb.n_base, 0) AS n_base, "
            "COALESCE(nc.n_current, 0) AS n_current, "
            "ROUND(s.psi, 6) AS psi_value FROM grps g "
            "LEFT JOIN nb USING (event_type) LEFT JOIN nc USING (event_type) "
            "JOIN (SELECT bp.event_type, SUM((cp.p - bp.p) * LN(cp.p / bp.p)) "
            "AS psi FROM bp JOIN cp USING (event_type, bin) "
            "GROUP BY bp.event_type) s USING (event_type) "
            "ORDER BY g.event_type"
        ),
        "ks_by_group_events": (
            "WITH a AS (SELECT event_type, value AS v FROM events "
            "WHERE event_id % 2 = 0 AND value IS NOT NULL "
            "AND event_type IS NOT NULL), "
            "b AS (SELECT event_type, value AS v FROM events "
            "WHERE event_id % 2 = 1 AND value IS NOT NULL "
            "AND event_type IS NOT NULL), "
            "u AS (SELECT event_type, v, "
            "COUNT(*) FILTER (WHERE side = 0) AS ca, "
            "COUNT(*) FILTER (WHERE side = 1) AS cb "
            "FROM (SELECT event_type, v, 0 AS side FROM a "
            "UNION ALL SELECT event_type, v, 1 AS side FROM b) "
            "GROUP BY event_type, v), "
            "n AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb "
            "FROM u GROUP BY event_type), "
            "c AS (SELECT u.event_type, "
            "SUM(ca) OVER (PARTITION BY u.event_type ORDER BY v) AS cca, "
            "SUM(cb) OVER (PARTITION BY u.event_type ORDER BY v) AS ccb "
            "FROM u) "
            "SELECT n.event_type, n.na::BIGINT AS n_base, "
            "n.nb::BIGINT AS n_current, ROUND(m.ks, 6) AS ks_value "
            "FROM n JOIN (SELECT event_type, MAX(ABS(cca / "
            "(SELECT na FROM n n2 WHERE n2.event_type = c.event_type) "
            "- ccb / (SELECT nb FROM n n2 WHERE n2.event_type = "
            "c.event_type))) AS ks FROM c GROUP BY event_type) m "
            "USING (event_type) ORDER BY n.event_type"
        ),
        "ks_events_split": _KS_EVENTS_SPLIT_SQL,
        # auto-quantize resolves to the bit-exact path on this column
        "ks_auto_events_split": _KS_EVENTS_SPLIT_SQL,
        "wasserstein_events_split": (
            # exact 1-D W1 = sum over sorted distinct values of
            # |ECDF_a - ECDF_b| * gap-to-next-value; per-term float
            # math identical to the engine (int/int -> DOUBLE divisions)
            "WITH a AS (SELECT value AS v FROM events "
            "WHERE event_id % 2 = 0 AND value IS NOT NULL), "
            "b AS (SELECT value AS v FROM events "
            "WHERE event_id % 2 = 1 AND value IS NOT NULL), "
            "u AS (SELECT v, "
            "COUNT(*) FILTER (WHERE side = 0) AS ca, "
            "COUNT(*) FILTER (WHERE side = 1) AS cb "
            "FROM (SELECT v, 0 AS side FROM a "
            "UNION ALL SELECT v, 1 AS side FROM b) GROUP BY v), "
            "c AS (SELECT v, LEAD(v) OVER (ORDER BY v) AS nxt, "
            "SUM(ca) OVER (ORDER BY v) AS cca, "
            "SUM(cb) OVER (ORDER BY v) AS ccb FROM u) "
            "SELECT (SELECT COUNT(*) FROM a)::BIGINT AS n_base, "
            "(SELECT COUNT(*) FROM b)::BIGINT AS n_current, "
            "ROUND(SUM(ABS(cca::DOUBLE / (SELECT COUNT(*) FROM a) "
            "- ccb::DOUBLE / (SELECT COUNT(*) FROM b)) "
            "* (nxt - v)), 6) AS emd_value "
            "FROM c WHERE nxt IS NOT NULL"
        ),
        "cat_association_documents": (
            # contingency cells + marginals; e = ra*cb/n as double
            # multiply-then-divide, MI term (o/n)*ln((o*n)/(ra*cb)) —
            # term-identical to the engine. Zero-observed cells enter
            # chi2 with their full expected count via the CROSS JOIN.
            "WITH d AS (SELECT lang AS a, source AS b FROM documents "
            "WHERE lang IS NOT NULL AND source IS NOT NULL), "
            "o AS (SELECT a, b, COUNT(*)::DOUBLE AS o FROM d GROUP BY a, b), "
            "ra AS (SELECT a, COUNT(*)::DOUBLE AS ra FROM d GROUP BY a), "
            "cb AS (SELECT b, COUNT(*)::DOUBLE AS cb FROM d GROUP BY b), "
            "n AS (SELECT COUNT(*)::DOUBLE AS n FROM d), "
            "grid AS (SELECT ra.a, cb.b, ra.ra, cb.cb, "
            "COALESCE(o.o, 0) AS o, (ra.ra * cb.cb) / n.n AS e "
            "FROM ra CROSS JOIN cb CROSS JOIN n "
            "LEFT JOIN o ON o.a = ra.a AND o.b = cb.b), "
            "s AS (SELECT SUM((o - e) * (o - e) / e) AS chi2, "
            "SUM(CASE WHEN o > 0 THEN (o / (SELECT n FROM n)) "
            "* LN((o * (SELECT n FROM n)) / (ra * cb)) ELSE 0 END) AS mi "
            "FROM grid) "
            "SELECT (SELECT n FROM n)::BIGINT AS n, "
            "(SELECT COUNT(*) FROM ra)::BIGINT AS r_categories, "
            "(SELECT COUNT(*) FROM cb)::BIGINT AS c_categories, "
            "ROUND(chi2, 6) AS chi2, "
            "ROUND(SQRT(chi2 / ((SELECT n FROM n) * "
            "(LEAST((SELECT COUNT(*) FROM ra), "
            "(SELECT COUNT(*) FROM cb)) - 1))), 6) AS cramers_v, "
            "ROUND(mi, 6) AS mutual_info FROM s"
        ),
        "categorical_profile_documents": (
            # per-column counters: entropy -SUM((c/n)*LN(c/n)), exact
            # distinct, max-count share; one UNION ALL branch per column
            "WITH lc AS (SELECT lang AS v, COUNT(*)::DOUBLE AS c "
            "FROM documents WHERE lang IS NOT NULL GROUP BY lang), "
            "ln_ AS (SELECT SUM(c) AS n FROM lc), "
            "sc AS (SELECT source AS v, COUNT(*)::DOUBLE AS c "
            "FROM documents WHERE source IS NOT NULL GROUP BY source), "
            "sn AS (SELECT SUM(c) AS n FROM sc) "
            "SELECT 'lang' AS column, (SELECT n FROM ln_)::BIGINT AS n, "
            "(SELECT COUNT(*) FILTER (WHERE lang IS NULL) FROM documents)"
            "::BIGINT AS null_count, "
            "COUNT(*)::BIGINT AS n_distinct, "
            "ROUND(-SUM((c / (SELECT n FROM ln_)) "
            "* LN(c / (SELECT n FROM ln_))), 6) AS entropy, "
            "ROUND(MAX(c) / (SELECT n FROM ln_), 6) AS top_share FROM lc "
            "UNION ALL "
            "SELECT 'source', (SELECT n FROM sn)::BIGINT, "
            "(SELECT COUNT(*) FILTER (WHERE source IS NULL) "
            "FROM documents)::BIGINT, "
            "COUNT(*)::BIGINT, "
            "ROUND(-SUM((c / (SELECT n FROM sn)) "
            "* LN(c / (SELECT n FROM sn))), 6), "
            "ROUND(MAX(c) / (SELECT n FROM sn), 6) FROM sc"
        ),
        "suggest_rules_events": suggest_oracle,
        "zorder_events": (
            "WITH b AS (SELECT MIN(value) AS mn0, MAX(value) AS mx0, "
            "MIN(user_id::DOUBLE) AS mn1, MAX(user_id::DOUBLE) AS mx1 "
            "FROM events), "
            "g AS (SELECT event_id, "
            "CASE WHEN value IS NULL OR user_id IS NULL THEN NULL ELSE "
            "CAST(FLOOR((value - mn0) / (mx0 - mn0) * 255.0) AS BIGINT) "
            "END AS g0, "
            "CASE WHEN value IS NULL OR user_id IS NULL THEN NULL ELSE "
            "CAST(FLOOR((user_id::DOUBLE - mn1) / (mx1 - mn1) * 255.0) "
            "AS BIGINT) END AS g1 "
            "FROM events CROSS JOIN b) "
            "SELECT event_id, CASE WHEN g0 IS NULL THEN "
            "9223372036854775807 ELSE " + zterms + " END AS zval "
            "FROM g ORDER BY zval, event_id"
        ),
        "incremental_agg_orders_events": (
            # full recompute over the applied CDC log: latest change
            # per key (ts, event_id desc), D deletes, U upserts into
            # its event_type group; exact int64 cents
            "WITH ch AS (SELECT event_id % 4000 AS k, epoch_us(ts) AS s1, "
            "event_id AS s2, CASE WHEN event_type = 'error' THEN 'D' "
            "ELSE 'U' END AS op, event_type AS g, value AS v "
            "FROM events WHERE value IS NOT NULL), "
            "latest AS (SELECT k, op, g, v FROM ch QUALIFY "
            "ROW_NUMBER() OVER (PARTITION BY k ORDER BY s1 DESC, s2 DESC) "
            "= 1), "
            "applied AS (SELECT COALESCE(l.g, b.o_orderpriority) AS g, "
            "CASE WHEN l.k IS NOT NULL THEN "
            "CAST(ROUND(l.v * 100) AS BIGINT) ELSE "
            "CAST(ROUND(b.o_totalprice * 100) AS BIGINT) END AS u "
            "FROM orders b LEFT JOIN latest l ON l.k = b.o_orderkey "
            "WHERE l.op IS NULL OR l.op != 'D' "
            "UNION ALL "
            "SELECT l.g, CAST(ROUND(l.v * 100) AS BIGINT) "
            "FROM latest l LEFT JOIN orders b ON b.o_orderkey = l.k "
            "WHERE b.o_orderkey IS NULL AND l.op != 'D') "
            "SELECT g AS grp, SUM(u)::BIGINT AS sum_units, "
            "COUNT(*)::BIGINT AS cnt FROM applied GROUP BY g ORDER BY g"
        ),
        "union_by_name_events": (
            # the two generations rebuilt from the view and re-unified
            # by name: value promotes int32 -> DOUBLE, missing columns
            # are NULL; first-seen column order
            "SELECT event_id, event_type, value, "
            "NULL::BIGINT AS user_id FROM events WHERE event_id % 2 = 0 "
            "UNION ALL "
            "SELECT event_id, NULL::VARCHAR, "
            "CAST(TRUNC(value) AS INTEGER)::DOUBLE, user_id "
            "FROM events WHERE event_id % 2 = 1 "
            "ORDER BY event_id"
        ),
        "interpolate_events_value": (
            # nearest non-NULL neighbours via IGNORE NULLS windows; the
            # ratio divides exact int64 microsecond differences (cast
            # to DOUBLE) — term-identical to the engine; zero time gap
            # degrades to the previous value (engine contract)
            "WITH d AS (SELECT event_id, user_id, ts, "
            "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value "
            "FROM events), "
            "w AS (SELECT event_id, user_id, value, epoch_us(ts) AS t, "
            "LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS pv, "
            "LAST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END "
            "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt, "
            "FIRST_VALUE(value IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN 1 FOLLOWING AND "
            "UNBOUNDED FOLLOWING) AS nv, "
            "FIRST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END "
            "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt "
            "FROM d) "
            "SELECT event_id, user_id, value, "
            "CASE WHEN value IS NOT NULL THEN value "
            "WHEN pv IS NULL OR nv IS NULL THEN NULL "
            "WHEN nt = pt THEN ROUND(pv, 6) "
            "ELSE ROUND(pv + (nv - pv) * ((t - pt)::DOUBLE / (nt - pt)), 6) "
            "END AS value_interp "
            "FROM w ORDER BY event_id"
        ),
        "paragraph_dedup_documents": (
            # keep the globally first (doc_id, idx) occurrence of each
            # distinct segment; rebuild docs from survivors in order
            "WITH p AS (SELECT doc_id, "
            "unnest(string_split(COALESCE(text, ''), ' the ')) AS part, "
            "generate_subscripts(string_split(COALESCE(text, ''), "
            "' the '), 1) AS idx FROM documents), "
            "r AS (SELECT doc_id, idx, part, ROW_NUMBER() OVER "
            "(PARTITION BY part ORDER BY doc_id, idx) AS rn FROM p) "
            "SELECT doc_id, COALESCE(string_agg(CASE WHEN rn = 1 THEN "
            "part END, ' the ' ORDER BY idx), '') AS text, "
            "(COUNT(*) FILTER (WHERE rn > 1))::BIGINT AS n_dropped "
            "FROM r GROUP BY doc_id ORDER BY doc_id"
        ),
        "seeded_shuffle_documents": (
            "WITH k AS (SELECT doc_id, lang, "
            "(((doc_id * 2654435761 + 7) % 2147483647) * 2654435761) "
            "% 2147483647 AS shuffle_key FROM documents) "
            "SELECT doc_id, lang, shuffle_key, "
            "ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) "
            'AS "position" FROM k ORDER BY doc_id'
        ),
        "domain_gate_documents": (
            "WITH m AS (SELECT source, ROUND(AVG(n_chars), 6) AS "
            "domain_mean FROM documents GROUP BY source "
            "HAVING domain_mean >= 280.0) "
            "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, "
            "m.domain_mean FROM documents d JOIN m USING (source) "
            "ORDER BY d.doc_id"
        ),
        "domain_boilerplate_documents": (
            # drop ALL occurrences of segments in >= 5 distinct docs
            # of the same domain; rebuild docs from survivors in order
            "WITH p AS (SELECT doc_id, source, "
            "unnest(string_split(COALESCE(text, ''), ' ')) AS part, "
            "generate_subscripts(string_split(COALESCE(text, ''), "
            "' '), 1) AS idx FROM documents), "
            "bad AS (SELECT source, part FROM p GROUP BY source, part "
            "HAVING COUNT(DISTINCT doc_id) >= 5), "
            "t AS (SELECT p.doc_id, p.part, p.idx, "
            "(b.part IS NOT NULL) AS is_bad FROM p LEFT JOIN bad b "
            "ON p.source = b.source AND p.part = b.part) "
            "SELECT doc_id, "
            "COALESCE(string_agg(CASE WHEN NOT is_bad THEN part END, "
            "' ' ORDER BY idx), '') AS text, "
            "(COUNT(*) FILTER (WHERE is_bad))::BIGINT AS n_dropped "
            "FROM t GROUP BY doc_id ORDER BY doc_id"
        ),
        "running_window_events": (
            "SELECT user_id, ts, event_id, value, "
            "ROW_NUMBER() OVER w AS row_seq, "
            "ROUND(SUM(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW), 6) AS running_sum, "
            "LAG(value) OVER w AS prev_value "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "ORDER BY user_id, ts, event_id"
        ),
        "moving_window_events": (
            "SELECT user_id, ts, event_id, value, "
            "CASE WHEN COUNT(value) OVER w > 0 THEN "
            "ROUND(SUM(value) OVER w, 6) END AS mov_sum, "
            "ROUND(AVG(value) OVER w, 6) AS mov_avg, "
            "MIN(value) OVER w AS mov_min, "
            "MAX(value) OVER w AS mov_max, "
            "COUNT(value) OVER w AS mov_count "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
            "ORDER BY user_id, ts, event_id"
        ),
        "late_window_aggregate_events": (
            "WITH w AS (SELECT ts, value, "
            "MAX(ts) OVER (PARTITION BY user_id ORDER BY "
            "((event_id*2654435761)%4294967296)*1048576 + event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events WHERE ts IS NOT NULL) "
            "SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start, "
            "(COUNT(*) FILTER (WHERE wm IS NULL "
            "OR ts >= wm - INTERVAL 14 DAY))::BIGINT AS n_ontime, "
            "ROUND(SUM(value) FILTER (WHERE wm IS NULL "
            "OR ts >= wm - INTERVAL 14 DAY), 6) AS value_sum, "
            "(COUNT(*) FILTER (WHERE wm IS NOT NULL "
            "AND ts < wm - INTERVAL 14 DAY))::BIGINT AS n_late "
            "FROM w GROUP BY 1 ORDER BY 1"
        ),
        "daily_active_users_events": (
            "SELECT date_trunc('day', ts) AS period_start, "
            "COUNT(DISTINCT user_id)::BIGINT AS n_distinct "
            "FROM events WHERE ts IS NOT NULL "
            "GROUP BY 1 ORDER BY 1"
        ),
        "weekly_active_users_events": (
            "WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d "
            "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL) "
            "SELECT days.d AS period_start, "
            "COUNT(DISTINCT e.user_id)::BIGINT AS n_distinct "
            "FROM days JOIN events e ON e.ts IS NOT NULL "
            "AND e.user_id IS NOT NULL "
            "AND date_trunc('day', e.ts) "
            "BETWEEN days.d - INTERVAL 6 DAY AND days.d "
            "GROUP BY 1 ORDER BY 1"
        ),
        "tpch_q3_shipping_priority": (
            "SELECT l_orderkey, o_orderdate, o_orderpriority, "
            "ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) "
            "* 1e4 + 0.5) AS BIGINT)) / 1e4, 4) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1995-03-15' "
            "AND l_shipdate > TIMESTAMP '1995-03-15' "
            "GROUP BY 1, 2, 3 "
            "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
        ),
        "period_over_period_events": (
            "WITH d AS (SELECT date_trunc('day', ts) AS p, SUM(value) AS v "
            "FROM events WHERE ts IS NOT NULL GROUP BY 1), "
            "l AS (SELECT p, v, LAG(v) OVER (ORDER BY p) AS pv FROM d) "
            "SELECT p AS period_start, ROUND(v, 6) AS value_sum, "
            "ROUND(pv, 6) AS prev_sum, ROUND(v - pv, 6) AS abs_change, "
            "CASE WHEN pv IS NOT NULL AND pv <> 0 "
            "THEN ROUND((v - pv) / pv, 6) END AS pct_change "
            "FROM l ORDER BY p"
        ),
        "grouped_mad_events": (
            "SELECT event_type, COUNT(value)::BIGINT AS n, "
            "median(value) AS median, mad(value) AS mad "
            "FROM events WHERE event_type IS NOT NULL "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "right_join_orders_customer": (
            "SELECT c_custkey, o_orderkey, o_totalprice, c_acctbal "
            "FROM orders RIGHT JOIN customer "
            "ON o_custkey = c_custkey "
            "ORDER BY c_custkey, o_orderkey"
        ),
        "interarrival_stats_events": (
            "WITH g AS (SELECT user_id, epoch_us(ts) - "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS gap "
            "FROM events WHERE ts IS NOT NULL) "
            "SELECT user_id, COUNT(*)::BIGINT AS n_events, "
            "COUNT(gap)::BIGINT AS n_gaps, "
            "ROUND(AVG(gap) / 1e6, 6) AS mean_gap_s, "
            "MIN(gap)::DOUBLE AS min_gap_us, "
            "MAX(gap)::DOUBLE AS max_gap_us "
            "FROM g GROUP BY user_id ORDER BY user_id"
        ),
        "missingness_matrix_events": (
            "WITH p AS ("
            "SELECT 'event_type' a, 'ts' b, "
            "COUNT(*) FILTER (WHERE event_type IS NULL AND ts IS NULL) nb, "
            "COUNT(*) FILTER (WHERE event_type IS NULL OR ts IS NULL) ne "
            "FROM events "
            "UNION ALL SELECT 'event_type', 'user_id', "
            "COUNT(*) FILTER (WHERE event_type IS NULL AND user_id IS NULL), "
            "COUNT(*) FILTER (WHERE event_type IS NULL OR user_id IS NULL) "
            "FROM events "
            "UNION ALL SELECT 'event_type', 'value', "
            "COUNT(*) FILTER (WHERE event_type IS NULL AND value IS NULL), "
            "COUNT(*) FILTER (WHERE event_type IS NULL OR value IS NULL) "
            "FROM events "
            "UNION ALL SELECT 'ts', 'user_id', "
            "COUNT(*) FILTER (WHERE ts IS NULL AND user_id IS NULL), "
            "COUNT(*) FILTER (WHERE ts IS NULL OR user_id IS NULL) "
            "FROM events "
            "UNION ALL SELECT 'ts', 'value', "
            "COUNT(*) FILTER (WHERE ts IS NULL AND value IS NULL), "
            "COUNT(*) FILTER (WHERE ts IS NULL OR value IS NULL) "
            "FROM events "
            "UNION ALL SELECT 'user_id', 'value', "
            "COUNT(*) FILTER (WHERE user_id IS NULL AND value IS NULL), "
            "COUNT(*) FILTER (WHERE user_id IS NULL OR value IS NULL) "
            "FROM events"
            ") SELECT a AS col_a, b AS col_b, nb::BIGINT AS n_both_null, "
            "ne::BIGINT AS n_either_null, "
            "CASE WHEN ne > 0 THEN nb::DOUBLE / ne END AS null_jaccard "
            "FROM p ORDER BY col_a, col_b"
        ),
        "ratio_to_report_events": _RATIO_TO_REPORT_SQL,
        # the bucketed (no-broadcast) tier must be value-identical
        "ratio_to_report_bucketed_events": _RATIO_TO_REPORT_SQL,
        "anomaly_zscore_events": (
            "SELECT user_id, event_id, "
            "ROUND((value - AVG(value) OVER w) / "
            "NULLIF(STDDEV_SAMP(value) OVER w, 0), 6) AS zscore "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING) "
            "ORDER BY user_id, event_id"
        ),
        "time_range_window_events": (
            "SELECT user_id, ts, value, "
            "CASE WHEN COUNT(value) OVER w > 0 THEN "
            "ROUND(SUM(value) OVER w, 6) END AS rng_sum, "
            "MIN(value) OVER w AS rng_min, "
            "MAX(value) OVER w AS rng_max, "
            "COUNT(value) OVER w AS rng_count "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 3600 SECOND PRECEDING "
            "AND CURRENT ROW) "
            "ORDER BY user_id, ts, value"
        ),
        "edge_values_events": (
            "SELECT user_id, ts, event_id, value, "
            "LEAD(value, 1) OVER w AS next_value, "
            "FIRST_VALUE(value) OVER w AS first_value, "
            "LAST_VALUE(value) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
            "AS last_value, "
            "COUNT(*) OVER (PARTITION BY user_id) AS key_rows "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "ORDER BY user_id, ts, event_id"
        ),
        "unpivot_lineitem": (
            "SELECT l_orderkey, l_linenumber, variable, value FROM ("
            "SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, "
            "l_quantity::DOUBLE AS value FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, "
            "'l_extendedprice', l_extendedprice::DOUBLE FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, "
            "'l_discount', l_discount::DOUBLE FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, "
            "'l_tax', l_tax::DOUBLE FROM lineitem) "
            "ORDER BY l_orderkey, l_linenumber, variable"
        ),
        "json_extract_events": (
            "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k "
            "FROM events ORDER BY event_id"
        ),
        "rollup_documents": (
            "SELECT CAST(GROUPING(lang) + GROUPING(source) AS BIGINT) "
            "AS level, lang, source, COUNT(*)::BIGINT AS n_rows, "
            "CAST(SUM(n_chars) AS BIGINT) AS value_sum "
            "FROM documents GROUP BY ROLLUP(lang, source) "
            "ORDER BY level, lang NULLS LAST, source NULLS LAST"
        ),
        "except_customers_events": (
            "SELECT c_custkey FROM customer "
            "EXCEPT SELECT user_id FROM events "
            "ORDER BY c_custkey"
        ),
        "intersect_events_users": (
            "SELECT user_id FROM events WHERE event_id % 2 = 0 "
            "INTERSECT "
            "SELECT user_id FROM events WHERE event_id % 2 = 1 "
            "ORDER BY user_id"
        ),
        "intersect_all_lineitem": (
            "SELECT l_returnflag, l_quantity FROM lineitem "
            "WHERE l_discount <= 0.05 "
            "INTERSECT ALL "
            "SELECT l_returnflag, l_quantity FROM lineitem "
            "WHERE l_discount > 0.05 "
            "ORDER BY l_returnflag, l_quantity"
        ),
        "except_all_lineitem": (
            "SELECT l_returnflag, l_quantity FROM lineitem "
            "WHERE l_discount <= 0.05 "
            "EXCEPT ALL "
            "SELECT l_returnflag, l_quantity FROM lineitem "
            "WHERE l_discount > 0.05 "
            "ORDER BY l_returnflag, l_quantity"
        ),
        "cube_events": (
            "WITH e AS (SELECT event_type, user_id % 4 AS user_band, "
            "value FROM events) "
            "SELECT CAST(GROUPING(event_type) * 2 + GROUPING(user_band) "
            "AS BIGINT) AS grouping_id, event_type, user_band, "
            "COUNT(*)::BIGINT AS n_rows, "
            "ROUND(SUM(value), 6) AS value_sum "
            "FROM e GROUP BY CUBE(event_type, user_band) "
            "ORDER BY grouping_id, event_type NULLS LAST, "
            "user_band NULLS LAST"
        ),
        "top_events_by_value": (
            "SELECT event_id, value FROM events "
            "WHERE value IS NOT NULL "
            "ORDER BY value DESC, event_id LIMIT 100"
        ),
        "global_rank_events": (
            "SELECT event_id, value, "
            "ROW_NUMBER() OVER w AS rank, NTILE(7) OVER w AS tile, "
            "PERCENT_RANK() OVER w AS percent_rank, "
            "CUME_DIST() OVER w AS cume_dist "
            "FROM events WINDOW w AS (ORDER BY value, event_id) "
            "ORDER BY rank"
        ),
        "standardize_events_value": (
            "WITH s AS (SELECT AVG(value) AS m, STDDEV_SAMP(value) AS sd "
            "FROM events) "
            "SELECT event_id, value, "
            "ROUND((value - s.m) / NULLIF(s.sd, 0), 6) AS z "
            "FROM events CROSS JOIN s ORDER BY event_id"
        ),
        "numeric_profile_events": (
            "SELECT * FROM ("
            "SELECT 'event_id' AS \"column\", COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) - COUNT(event_id))::BIGINT AS null_count, "
            "MIN(event_id)::DOUBLE AS min_value, MAX(event_id)::DOUBLE AS max_value, "
            "ROUND(AVG(event_id), 6) AS mean_value FROM events "
            "UNION ALL "
            "SELECT 'user_id', COUNT(*)::BIGINT, "
            "(COUNT(*) - COUNT(user_id))::BIGINT, "
            "MIN(user_id)::DOUBLE, MAX(user_id)::DOUBLE, "
            "ROUND(AVG(user_id), 6) FROM events "
            "UNION ALL "
            "SELECT 'value', COUNT(*)::BIGINT, "
            "(COUNT(*) - COUNT(value))::BIGINT, "
            "MIN(value)::DOUBLE, MAX(value)::DOUBLE, "
            "ROUND(AVG(value), 6) FROM events) "
            "ORDER BY \"column\""
        ),
        "robust_scale_events": (
            "WITH q AS (SELECT event_type, "
            "quantile_cont(value, 0.25) AS p25, "
            "quantile_cont(value, 0.5) AS p50, "
            "quantile_cont(value, 0.75) AS p75 FROM events "
            "WHERE event_type IS NOT NULL GROUP BY event_type) "
            "SELECT e.event_id, e.value, "
            "CASE WHEN e.value IS NULL OR e.event_type IS NULL "
            "OR (q.p75 - q.p25) <= 0 THEN NULL "
            "ELSE ROUND((e.value - q.p50) / (q.p75 - q.p25), 6) END AS r "
            "FROM events e LEFT JOIN q USING (event_type) "
            "ORDER BY e.event_id"
        ),
        "snapshot_diff_events": (
            "WITH old AS (SELECT event_id, value FROM events "
            "WHERE event_id < 8000), "
            "new AS (SELECT event_id, CASE WHEN event_id % 5 = 0 "
            "THEN value + 1 ELSE value END AS value FROM events "
            "WHERE event_id >= 2000) "
            "SELECT COALESCE(o.event_id, n.event_id) AS event_id, "
            "CASE WHEN o.event_id IS NULL THEN 'added' "
            "WHEN n.event_id IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change, "
            "o.value AS value_old, n.value AS value_new "
            "FROM old o FULL JOIN new n ON o.event_id = n.event_id "
            "WHERE o.event_id IS NULL OR n.event_id IS NULL "
            "OR (o.value IS DISTINCT FROM n.value) "
            "ORDER BY event_id"
        ),
        "rank_dense_events": (
            "SELECT event_id, FLOOR(value / 100.0) AS band, "
            "RANK() OVER (ORDER BY FLOOR(value / 100.0)) AS rank_ties, "
            "DENSE_RANK() OVER (ORDER BY FLOOR(value / 100.0)) "
            "AS dense_rank "
            "FROM events ORDER BY event_id"
        ),
        "quantile_bucketize_events": (
            "WITH e AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75]) "
            "AS q FROM events) "
            "SELECT event_id, value, "
            "CASE WHEN value IS NOT NULL THEN "
            "(1 + len(list_filter(e.q, x -> x <= value)))::BIGINT END "
            "AS bin FROM events CROSS JOIN e ORDER BY event_id"
        ),
        "grouped_stats_lineitem": (
            "SELECT l_returnflag, COUNT(l_quantity)::BIGINT AS n_x, "
            "ROUND(AVG(l_quantity), 6) AS avg_x, "
            "ROUND(VAR_SAMP(l_quantity), 6) AS var_x, "
            "ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_xy "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "weighted_stats_lineitem": (
            "SELECT l_returnflag, "
            "(COUNT(*) FILTER (WHERE l_extendedprice IS NOT NULL AND "
            "l_quantity IS NOT NULL))::BIGINT AS n_pairs, "
            "ROUND(SUM(l_quantity) FILTER (WHERE l_extendedprice IS NOT "
            "NULL), 6) AS weight_sum, "
            "ROUND(SUM(l_quantity * l_extendedprice) / 1e6, 6) AS weighted_sum_m, "
            "ROUND(SUM(l_quantity * l_extendedprice) / "
            "SUM(l_quantity) FILTER (WHERE l_extendedprice IS NOT NULL), "
            "6) AS weighted_mean "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "join_size_profile_lineitem_orders": (
            "WITH ca AS (SELECT l_orderkey k, COUNT(*) c FROM lineitem "
            "WHERE l_orderkey IS NOT NULL GROUP BY 1), "
            "cb AS (SELECT o_orderkey k, COUNT(*) c FROM orders "
            "WHERE o_orderkey IS NOT NULL GROUP BY 1), "
            "j AS (SELECT ca.c * cb.c AS pairs FROM ca JOIN cb USING (k)) "
            "SELECT SUM(pairs)::BIGINT AS rows_out, "
            "COUNT(*)::BIGINT AS shared_keys, "
            "MAX(pairs)::BIGINT AS max_key_rows, "
            "MAX(pairs)::DOUBLE / (SUM(pairs)::DOUBLE / COUNT(*)) "
            "AS skew_ratio FROM j"
        ),
        "type_conformance_events": (
            "WITH src AS (SELECT props, event_type, "
            "CASE event_id % 4 "
            "WHEN 0 THEN CAST(event_id AS VARCHAR) "
            "WHEN 1 THEN CAST(event_id AS VARCHAR) || '.5' "
            "WHEN 2 THEN 'abc' "
            "ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS dirty_str "
            "FROM events), "
            "u AS (SELECT 'props' AS col, props AS v FROM src "
            "UNION ALL SELECT 'event_type', event_type FROM src "
            "UNION ALL SELECT 'dirty_str', dirty_str FROM src) "
            "SELECT col AS \"column\", COUNT(*)::BIGINT AS n, "
            "(COUNT(*) - COUNT(v))::BIGINT AS n_null, "
            "(COUNT(*) FILTER (WHERE trim(v) = ''))::BIGINT AS n_empty, "
            "(COUNT(*) FILTER (WHERE regexp_matches(trim(v), "
            r"'^[+-]?\d{1,18}$'"
            ")))::BIGINT AS n_int, "
            "(COUNT(*) FILTER (WHERE trim(v) <> '' AND regexp_matches("
            r"trim(v), '^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$'"
            ")))::BIGINT AS n_float, "
            "(COUNT(*) FILTER (WHERE trim(v) <> '' AND "
            "try_strptime(trim(v), '%Y-%m-%d %H:%M:%S') IS NOT NULL"
            "))::BIGINT AS n_ts "
            "FROM u GROUP BY col ORDER BY col"
        ),
        "correlation_matrix_lineitem": (
            "WITH p AS ("
            "SELECT 'l_quantity' a, 'l_extendedprice' b, "
            "COUNT(*) FILTER (WHERE l_quantity IS NOT NULL AND "
            "l_extendedprice IS NOT NULL) n, "
            "CORR(l_quantity, l_extendedprice) c FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_discount', "
            "COUNT(*) FILTER (WHERE l_quantity IS NOT NULL AND "
            "l_discount IS NOT NULL), CORR(l_quantity, l_discount) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_tax', "
            "COUNT(*) FILTER (WHERE l_quantity IS NOT NULL AND "
            "l_tax IS NOT NULL), CORR(l_quantity, l_tax) FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_discount', "
            "COUNT(*) FILTER (WHERE l_extendedprice IS NOT NULL AND "
            "l_discount IS NOT NULL), CORR(l_extendedprice, l_discount) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_tax', "
            "COUNT(*) FILTER (WHERE l_extendedprice IS NOT NULL AND "
            "l_tax IS NOT NULL), CORR(l_extendedprice, l_tax) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_discount', 'l_tax', "
            "COUNT(*) FILTER (WHERE l_discount IS NOT NULL AND "
            "l_tax IS NOT NULL), CORR(l_discount, l_tax) FROM lineitem"
            ") SELECT a AS col_a, b AS col_b, n::BIGINT AS n_pairs, "
            "ROUND(c, 6) AS corr FROM p ORDER BY col_a, col_b"
        ),
        "grouped_mode_events": (
            "SELECT user_id, mode_value, cnt::BIGINT AS mode_count FROM ("
            "  SELECT user_id, event_type AS mode_value, COUNT(*) AS cnt,"
            "         ROW_NUMBER() OVER (PARTITION BY user_id"
            "           ORDER BY COUNT(*) DESC, event_type) AS rn"
            "  FROM events WHERE event_type IS NOT NULL"
            "  GROUP BY user_id, event_type"
            ") WHERE rn = 1 ORDER BY user_id"
        ),
        "explode_embeddings": (
            "SELECT vec_id, "
            "generate_subscripts(embedding, 1)::BIGINT AS pos, "
            "unnest(embedding) AS emb_val "
            "FROM embeddings ORDER BY vec_id, pos"
        ),
        "remove_dup_spans_documents": (
            # same dup-window discovery as dup_span_stats, then keep
            # tokens NOT covered and string_agg them back in order
            "WITH toks AS (SELECT doc_id, list_filter(string_split("
            "COALESCE(text, ''), ' '), x -> x <> '') AS ts "
            "FROM documents), "
            "pos AS (SELECT doc_id, "
            "unnest(generate_series(1, len(ts) - 7)) AS p "
            "FROM toks WHERE len(ts) >= 8), "
            "sh AS (SELECT pos.doc_id, p, array_to_string((SELECT ts "
            "FROM toks t WHERE t.doc_id = pos.doc_id)[p:p+7], ' ') AS s "
            "FROM pos), "
            "dup AS (SELECT doc_id, p FROM sh WHERE s IN "
            "(SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2)), "
            "tok AS (SELECT doc_id, "
            "unnest(generate_series(1, len(ts))) AS t FROM toks), "
            "cov AS (SELECT DISTINCT tok.doc_id, t FROM tok JOIN dup "
            "ON dup.doc_id = tok.doc_id AND dup.p <= t "
            "AND t <= dup.p + 7), "
            "kept AS (SELECT tok.doc_id, t, (SELECT ts FROM toks x "
            "WHERE x.doc_id = tok.doc_id)[t] AS w FROM tok "
            "ANTI JOIN cov USING (doc_id, t)), "
            "agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY t) AS "
            "text, COUNT(*) AS n_kept FROM kept GROUP BY doc_id) "
            "SELECT toks.doc_id, COALESCE(agg.text, '') AS text, "
            "len(ts)::BIGINT AS n_tokens, "
            "(len(ts) - COALESCE(n_kept, 0))::BIGINT AS n_removed_tokens "
            "FROM toks LEFT JOIN agg USING (doc_id) ORDER BY doc_id"
        ),
        "dup_span_stats_documents": (
            # token t is duplicated iff some 8-gram window [p, p+7]
            # covering it occurs >= 2 times corpus-wide
            "WITH toks AS (SELECT doc_id, list_filter(string_split("
            "COALESCE(text, ''), ' '), x -> x <> '') AS ts "
            "FROM documents), "
            "pos AS (SELECT doc_id, "
            "unnest(generate_series(1, len(ts) - 7)) AS p "
            "FROM toks WHERE len(ts) >= 8), "
            "sh AS (SELECT pos.doc_id, p, array_to_string((SELECT ts "
            "FROM toks t WHERE t.doc_id = pos.doc_id)[p:p+7], ' ') AS s "
            "FROM pos), "
            "dup AS (SELECT doc_id, p FROM sh WHERE s IN "
            "(SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2)), "
            "tok AS (SELECT doc_id, "
            "unnest(generate_series(1, len(ts))) AS t FROM toks), "
            "cov AS (SELECT DISTINCT tok.doc_id, t FROM tok JOIN dup "
            "ON dup.doc_id = tok.doc_id AND dup.p <= t "
            "AND t <= dup.p + 7) "
            "SELECT toks.doc_id, len(ts)::BIGINT AS n_tokens, "
            "COALESCE(cv.n, 0)::BIGINT AS n_dup_tokens "
            "FROM toks LEFT JOIN (SELECT doc_id, COUNT(*) AS n "
            "FROM cov GROUP BY doc_id) cv USING (doc_id) "
            "ORDER BY doc_id"
        ),
        "forward_fill_events": (
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END "
            "AS value FROM events) "
            "SELECT user_id, ts, event_id, value, "
            "LAST_VALUE(value IGNORE NULLS) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS value_filled "
            "FROM e ORDER BY user_id, ts, event_id"
        ),
        "grouped_top_k_events": (
            "SELECT user_id, event_id, value FROM ("
            "SELECT user_id, event_id, value, ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY value DESC, event_id) "
            "AS rn FROM events WHERE value IS NOT NULL) "
            "WHERE rn <= 3 ORDER BY user_id, event_id"
        ),
        "calendar_agg_events": (
            "SELECT date_trunc('week', ts) AS period, event_type, "
            "COUNT(*)::BIGINT AS n_events, "
            "ROUND(SUM(value), 6) AS value_sum, "
            "ROUND(SUM(value) / COUNT(value), 6) AS value_avg "
            "FROM events GROUP BY period, event_type "
            "ORDER BY period, event_type"
        ),
        "regex_extract_events": (
            "SELECT event_id, NULLIF(regexp_extract(props, "
            "'\"k\": (\\d+)', 1), '') AS kraw "
            "FROM events ORDER BY event_id"
        ),
        "try_cast_events": (
            "SELECT event_id, TRY_CAST(CASE WHEN event_id % 7 = 0 "
            "THEN 'bad' ELSE CAST(event_id AS VARCHAR) END AS BIGINT) "
            "AS parsed FROM events ORDER BY event_id"
        ),
        "embedding_covariance_matrix": (
            "WITH e AS (SELECT vec_id, "
            "generate_subscripts(embedding, 1)::BIGINT AS pos, "
            "unnest(embedding)::DOUBLE AS val FROM embeddings) "
            "SELECT a.pos AS i, b.pos AS j, "
            "ROUND(COVAR_SAMP(a.val, b.val), 6) AS cov "
            "FROM e a JOIN e b USING (vec_id) "
            "GROUP BY a.pos, b.pos ORDER BY i, j"
        ),
        "embedding_drift_splits": (
            "WITH e AS (SELECT vec_id, "
            "generate_subscripts(embedding, 1) AS pos, "
            "unnest(embedding)::DOUBLE AS val FROM embeddings "
            "WHERE embedding IS NOT NULL), "
            "a AS (SELECT pos, AVG(val) m FROM e WHERE vec_id % 2 = 0 "
            "GROUP BY pos), "
            "b AS (SELECT pos, AVG(val) m FROM e WHERE vec_id % 2 = 1 "
            "GROUP BY pos), "
            "j AS (SELECT a.m am, b.m bm FROM a JOIN b USING (pos)) "
            "SELECT "
            "(SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 0 "
            "AND embedding IS NOT NULL)::BIGINT AS n_a, "
            "(SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 1 "
            "AND embedding IS NOT NULL)::BIGINT AS n_b, "
            "ROUND(SUM(am * bm) / (sqrt(SUM(am * am)) * "
            "sqrt(SUM(bm * bm))), 6) AS mean_cosine, "
            "ROUND(sqrt(SUM((am - bm) * (am - bm))), 6) AS mean_l2_dist "
            "FROM j"
        ),
        "embedding_norms": (
            "SELECT vec_id, "
            "ROUND(sqrt(list_inner_product(embedding::DOUBLE[], "
            "embedding::DOUBLE[])), 6) AS l2_norm, "
            "COALESCE(sqrt(list_inner_product(embedding::DOUBLE[], "
            "embedding::DOUBLE[])) = 0, FALSE) AS is_zero "
            "FROM embeddings ORDER BY vec_id"
        ),
        "scd2_events_user_type": (
            "WITH ch AS (SELECT user_id, event_type, ts, event_id, "
            "LAG(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pv, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn "
            "FROM events WHERE user_id IS NOT NULL), "
            "v AS (SELECT user_id, event_type, ts AS valid_from, "
            "event_id FROM ch "
            "WHERE rn = 1 OR pv IS DISTINCT FROM event_type) "
            "SELECT user_id, event_type, valid_from, "
            "LEAD(valid_from) OVER (PARTITION BY user_id "
            "ORDER BY valid_from, event_id) AS valid_to, "
            "LEAD(valid_from) OVER (PARTITION BY user_id "
            "ORDER BY valid_from, event_id) IS NULL AS is_current "
            "FROM v ORDER BY user_id, valid_from"
        ),
        "disc_quantiles_events": (
            "SELECT event_type, "
            "quantile_disc(value, 0.25) AS p25, "
            "quantile_disc(value, 0.5) AS p50, "
            "quantile_disc(value, 0.9) AS p90 "
            "FROM events WHERE event_type IS NOT NULL "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "bucketed_join_lineitem_orders": (
            "SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "ORDER BY l_orderkey, l_linenumber"
        ),
        "group_limit_events_user": (
            "WITH g AS (SELECT user_id, COUNT(*) AS c FROM events "
            "WHERE user_id IS NOT NULL GROUP BY user_id) "
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE NOT (c <= 60)))::BIGINT "
            "AS failed_count FROM g"
        ),
        "group_limit_orders_avg": (
            "WITH g AS (SELECT o_custkey, AVG(o_totalprice) AS a "
            "FROM orders WHERE o_custkey IS NOT NULL "
            "GROUP BY o_custkey) "
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE NOT (a <= 300000)))::BIGINT "
            "AS failed_count FROM g"
        ),
        "correlation_lineitem": (
            "SELECT 1::BIGINT AS total_count, "
            "(CASE WHEN CORR(l_quantity, l_extendedprice) "
            "BETWEEN -0.1 AND 0.1 THEN 0 ELSE 1 END)::BIGINT "
            "AS failed_count, "
            "ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr "
            "FROM lineitem"
        ),
        "entropy_events_type": (
            "WITH c AS (SELECT event_type AS v, COUNT(*)::DOUBLE AS c "
            "FROM events WHERE event_type IS NOT NULL "
            "GROUP BY event_type), "
            "t AS (SELECT SUM(c) AS n, SUM(c * LN(c)) AS slc, "
            "COUNT(*)::BIGINT AS d FROM c) "
            "SELECT 1::BIGINT AS total_count, "
            "(CASE WHEN (LN(n) - slc / n) BETWEEN 0.5 AND 3.0 "
            "THEN 0 ELSE 1 END)::BIGINT AS failed_count, "
            "ROUND(LN(n) - slc / n, 6) AS entropy, d AS distinct_count "
            "FROM t"
        ),
        "distinctness_documents_lang": (
            "SELECT 1::BIGINT AS total_count, "
            "(CASE WHEN COUNT(DISTINCT lang)::DOUBLE / COUNT(lang) "
            "BETWEEN 0.0 AND 0.5 THEN 0 ELSE 1 END)::BIGINT "
            "AS failed_count, "
            "ROUND(COUNT(DISTINCT lang)::DOUBLE / COUNT(lang), 6) "
            "AS distinctness, "
            "COUNT(DISTINCT lang)::BIGINT AS distinct_count, "
            "COUNT(lang)::BIGINT AS non_null_count FROM documents"
        ),
        "unique_value_ratio_orders": (
            "WITH c AS (SELECT o_totalprice AS v, COUNT(*)::BIGINT AS c "
            "FROM orders WHERE o_totalprice IS NOT NULL "
            "GROUP BY o_totalprice), "
            "t AS (SELECT (COUNT(*) FILTER (WHERE c = 1))::BIGINT AS u, "
            "COUNT(*)::BIGINT AS d FROM c) "
            "SELECT 1::BIGINT AS total_count, "
            "(CASE WHEN u::DOUBLE / d BETWEEN 0.5 AND 1.0 "
            "THEN 0 ELSE 1 END)::BIGINT AS failed_count, "
            "ROUND(u::DOUBLE / d, 6) AS unique_value_ratio, "
            "u AS unique_count, d AS distinct_count FROM t"
        ),
        "mutual_information_documents": (
            "WITH j AS (SELECT lang AS x, source AS y, "
            "COUNT(*)::DOUBLE AS c FROM documents "
            "WHERE lang IS NOT NULL AND source IS NOT NULL "
            "GROUP BY lang, source), "
            "t AS (SELECT SUM(c) AS n FROM j), "
            "mx AS (SELECT x, SUM(c) AS cx FROM j GROUP BY x), "
            "my AS (SELECT y, SUM(c) AS cy FROM j GROUP BY y), "
            "s AS (SELECT SUM((j.c / t.n) * LN(j.c * t.n / "
            "(mx.cx * my.cy))) AS mi, SUM(j.c)::BIGINT AS np, "
            "COUNT(*)::BIGINT AS dp "
            "FROM j CROSS JOIN t JOIN mx USING (x) JOIN my USING (y)) "
            "SELECT 1::BIGINT AS total_count, "
            "(CASE WHEN mi BETWEEN 0.0 AND 1.0 THEN 0 ELSE 1 END)::BIGINT "
            "AS failed_count, ROUND(mi, 6) AS mutual_information, "
            "np AS n_pairs, dp AS distinct_pairs FROM s"
        ),
        "string_length_documents_text": (
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE LENGTH(text) < 100 "
            "OR LENGTH(text) > 500))::BIGINT AS failed_count, "
            "MIN(LENGTH(text))::BIGINT AS min_length, "
            "MAX(LENGTH(text))::BIGINT AS max_length FROM documents"
        ),
        "label_encode_events": (
            "WITH v AS (SELECT DISTINCT event_type FROM events "
            "WHERE event_type IS NOT NULL), "
            "r AS (SELECT event_type, "
            "(ROW_NUMBER() OVER (ORDER BY event_type) - 1)::BIGINT "
            "AS event_type_idx FROM v) "
            "SELECT e.event_id, e.event_type, r.event_type_idx "
            "FROM events e LEFT JOIN r USING (event_type) "
            "ORDER BY event_id"
        ),
        "target_encode_events": (
            "WITH g AS (SELECT SUM(value) / COUNT(value) AS gm "
            "FROM events), "
            "a AS (SELECT event_type, COALESCE(SUM(value), 0) AS s, "
            "COUNT(value) AS n FROM events "
            "WHERE event_type IS NOT NULL GROUP BY event_type), "
            "m AS (SELECT event_type, "
            "(s + 10 * (SELECT gm FROM g)) / (n + 10) AS te FROM a) "
            "SELECT e.event_id, "
            "ROUND(COALESCE(m.te, (SELECT gm FROM g)), 6) "
            "AS event_type_te "
            "FROM events e LEFT JOIN m USING (event_type) "
            "ORDER BY event_id"
        ),
        "grouping_sets_events": (
            "WITH e AS (SELECT event_type, user_id % 4 AS user_band, "
            "value FROM events) "
            "SELECT CAST(GROUPING(event_type) * 2 + GROUPING(user_band) "
            "AS BIGINT) AS grouping_id, event_type, user_band, "
            "COUNT(*)::BIGINT AS n_rows, "
            "ROUND(SUM(value), 6) AS value_sum "
            "FROM e GROUP BY GROUPING SETS ((event_type), (user_band), ()) "
            "ORDER BY grouping_id, event_type NULLS LAST, "
            "user_band NULLS LAST"
        ),
        "pivot_sums_events": (
            "SELECT user_id, "
            "ROUND(COALESCE(SUM(value) FILTER "
            "(WHERE event_type = 'click'), 0), 6) AS sum_click, "
            "(COUNT(value) FILTER (WHERE event_type = 'click'))::BIGINT "
            "AS n_click, "
            "ROUND(COALESCE(SUM(value) FILTER "
            "(WHERE event_type = 'purchase'), 0), 6) AS sum_purchase, "
            "(COUNT(value) FILTER (WHERE event_type = 'purchase'))::BIGINT "
            "AS n_purchase, "
            "ROUND(COALESCE(SUM(value) FILTER "
            "(WHERE event_type = 'view'), 0), 6) AS sum_view, "
            "(COUNT(value) FILTER (WHERE event_type = 'view'))::BIGINT "
            "AS n_view "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "range_checksums_events": (
            "WITH s AS (SELECT "
            "CAST(FLOOR(event_id / 1000) AS BIGINT) AS range_id, "
            "COALESCE(CAST(event_id AS VARCHAR), '') || '|' || "
            "COALESCE(CAST(epoch_us(ts) AS VARCHAR), '') || '|' || "
            "COALESCE(event_type, '') || '|' || "
            "COALESCE(CAST(user_id AS VARCHAR), '') AS row_str "
            "FROM events) "
            "SELECT range_id, COUNT(*)::BIGINT AS n_rows, "
            "CAST(SUM(md5_number_lower(row_str)::HUGEINT) % "
            "18446744073709551616 AS UBIGINT) AS checksum "
            "FROM s GROUP BY range_id ORDER BY range_id"
        ),
        "bloom_join_lineitem_orders": (
            "SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_totalprice > 450000 "
            "ORDER BY l_orderkey, l_linenumber"
        ),
        "bloom_anti_join_customers": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM events e "
            "WHERE e.user_id = c.c_custkey) "
            "ORDER BY c_custkey"
        ),
        "ohlc_events": (
            "WITH b AS (SELECT user_id, value, ts, event_id, "
            "time_bucket(INTERVAL 3600 SECOND, ts) AS w FROM events "
            "WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
            "r AS (SELECT user_id, w, value, "
            "FIRST_VALUE(value) OVER win AS o, "
            "LAST_VALUE(value) OVER win AS c "
            "FROM b WINDOW win AS (PARTITION BY user_id, w "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) "
            "SELECT user_id, w AS window_start, MIN(o) AS open, "
            "MAX(value) AS high, MIN(value) AS low, MIN(c) AS close, "
            "COUNT(*)::BIGINT AS n_events "
            "FROM r GROUP BY user_id, w ORDER BY user_id, w"
        ),
        "phrase_search_documents": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS tk "
            "FROM documents WHERE text IS NOT NULL), "
            "m AS (SELECT doc_id, "
            "len(list_filter(generate_series(1, len(tk) - 1), "
            "i -> tk[i] = 'value' AND tk[i+1] = 'table')) AS n_matches "
            "FROM t) "
            "SELECT doc_id, n_matches FROM m WHERE n_matches > 0 "
            "ORDER BY doc_id"
        ),
        "monotonic_events_value": (
            "WITH s AS (SELECT value, LAG(value) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS pv "
            "FROM events WHERE user_id IS NOT NULL "
            "AND ts IS NOT NULL AND event_id IS NOT NULL) "
            "SELECT COUNT(*)::BIGINT AS total_count, "
            "(COUNT(*) FILTER (WHERE value < pv))::BIGINT AS failed_count "
            "FROM s"
        ),
        "grouped_acf_events": (
            "WITH s AS (SELECT user_id, value, "
            "LAG(value, 1) OVER w AS x1, "
            "LAG(value, 2) OVER w AS x2, "
            "LAG(value, 3) OVER w AS x3 "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "AND event_id IS NOT NULL "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "u AS ("
            "SELECT user_id, 1 AS lag, CORR(value, x1) AS a, "
            "REGR_COUNT(value, x1) AS np FROM s GROUP BY user_id "
            "UNION ALL SELECT user_id, 2, CORR(value, x2), "
            "REGR_COUNT(value, x2) FROM s GROUP BY user_id "
            "UNION ALL SELECT user_id, 3, CORR(value, x3), "
            "REGR_COUNT(value, x3) FROM s GROUP BY user_id) "
            "SELECT user_id, lag, ROUND(a, 6) AS acf FROM u "
            "WHERE np > 0 ORDER BY user_id, lag"
        ),
        "pareto_customers": (
            "WITH agg AS (SELECT o_custkey, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS spend_cents, COUNT(*) AS n_orders "
            "FROM orders GROUP BY o_custkey) "
            "SELECT o_custkey, spend_cents, n_orders FROM agg a "
            "WHERE NOT EXISTS (SELECT 1 FROM agg b "
            "WHERE b.spend_cents >= a.spend_cents "
            "AND b.n_orders >= a.n_orders "
            "AND (b.spend_cents > a.spend_cents "
            "OR b.n_orders > a.n_orders)) ORDER BY o_custkey"
        ),
        "revenue_by_nation": (
            "SELECT n_name, SUM(CAST(FLOOR(l_extendedprice * "
            "(1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 "
            "AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "chunk_documents": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, "
            "len(string_split(text, ' ')) AS n FROM documents "
            "WHERE text IS NOT NULL), "
            "c AS (SELECT doc_id, n, toks, "
            "unnest(generate_series(0, CASE WHEN n <= 32 THEN 0 ELSE "
            "CAST(CEIL((n - 32) / 24.0) AS BIGINT) END)) AS chunk_id "
            "FROM t) "
            "SELECT doc_id, chunk_id, "
            "LEAST(chunk_id * 24 + 32, n) - chunk_id * 24 AS n_tokens, "
            "array_to_string(list_slice(toks, chunk_id * 24 + 1, "
            "LEAST(chunk_id * 24 + 32, n)), ' ') AS chunk_text "
            "FROM c ORDER BY doc_id, chunk_id"
        ),
        "embedding_outliers": (
            "WITH u AS (SELECT vec_id, "
            "generate_subscripts(embedding, 1) AS i, "
            "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), "
            "m AS (SELECT i, AVG(v) AS mv FROM u GROUP BY i), "
            "mm AS (SELECT SUM(mv * mv) AS m2 FROM m), "
            "d AS (SELECT vec_id, SUM(v * mv) AS dot, SUM(v * v) AS v2 "
            "FROM u JOIN m USING (i) GROUP BY vec_id) "
            "SELECT vec_id, ROUND(dot / (SQRT(v2) * "
            "SQRT((SELECT m2 FROM mm))), 6) AS cos_to_centroid "
            "FROM d ORDER BY vec_id"
        ),
        "cooccurrence_edges_suppliers": (
            _SUPPLIER_GRAPH_CTE + "SELECT src, dst FROM e ORDER BY src, dst"
        ),
        "triangle_count_suppliers": (
            _SUPPLIER_GRAPH_CTE
            + "SELECT "
            "(SELECT COUNT(DISTINCT v) FROM "
            " (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)"
            ")::BIGINT AS n_nodes, "
            "(SELECT COUNT(*) FROM e)::BIGINT AS n_edges, "
            "(SELECT COUNT(*) FROM e e1 "
            " JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst "
            " JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst"
            ")::BIGINT AS n_triangles"
        ),
        "pagerank_suppliers": (
            _SUPPLIER_GRAPH_CTE
            + ", eb AS (SELECT src, dst FROM e "
            "UNION ALL SELECT dst AS src, src AS dst FROM e), "
            "deg AS (SELECT src AS node, COUNT(*) AS d "
            "FROM eb GROUP BY src), "
            "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM deg), "
            "r0 AS (SELECT node, 1.0 / (SELECT c FROM nn) AS r "
            "FROM deg), "
            "r1 AS (SELECT eb.dst AS node, 0.15 / (SELECT c FROM nn) "
            "+ 0.85 * SUM(r0.r / deg.d) AS r FROM eb "
            "JOIN r0 ON eb.src = r0.node "
            "JOIN deg ON eb.src = deg.node GROUP BY eb.dst), "
            "r2 AS (SELECT eb.dst AS node, 0.15 / (SELECT c FROM nn) "
            "+ 0.85 * SUM(r1.r / deg.d) AS r FROM eb "
            "JOIN r1 ON eb.src = r1.node "
            "JOIN deg ON eb.src = deg.node GROUP BY eb.dst), "
            "r3 AS (SELECT eb.dst AS node, 0.15 / (SELECT c FROM nn) "
            "+ 0.85 * SUM(r2.r / deg.d) AS r FROM eb "
            "JOIN r2 ON eb.src = r2.node "
            "JOIN deg ON eb.src = deg.node GROUP BY eb.dst) "
            "SELECT node, ROUND(r, 6) AS pr FROM r3 ORDER BY node"
        ),
        # rows-only (no SQL equivalent by design): flagship_webpages
        # (derived table), approx_uniqueness_events /
        # approx_distinct_users_by_type (HLL sketches),
        # simhash_documents / embedding_lsh_pairs[_sketch] / knn_ivf_embeddings
        # (hash/ANN structures), winnow_fingerprints_documents (rolling
        # hash), drift_events_value / grouped_quantiles_events
        # (t-digest bins), semantic_dedup_embeddings (seeded k-means),
        # misra_gries_events_user (batch-boundary-dependent sketch),
        # compression_stats_documents (no SQL zlib),
        # multimodal_frame_sample (payload-derived),
        # pca_project_embeddings (no SQL eigendecomposition)
    }


# Closed-form oracle for the flagship CC suite: the webpages derivation
# is pure doc_id-residue arithmetic (webpages.make_webpages_arrow), and
# extract_text(html(text)) round-trips to 'Doc N' + whitespace-collapsed
# source text (escape→tag-strip→unescape is the identity on the body),
# so every rule's counts/verdicts reduce to SQL over `documents`.
# Table-level verdicts (quantile median, PSI drift) are reproduced with
# exact SQL statistics — both engines sit far from the thresholds, so
# the verdict columns agree deterministically.
# The webpages-derivation CTE body, shared by the flagship oracle and
# the per-shard verdict oracle (one source of truth for the dirt
# arithmetic).
_WEBPAGES_W_CTE = r"""w AS (
  SELECT
    doc_id,
    CASE
      WHEN doc_id % 100 = 7 THEN NULL
      WHEN doc_id % 100 = 53 THEN ''
      WHEN doc_id % 100 = 11 THEN 'not a url Doc ' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 100 IN (20, 21, 22) THEN
        'https://site' || CAST(GREATEST(doc_id - 1, 0) % 50 AS VARCHAR)
        || '.example.com/page/' || CAST(GREATEST(doc_id - 1, 0) AS VARCHAR)
      ELSE
        'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.com/page/' || CAST(doc_id AS VARCHAR)
    END AS url,
    CASE
      WHEN doc_id % 100 = 33 THEN NULL
      WHEN doc_id % 100 IN (41, 43) THEN
        TIMESTAMP '1999-06-15 00:00:00' + (doc_id % 86400) * INTERVAL 1 SECOND
      ELSE
        TIMESTAMP '2020-01-01 00:00:00'
        + ((doc_id * 7919) % (5 * 365 * 86400)) * INTERVAL 1 SECOND
    END AS warc_ts,
    CASE
      WHEN doc_id % 100 = 91 THEN NULL
      WHEN doc_id % 100 = 81 THEN 'xx'
      WHEN doc_id % 100 = 83 THEN 'english'
      ELSE lang
    END AS lang,
    CASE
      WHEN doc_id % 100 IN (61, 71) THEN ''
      ELSE trim('Doc ' || CAST(doc_id AS VARCHAR) || ' '
                || regexp_replace(trim(COALESCE(text, '')), '\s+', ' ', 'g'))
    END AS text
  FROM documents
)"""

_FLAGSHIP_ORACLE_SQL = (
    "WITH " + _WEBPAGES_W_CTE + r""",
iso AS (SELECT UNNEST(['aa','ab','af','am','ar','az','be','bg','bn','bs','ca','cs','cy','da','de','el','en','eo','es','et','eu','fa','fi','fr','ga','gl','gu','he','hi','hr','hu','hy','id','is','it','ja','ka','kk','km','kn','ko','ku','ky','la','lb','lo','lt','lv','mk','ml','mn','mr','ms','mt','my','ne','nl','no','pa','pl','ps','pt','ro','ru','sd','si','sk','sl','so','sq','sr','sv','sw','ta','te','th','tl','tr','uk','ur','uz','vi','xh','yi','zh','zu']) AS code),
corpus_langs AS (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL),
cur_bins AS (
  SELECT
    (CASE WHEN length(text) >= 100 THEN 1 ELSE 0 END
     + CASE WHEN length(text) >= 250 THEN 1 ELSE 0 END
     + CASE WHEN length(text) >= 400 THEN 1 ELSE 0 END
     + CASE WHEN length(text) >= 550 THEN 1 ELSE 0 END
     + CASE WHEN length(text) >= 700 THEN 1 ELSE 0 END) AS b
  FROM w WHERE text IS NOT NULL
),
base_bins AS (
  SELECT
    (CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END
     + CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END
     + CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END
     + CASE WHEN n_chars >= 550 THEN 1 ELSE 0 END
     + CASE WHEN n_chars >= 700 THEN 1 ELSE 0 END) AS b
  FROM documents WHERE n_chars IS NOT NULL
),
allb AS (SELECT UNNEST([0,1,2,3,4,5]) AS b),
cur_p AS (
  SELECT allb.b,
         GREATEST(COALESCE(cnt, 0)::DOUBLE / (SELECT COUNT(*) FROM cur_bins), 1e-6) AS p
  FROM allb LEFT JOIN (SELECT b, COUNT(*) AS cnt FROM cur_bins GROUP BY b) c USING (b)
),
base_p AS (
  SELECT allb.b,
         GREATEST(COALESCE(cnt, 0)::DOUBLE / (SELECT COUNT(*) FROM base_bins), 1e-6) AS p
  FROM allb LEFT JOIN (SELECT b, COUNT(*) AS cnt FROM base_bins GROUP BY b) c USING (b)
),
psi AS (
  SELECT SUM((c.pn - b.pn) * ln(c.pn / b.pn)) AS v
  FROM (SELECT b, p / SUM(p) OVER () AS pn FROM cur_p) c
  JOIN (SELECT b, p / SUM(p) OVER () AS pn FROM base_p) b USING (b)
),
med AS (SELECT median(length(text)) AS v FROM w WHERE text IS NOT NULL),
counts AS (
  SELECT
    (SELECT COUNT(*) FROM w WHERE url IS NULL)::BIGINT AS url_null,
    (SELECT COUNT(*) FROM w WHERE warc_ts IS NULL)::BIGINT AS ts_null,
    (SELECT COUNT(*) - COUNT(DISTINCT url) FROM w)::BIGINT AS url_dupfail,
    (SELECT COUNT(*) FROM w WHERE warc_ts IS NOT NULL AND
       (warc_ts < TIMESTAMP '2013-01-01 00:00:00'
        OR warc_ts > TIMESTAMP '2026-01-01 00:00:00'))::BIGINT AS ts_oow,
    (SELECT COUNT(*) FROM w WHERE url IS NOT NULL AND NOT
       regexp_matches(url, '^https?://[^\s/$.?#].[^\s]*$'))::BIGINT AS url_bad,
    (SELECT COUNT(*) FROM w WHERE lang IS NOT NULL AND
       lang NOT IN (SELECT code FROM iso))::BIGINT AS lang_bad,
    (SELECT COUNT(*) FROM w WHERE text = '')::BIGINT AS text_empty,
    (SELECT COUNT(*) FROM w WHERE lang IS NOT NULL AND
       lang NOT IN (SELECT lang FROM corpus_langs))::BIGINT AS lang_noref,
    (SELECT COUNT(*) FROM w)::BIGINT AS total
)
SELECT * FROM (
  SELECT 'url_complete' AS rule_name, 'completeness' AS rule_type,
         (1.0 - url_null::DOUBLE / total) >= 0.98 AS passed,
         url_null AS failed_count, total AS total_count,
         (total - url_null)::DOUBLE / total AS success_rate,
         'error' AS severity FROM counts
  UNION ALL
  SELECT 'warc_ts_complete', 'completeness',
         (1.0 - ts_null::DOUBLE / total) >= 0.98, ts_null, total,
         (total - ts_null)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'url_unique', 'uniqueness',
         (1.0 - url_dupfail::DOUBLE / total) >= 0.94, url_dupfail, total,
         (total - url_dupfail)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'warc_ts_in_crawl_window', 'range',
         (1.0 - ts_oow::DOUBLE / total) >= 0.96, ts_oow, total,
         (total - ts_oow)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'url_valid', 'pattern',
         (1.0 - url_bad::DOUBLE / total) >= 0.95, url_bad, total,
         (total - url_bad)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'lang_iso639', 'membership',
         (1.0 - lang_bad::DOUBLE / total) >= 0.95, lang_bad, total,
         (total - lang_bad)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'text_non_empty', 'non_empty',
         (1.0 - text_empty::DOUBLE / total) >= 0.97, text_empty, total,
         (total - text_empty)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'schema_conforms', 'schema', TRUE, 0::BIGINT, 6::BIGINT, 1.0, 'error'
  UNION ALL
  SELECT 'text_len_median', 'quantile',
         (SELECT v BETWEEN 10 AND 100000 FROM med),
         CASE WHEN (SELECT v BETWEEN 10 AND 100000 FROM med)
              THEN 0 ELSE 1 END::BIGINT,
         1::BIGINT,
         CASE WHEN (SELECT v BETWEEN 10 AND 100000 FROM med)
              THEN 1.0 ELSE 0.0 END,
         'error'
  UNION ALL
  SELECT 'lang_in_corpus', 'referential',
         (1.0 - lang_noref::DOUBLE / total) >= 0.95, lang_noref, total,
         (total - lang_noref)::DOUBLE / total, 'error' FROM counts
  UNION ALL
  SELECT 'text_len_drift', 'drift',
         (SELECT v <= 0.5 FROM psi),
         CASE WHEN (SELECT v <= 0.5 FROM psi) THEN 0 ELSE 1 END::BIGINT,
         1::BIGINT,
         CASE WHEN (SELECT v <= 0.5 FROM psi) THEN 1.0 ELSE 0.0 END,
         'error'
) ORDER BY rule_name
"""
)

_NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(t)-2),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, i::BIGINT AS intersection,
       sa.sz::BIGINT AS size_a, sb.sz::BIGINT AS size_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {threshold}
ORDER BY id_a, id_b
"""

_NEAR_DUP_DEDUP_SQL = (
    "WITH RECURSIVE pairs AS ("
    + _NGRAM_JACCARD_SQL.format(threshold=0.5)
    .replace("ORDER BY id_a, id_b", "")
    + "), edges AS ("
    "  SELECT id_a AS a, id_b AS b FROM pairs"
    "  UNION SELECT id_b, id_a FROM pairs"
    "), reach(src, dst) AS ("
    "  SELECT a, b FROM edges"
    "  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a"
    "), lbl AS ("
    "  SELECT src, LEAST(src, MIN(dst)) AS root FROM reach GROUP BY src"
    ") "
    "SELECT doc_id::BIGINT AS doc_id FROM documents "
    "WHERE doc_id NOT IN (SELECT src FROM lbl WHERE root < src) "
    "ORDER BY doc_id"
)

_CC_LABELS_SQL = (
    "WITH RECURSIVE pairs AS ("
    + _NGRAM_JACCARD_SQL.format(threshold=0.5)
    .replace("ORDER BY id_a, id_b", "")
    + "), edges AS ("
    "  SELECT id_a AS a, id_b AS b FROM pairs"
    "  UNION SELECT id_b, id_a FROM pairs"
    "), reach(src, dst) AS ("
    "  SELECT a, b FROM edges"
    "  UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a"
    ") "
    "SELECT src::BIGINT AS doc_id,"
    "       LEAST(src, MIN(dst))::BIGINT AS cluster_id "
    "FROM reach GROUP BY src ORDER BY doc_id"
)

_EN_STOP = "'the','a','of','and','to','in','is','it'"


def _lang_hits_sql(lang: str, words) -> str:
    inlist = ",".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(text, ' '), x -> x IN ({inlist})))"
        f"::BIGINT AS hits_{lang}"
    )


def _language_id_sql() -> str:
    from .text import LANG_PROFILES, LANGS

    hits = ", ".join(_lang_hits_sql(l, LANG_PROFILES[l]) for l in LANGS)
    # first-max in alphabetical order = numpy argmax tie-break
    others = {l: [o for o in LANGS if o != l and LANGS.index(o) > LANGS.index(l)] for l in LANGS}
    cases = []
    for l in LANGS[:-1]:
        rest = ", ".join(f"hits_{o}" for o in others[l])
        cases.append(f"WHEN hits_{l} >= GREATEST({rest}) THEN '{l}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{LANGS[-1]}' END"
    return (
        f"WITH h AS (SELECT doc_id, {hits} FROM documents) "
        f"SELECT *, {case} AS detected_lang FROM h ORDER BY doc_id"
    )


_LANGUAGE_ID_SQL = _language_id_sql()


# --------------------------------------------------------------------- #
# curation-tier oracle SQL                                              #
# --------------------------------------------------------------------- #

# Shared tokenization: single-space split, empty tokens dropped — the
# exact semantics of curation._token_frame.
_GOPHER_BASE = (
    "WITH base AS ("
    "  SELECT doc_id, coalesce(text, '') AS text,"
    "         list_filter(string_split(coalesce(text, ''), ' '),"
    "                     x -> x <> '') AS toks"
    "  FROM documents"
    "), t1 AS ("
    "  SELECT doc_id,"
    "         len(toks)::BIGINT AS n_tokens,"
    "         coalesce(list_sum(list_transform(toks, x -> len(x))), 0)::BIGINT"
    "           AS total_token_chars,"
    "         (len(text) - len(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))::BIGINT"
    "           AS n_symbol_chars"
    "  FROM base"
    "), sh AS ("
    "  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),"
    "         i -> toks[i] || ' ' || toks[i+1])) AS sh"
    "  FROM base"
    "), cnt AS ("
    "  SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY 1, 2"
    "), t2 AS ("
    "  SELECT doc_id, sum(c)::BIGINT AS n_2grams,"
    "         count(*)::BIGINT AS n_unique_2grams,"
    "         max(c)::BIGINT AS top_2gram_count"
    "  FROM cnt GROUP BY doc_id"
    "), g AS ("
    "  SELECT t1.doc_id, n_tokens, coalesce(n_2grams, 0) AS n_2grams,"
    "         coalesce(n_unique_2grams, 0) AS n_unique_2grams,"
    "         coalesce(top_2gram_count, 0) AS top_2gram_count,"
    "         total_token_chars, n_symbol_chars"
    "  FROM t1 LEFT JOIN t2 ON t1.doc_id = t2.doc_id"
    ") "
)

_GOPHER_STATS_SQL = _GOPHER_BASE + "SELECT * FROM g ORDER BY doc_id"

_GOPHER_FILTER_SQL = _GOPHER_BASE + (
    "SELECT doc_id FROM g"
    " WHERE n_tokens >= 5"
    "   AND top_2gram_count * 5 <= n_2grams"
    "   AND n_symbol_chars * 10 <= total_token_chars"
    "   AND 2 * n_tokens <= total_token_chars"
    "   AND total_token_chars <= 12 * n_tokens"
    " ORDER BY doc_id"
)

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\b555-[0-9]{4}\\b"
_PII_IP = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

_PII_REDACT_SQL = (
    "WITH injected AS ("
    "  SELECT doc_id, coalesce(text, '') || CASE"
    "    WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id ||"
    "         '@example.com for info'"
    "    WHEN doc_id % 11 = 0 THEN ' call 555-0142 or 555-9999 today'"
    "    WHEN doc_id % 13 = 0 THEN ' origin 10.0.0.1 and 192.168.1.77'"
    "    ELSE '' END AS t0"
    "  FROM documents"
    "), s1 AS ("
    f"  SELECT doc_id, len(regexp_extract_all(t0, '{_PII_EMAIL}'))::BIGINT"
    "     AS n_email,"
    f"    regexp_replace(t0, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1"
    "  FROM injected"
    "), s2 AS ("
    f"  SELECT doc_id, n_email, len(regexp_extract_all(t1, '{_PII_PHONE}'))::BIGINT"
    "     AS n_phone,"
    f"    regexp_replace(t1, '{_PII_PHONE}', '<PHONE>', 'g') AS t2"
    "  FROM s1"
    ") "
    f"SELECT doc_id, n_email, n_phone,"
    f"  len(regexp_extract_all(t2, '{_PII_IP}'))::BIGINT AS n_ip,"
    f"  regexp_replace(t2, '{_PII_IP}', '<IP>', 'g') AS redacted_text"
    " FROM s2 ORDER BY doc_id"
)

_DECONTAMINATE_SQL = (
    "WITH base AS ("
    "  SELECT doc_id,"
    "         list_filter(string_split(coalesce(text, ''), ' '),"
    "                     x -> x <> '') AS toks"
    "  FROM documents"
    "), sh AS ("
    "  SELECT DISTINCT doc_id,"
    "    unnest(list_transform(generate_series(1, len(toks) - 4),"
    "      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||"
    "           toks[i+3] || ' ' || toks[i+4])) AS sh"
    "  FROM base"
    "), bench AS ("
    "  SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0"
    "), hits AS ("
    "  SELECT s.doc_id, count(*)::BIGINT AS n_hits"
    "  FROM sh s JOIN bench b ON s.sh = b.sh GROUP BY 1"
    ") "
    "SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,"
    "       coalesce(h.n_hits, 0) > 0 AS is_contaminated"
    " FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"
    " ORDER BY d.doc_id"
)

_DOMAIN_SAMPLE_SQL = (
    "SELECT doc_id, source FROM documents"
    " WHERE (doc_id * 2654435761) % 1000 <"
    "       ((CAST(substr(source, 4) AS BIGINT) % 4) + 1) * 200"
    " ORDER BY doc_id"
)

_PACK_SHARDS_SQL = (
    "WITH n AS ("
    "  SELECT doc_id,"
    "    len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS n_tokens"
    "  FROM documents"
    ") "
    "SELECT doc_id, n_tokens,"
    "  ((SUM(n_tokens) OVER (ORDER BY doc_id"
    "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    "    - n_tokens) // 2048)::BIGINT AS shard_id"
    " FROM n ORDER BY doc_id"
)

# Middle CTEs shared by the fused-profile oracles: 5-gram
# decontamination hits + ordered PII counts.
_CURATION_CTES = (
    ", sh5 AS ("
    "  SELECT DISTINCT doc_id,"
    "    unnest(list_transform(generate_series(1, len(toks) - 4),"
    "      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||"
    "           toks[i+3] || ' ' || toks[i+4])) AS sh"
    "  FROM base"
    "), bench5 AS ("
    "  SELECT DISTINCT sh FROM sh5 WHERE doc_id % 97 = 0"
    "), hits5 AS ("
    "  SELECT s.doc_id, count(*)::BIGINT AS n_hits"
    "  FROM sh5 s JOIN bench5 b ON s.sh = b.sh GROUP BY 1"
    "), p1 AS ("
    f"  SELECT doc_id, len(regexp_extract_all(coalesce(text, ''), '{_PII_EMAIL}'))::BIGINT"
    "     AS n_email,"
    f"    regexp_replace(coalesce(text, ''), '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1"
    "  FROM documents"
    "), p2 AS ("
    f"  SELECT doc_id, n_email, len(regexp_extract_all(t1, '{_PII_PHONE}'))::BIGINT"
    "     AS n_phone,"
    f"    regexp_replace(t1, '{_PII_PHONE}', '<PHONE>', 'g') AS t2"
    "  FROM p1"
    "), pii AS ("
    f"  SELECT doc_id, n_email, n_phone,"
    f"    len(regexp_extract_all(t2, '{_PII_IP}'))::BIGINT AS n_ip"
    "  FROM p2"
    ") "
)

_CURATION_PROFILE_SQL = _GOPHER_BASE + _CURATION_CTES + (
    "SELECT g.*, pii.n_email, pii.n_phone, pii.n_ip,"
    "       coalesce(h.n_hits, 0)::BIGINT AS n_hits,"
    "       coalesce(h.n_hits, 0) > 0 AS is_contaminated"
    " FROM g JOIN pii ON g.doc_id = pii.doc_id"
    " LEFT JOIN hits5 h ON g.doc_id = h.doc_id"
    " ORDER BY g.doc_id"
)

# Everything-in-one-pass profile: text tier (quality counters +
# language ID + md5 fingerprint) ∪ curation tier (Gopher + PII +
# decontamination). Column set = union of the per-op oracles, each
# column exactly once (n_tokens comes from the Gopher CTE; the
# quality-stats formula is identical).
_FULL_PROFILE_SQL = _GOPHER_BASE + _CURATION_CTES + (
    ", q AS ("
    "  SELECT doc_id, length(text)::BIGINT AS n_chars,"
    f"  len(list_filter(string_split(text, ' '), x -> x IN ({_EN_STOP})))"
    "::BIGINT AS n_stopwords,"
    "  len(list_distinct(list_filter(string_split(text, ' '),"
    " x -> x <> '')))::BIGINT AS n_unique_tokens"
    "  FROM documents"
    "), l AS ("
    + _LANGUAGE_ID_SQL.replace(" ORDER BY doc_id", "")
    + "), f AS ("
    "  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ',"
    " 'g'))) AS fingerprint FROM documents"
    ") "
    "SELECT q.doc_id, q.n_chars, q.n_stopwords, q.n_unique_tokens,"
    " l.* EXCLUDE (doc_id), f.fingerprint,"
    " g.* EXCLUDE (doc_id),"
    " pii.n_email, pii.n_phone, pii.n_ip,"
    " coalesce(h.n_hits, 0)::BIGINT AS n_hits,"
    " coalesce(h.n_hits, 0) > 0 AS is_contaminated"
    " FROM q JOIN l ON q.doc_id = l.doc_id"
    " JOIN f ON q.doc_id = f.doc_id"
    " JOIN g ON q.doc_id = g.doc_id"
    " JOIN pii ON q.doc_id = pii.doc_id"
    " LEFT JOIN hits5 h ON q.doc_id = h.doc_id"
    " ORDER BY q.doc_id"
)

_REPETITION_RULE_SQL = _GOPHER_BASE + (
    "SELECT COUNT(*)::BIGINT AS total_count,"
    " COUNT(*) FILTER (WHERE NOT ("
    "   n_tokens >= 30"
    "   AND top_2gram_count * 5 <= n_2grams"
    "   AND n_symbol_chars * 10 <= total_token_chars"
    "   AND 2 * n_tokens <= total_token_chars"
    "   AND total_token_chars <= 12 * n_tokens"
    " ))::BIGINT AS failed_count FROM g"
)

_PII_RULE_SQL = (
    "SELECT COUNT(*)::BIGINT AS total_count,"
    " COUNT(*) FILTER (WHERE"
    f"   regexp_matches(text, '{_PII_EMAIL}')"
    f"   OR regexp_matches(text, '{_PII_PHONE}')"
    f"   OR regexp_matches(text, '{_PII_IP}')"
    " )::BIGINT AS failed_count FROM documents"
)

_URL_BASE = (
    "WITH u AS ("
    "  SELECT doc_id,"
    "    'https://WWW.Host' || (doc_id % 7) || '.Example.COM/page/' ||"
    "    (doc_id % 13) ||"
    "    CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END ||"
    "    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&sid=' || doc_id"
    "         ELSE '' END ||"
    "    CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url"
    "  FROM documents"
    "), n AS ("
    "  SELECT doc_id,"
    "    regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "      lower(url),"
    "      '^[a-z][a-z0-9+.-]*://', ''),"
    "      '^www\\.', ''),"
    "      '[?#].*$', ''),"
    "      '/+$', '') AS norm_url"
    "  FROM u"
    ") "
)

_URL_PROFILE_SQL = _URL_BASE + (
    "SELECT doc_id, norm_url,"
    " regexp_replace(norm_url, '/.*$', '') AS domain"
    " FROM n ORDER BY doc_id"
)

_URL_DEDUP_SQL = _URL_BASE + (
    "SELECT norm_url, min(doc_id)::BIGINT AS doc_id"
    " FROM n GROUP BY norm_url ORDER BY norm_url"
)

_DOMAIN_COUNTS_SQL = _URL_BASE + (
    "SELECT regexp_replace(norm_url, '/.*$', '') AS domain,"
    " count(*)::BIGINT AS n_pages"
    " FROM n GROUP BY 1 ORDER BY 1"
)

_URL_DEEP_BASE = (
    "WITH u AS ("
    "  SELECT doc_id,"
    "    CASE WHEN doc_id % 17 = 0 THEN 'https://Sub.Host'"
    "         ELSE 'https://Host' END ||"
    "    (doc_id % 7) || '.Example.COM/page/' || doc_id AS url"
    "  FROM documents"
    "), n AS ("
    "  SELECT doc_id, url,"
    "    regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "      lower(url),"
    "      '^[a-z][a-z0-9+.-]*://', ''),"
    "      '^www\\.', ''),"
    "      '[?#].*$', ''),"
    "      '/+$', '') AS norm_url"
    "  FROM u"
    "), h AS ("
    "  SELECT doc_id, url,"
    "    regexp_replace(norm_url, '/.*$', '') AS host"
    "  FROM n"
    ") "
)

_URL_BLOCKLIST_SQL = _URL_DEEP_BASE + (
    "SELECT doc_id, url FROM h"
    " WHERE NOT EXISTS ("
    "   SELECT 1 FROM (VALUES ('host3.example.com'), ('bad.org')) b(d)"
    "   WHERE h.host = b.d OR h.host LIKE '%.' || b.d)"
    " ORDER BY doc_id"
)

_CAP_PER_DOMAIN_SQL = _URL_BASE + (
    "SELECT regexp_replace(norm_url, '/.*$', '') AS domain,"
    " doc_id FROM n"
    " QUALIFY row_number() OVER ("
    "   PARTITION BY domain ORDER BY doc_id) <= 40"
    " ORDER BY domain, doc_id"
)

_LINE_FILTER_SQL = (
    "WITH t AS ("
    "  SELECT doc_id,"
    "    string_split(replace(coalesce(text, ''), 'line', chr(10)),"
    "                 chr(10)) AS ls"
    "  FROM documents"
    "), f AS ("
    "  SELECT doc_id, ls,"
    "    list_filter(ls, x -> len(x) >= 12 AND"
    "      length(regexp_replace(x, '[^A-Za-z]', '', 'g')) * 100"
    "        >= 55 * len(x)) AS ks"
    "  FROM t"
    ") "
    "SELECT doc_id, array_to_string(ks, chr(10)) AS text,"
    " len(ls)::BIGINT AS n_lines, len(ks)::BIGINT AS n_lines_kept"
    " FROM f ORDER BY doc_id"
)

_TOKEN_DF_SQL = (
    "WITH tok AS ("
    "  SELECT DISTINCT doc_id,"
    "    unnest(list_filter(string_split(coalesce(text, ''), ' '),"
    "                       x -> x <> '')) AS token"
    "  FROM documents"
    ") "
    "SELECT token, count(*)::BIGINT AS df FROM tok"
    " GROUP BY token HAVING count(*) >= 2 ORDER BY token"
)

_TFIDF_SQL = (
    "WITH toks AS ("
    "  SELECT doc_id,"
    "    unnest(list_filter(string_split(coalesce(text, ''), ' '),"
    "                       x -> x <> '')) AS token"
    "  FROM documents"
    "), tf AS ("
    "  SELECT doc_id, token, COUNT(*)::BIGINT AS tf"
    "  FROM toks GROUP BY doc_id, token"
    "), df AS ("
    "  SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS df"
    "  FROM toks GROUP BY token"
    "), n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents"
    "), scored AS ("
    "  SELECT tf.doc_id, tf.token, tf.tf, df.df,"
    "         ROUND(tf.tf * LN((n.n + 1.0) / (df.df + 1.0)), 6) AS score"
    "  FROM tf JOIN df USING (token) CROSS JOIN n"
    "), ranked AS ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id"
    "    ORDER BY score DESC, token) AS rn"
    "  FROM scored"
    ") "
    "SELECT doc_id, token, tf, df, score FROM ranked WHERE rn <= 5"
    " ORDER BY doc_id, score DESC, token"
)

# partition p = rank // ceil(n / 8) over doc_id order — the exact
# _partitioned_documents layout
_TRANSFORM_RUNNER_SQL = _GOPHER_BASE.replace("WITH base", "WITH ranked AS ("
    "  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,"
    "         count(*) OVER () AS cnt FROM documents"
    "), base") + (
    "SELECT ((r.rn - 1) // ((r.cnt + 7) // 8))::BIGINT AS partition_id,"
    " count(*)::BIGINT AS rows_in,"
    " COUNT(*) FILTER (WHERE"
    "   g.n_tokens >= 5"
    "   AND g.top_2gram_count * 5 <= g.n_2grams"
    "   AND g.n_symbol_chars * 10 <= g.total_token_chars"
    "   AND 2 * g.n_tokens <= g.total_token_chars"
    "   AND g.total_token_chars <= 12 * g.n_tokens"
    " )::BIGINT AS rows_out"
    " FROM g JOIN ranked r ON g.doc_id = r.doc_id"
    " GROUP BY 1 ORDER BY 1"
)

_KNN_JOIN_SQL = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
    "           FROM embeddings WHERE vec_id % 29 = 0), "
    "c AS (SELECT vec_id, embedding FROM embeddings "
    "      WHERE vec_id % 29 != 0), "
    "s AS (SELECT q.query_id, c.vec_id AS neighbor_id, "
    "             list_cosine_similarity(q.qe, c.embedding) AS cos "
    "      FROM q, c), "
    "r AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
    "        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC"
    "      ) AS rank FROM s) "
    "SELECT query_id, rank::BIGINT AS rank, neighbor_id "
    "FROM r WHERE rank <= 5 ORDER BY query_id, rank"
)

_KS_EVENTS_SPLIT_SQL = (
    # exact two-sample KS: cumulative per-side counts over the
    # sorted distinct values; int/int -> DOUBLE divisions match
    # the engine bit-exactly
    "WITH a AS (SELECT value AS v FROM events "
    "WHERE event_id % 2 = 0 AND value IS NOT NULL), "
    "b AS (SELECT value AS v FROM events "
    "WHERE event_id % 2 = 1 AND value IS NOT NULL), "
    "u AS (SELECT v, "
    "COUNT(*) FILTER (WHERE side = 0) AS ca, "
    "COUNT(*) FILTER (WHERE side = 1) AS cb "
    "FROM (SELECT v, 0 AS side FROM a "
    "UNION ALL SELECT v, 1 AS side FROM b) GROUP BY v), "
    "c AS (SELECT SUM(ca) OVER (ORDER BY v) AS cca, "
    "SUM(cb) OVER (ORDER BY v) AS ccb FROM u) "
    "SELECT (SELECT COUNT(*) FROM a)::BIGINT AS n_base, "
    "(SELECT COUNT(*) FROM b)::BIGINT AS n_current, "
    "ROUND(MAX(ABS(cca::DOUBLE / (SELECT COUNT(*) FROM a) "
    "- ccb::DOUBLE / (SELECT COUNT(*) FROM b))), 6) AS ks_value "
    "FROM c"
)

_RATIO_TO_REPORT_SQL = (
    "SELECT event_id, event_type, value, "
    "ROUND(value / SUM(value) OVER (PARTITION BY event_type), 6) "
    "AS value_share FROM events ORDER BY event_id"
)

_INCREMENTAL_DEDUP_SQL = (
    "WITH a AS (SELECT o_custkey k FROM orders WHERE "
    "o_orderkey % 4 = 0 AND o_custkey IS NOT NULL), "
    "b AS (SELECT o_orderkey, o_custkey FROM orders "
    "WHERE o_orderkey % 4 = 1), "
    "c AS (SELECT o_orderkey, o_custkey FROM orders "
    "WHERE o_orderkey % 4 = 2), "
    "ab AS (SELECT k FROM a UNION "
    "SELECT o_custkey FROM b WHERE o_custkey IS NOT NULL) "
    "SELECT "
    "(SELECT COUNT(DISTINCT k) FROM a)::BIGINT AS n_a_keys, "
    "(SELECT COUNT(*) FROM b WHERE o_custkey IS NULL OR "
    "NOT EXISTS (SELECT 1 FROM a WHERE a.k = b.o_custkey)"
    ")::BIGINT AS kept_b, "
    "(SELECT COUNT(*) FROM ab)::BIGINT AS n_ab_keys, "
    "(SELECT COUNT(*) FROM c WHERE o_custkey IS NULL OR "
    "NOT EXISTS (SELECT 1 FROM ab WHERE ab.k = c.o_custkey)"
    ")::BIGINT AS kept_c"
)

_UNIGRAM_LOGPROB_SQL = (
    "WITH tok AS (SELECT doc_id, unnest(list_filter("
    "string_split(text, ' '), x -> x <> '')) AS t FROM documents), "
    "freq AS (SELECT t, COUNT(*)::DOUBLE AS c FROM tok GROUP BY t), "
    "tot AS (SELECT SUM(c) AS s FROM freq), "
    "per_doc AS (SELECT tok.doc_id, COUNT(*)::BIGINT AS n_tokens, "
    "ROUND(SUM(LN(c / s)) / COUNT(*), 6) AS logprob_mean "
    "FROM tok JOIN freq USING (t) CROSS JOIN tot "
    "GROUP BY tok.doc_id) "
    "SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens, "
    "p.logprob_mean FROM documents d "
    "LEFT JOIN per_doc p USING (doc_id) ORDER BY d.doc_id"
)

_BIGRAM_LOGPROB_SQL = (
    "WITH tok AS (SELECT doc_id, unnest(ts) AS t, "
    "generate_subscripts(ts, 1) AS i FROM ("
    "SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents)), "
    "big AS (SELECT a.doc_id, a.t AS w1, b.t AS w2 FROM tok a "
    "JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
    "cnt AS (SELECT w1, w2, COUNT(*)::DOUBLE AS c FROM big "
    "GROUP BY w1, w2), "
    "lc AS (SELECT w1, SUM(c) AS cl FROM cnt GROUP BY w1), "
    "per_doc AS (SELECT big.doc_id, COUNT(*)::BIGINT AS n_bigrams, "
    "ROUND(SUM(LN(c / cl)) / COUNT(*), 6) AS logprob_mean "
    "FROM big JOIN cnt USING (w1, w2) JOIN lc USING (w1) "
    "GROUP BY big.doc_id) "
    "SELECT d.doc_id, COALESCE(p.n_bigrams, 0) AS n_bigrams, "
    "p.logprob_mean FROM documents d "
    "LEFT JOIN per_doc p USING (doc_id) ORDER BY d.doc_id"
)

_SESSIONIZE_SQL = (
    "WITH e AS ("
    "  SELECT user_id, event_id, ts FROM events WHERE ts IS NOT NULL"
    "), l AS ("
    "  SELECT *, lag(ts) OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e"
    "), f AS ("
    "  SELECT *, CASE WHEN prev IS NULL"
    "    OR ts - prev > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS s FROM l"
    "), g AS ("
    "  SELECT *, SUM(s) OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id"
    "    ROWS UNBOUNDED PRECEDING) AS session_seq FROM f"
    ") "
    "SELECT user_id, session_seq::BIGINT AS session_seq,"
    " min(ts) AS session_start, max(ts) AS session_end,"
    " count(*)::BIGINT AS n_events"
    " FROM g GROUP BY 1, 2 ORDER BY 1, 2"
)

_GROUP_SAMPLE_SQL = (
    "SELECT source, doc_id FROM documents"
    " QUALIFY row_number() OVER ("
    "   PARTITION BY source"
    "   ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) <= 5"
    " ORDER BY source, doc_id"
)

_HOPPING_WINDOW_SQL = (
    "WITH e AS ("
    "  SELECT ts, value FROM events WHERE ts IS NOT NULL"
    "), w AS ("
    "  SELECT value, unnest(list_transform(generate_series(0, 3),"
    "    i -> time_bucket(INTERVAL 900 SECOND, ts)"
    "         - to_seconds(i * 900))) AS window_start"
    "  FROM e"
    ") "
    "SELECT window_start, count(*)::BIGINT AS n_events,"
    " ROUND(sum(value), 6) AS value_sum"
    " FROM w GROUP BY 1 ORDER BY 1"
)

_HOPPING_WINDOW_USER_SQL = (
    "WITH e AS ("
    "  SELECT user_id, ts, value FROM events WHERE ts IS NOT NULL"
    "), w AS ("
    "  SELECT user_id, value,"
    "    unnest(list_transform(generate_series(0, 3),"
    "    i -> time_bucket(INTERVAL 900 SECOND, ts)"
    "         - to_seconds(i * 900))) AS window_start"
    "  FROM e"
    ") "
    "SELECT user_id, window_start, count(*)::BIGINT AS n_events,"
    " ROUND(sum(value), 6) AS value_sum"
    " FROM w GROUP BY 1, 2 ORDER BY 1, 2"
)

# supplier co-occurrence graph: hyperedges (orders) -> distinct
# undirected src<dst edges (mirrors pipelines/graph.py)
_SUPPLIER_GRAPH_CTE = (
    "WITH su AS (SELECT DISTINCT l_orderkey AS g, l_suppkey AS it "
    "FROM lineitem), "
    "e AS (SELECT a.it AS src, b.it AS dst FROM su a "
    "JOIN su b ON a.g = b.g AND a.it < b.it GROUP BY 1, 2) "
)
