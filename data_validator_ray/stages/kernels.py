"""Built-in check kernels.

Reference-parity kernels (semantics pinned to the DuckDB engine, the
reference's canonical oracle — SURVEY.md §2.2):

* ``completeness`` — failing row: column IS NULL
  (``duckdb_engine.py:82-89``)
* ``uniqueness``  — failed = total − COUNT(DISTINCT col); DuckDB's
  COUNT(DISTINCT) excludes NULLs so every NULL row fails
  (``duckdb_engine.py:91-99``); exact tier shuffles, approx tier = HLL
* ``range``       — failing row: col < min OR col > max; NULLs never
  fail (SQL three-valued logic, ``duckdb_engine.py:101-110``)
* ``pattern``     — failing row: NOT regexp_matches(col, pat), search
  (unanchored) semantics; NULLs never fail (``duckdb_engine.py:112-120``)
* ``custom``      — DSL predicate; failed = rows where predicate TRUE
  (DuckDB ``SELECT COUNT(*) WHERE`` convention,
  ``duckdb_engine.py:122-128``)

Net-new kernels required by the north rule: ``membership`` (fast-path
IN-set check, e.g. lang ∈ ISO-639), ``non_empty``, ``schema``
(declared-vs-actual type conformance), ``referential`` (FK ⊆ broadcast
key set), ``quantile`` (t-digest), ``drift`` (KS/PSI vs baseline
snapshot — see stages/drift.py).

Every kernel's ``partial`` is a vectorized Arrow computation; no Python
row loops anywhere.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ValidationRule
from ..functions.expr import (
    compile_predicate,
    parse_aggregate_query,
    predicate_true_mask,
)
from ..functions.sketches import (
    BloomFilter,
    HyperLogLog,
    TDigest,
    combined_hash64,
    hash64,
)
from .registry import CheckKernel, register_check


def _sum_mask(mask) -> int:
    s = pc.sum(mask)
    return int(s.as_py() or 0)


def _scalar_minmax(col) -> "tuple[Any, Any]":
    mm = pc.min_max(col)
    return mm["min"].as_py(), mm["max"].as_py()


@register_check("completeness")
class CompletenessKernel(CheckKernel):
    """Failing row: column IS NULL. Null-rate column stat falls out free."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()

    def mask_failing(self, batch: pa.Table):
        return pc.is_null(batch[self.column])

    def mask_keep(self, batch: pa.Table):
        return pc.is_valid(batch[self.column])


@register_check("range")
class RangeKernel(CheckKernel):
    """Failing row: col < min OR col > max (NULL → never fails).

    Emits the column's min/max in partials — the free column stats the
    north rule asks for. ``min_value`` / ``max_value`` accept numbers or
    ISO timestamp strings (for ``warc_ts``-style rules).
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        params = rule.parameters
        if "min_value" not in params or "max_value" not in params:
            raise ValueError(
                "Range rule requires column name and min_value/max_value parameters"
            )
        self.min_value = self._coerce(params["min_value"])
        self.max_value = self._coerce(params["max_value"])

    @staticmethod
    def _coerce(v):
        if isinstance(v, str):
            from datetime import datetime

            try:
                return datetime.fromisoformat(v)
            except ValueError:
                return v
        return v

    def mask_failing(self, batch: pa.Table):
        col = batch[self.column]
        bad = pc.or_(pc.less(col, self.min_value), pc.greater(col, self.max_value))
        return pc.fill_null(bad, False)

    def mask_keep(self, batch: pa.Table):
        col = batch[self.column]
        ok = pc.and_(
            pc.greater_equal(col, self.min_value), pc.less_equal(col, self.max_value)
        )
        return pc.fill_null(ok, False)  # filter mode drops NULLs (reference F2)

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        p = super().partial(batch)
        lo, hi = _scalar_minmax(batch[self.column])
        p["min"], p["max"] = lo, hi
        return p

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        out = super().combine(partials)
        mins = [p["min"] for p in partials if p.get("min") is not None]
        maxs = [p["max"] for p in partials if p.get("max") is not None]
        out["min"] = min(mins) if mins else None
        out["max"] = max(maxs) if maxs else None
        return out


@register_check("pattern")
class PatternKernel(CheckKernel):
    """Failing row: NOT regex-search(col, pattern); NULL never fails.

    Arrow's RE2 matches DuckDB's RE2 (both ``regexp_matches`` are
    unanchored search), keeping oracle parity.
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        if "pattern" not in rule.parameters:
            raise ValueError("Pattern rule requires column name and pattern parameter")
        self.pattern = rule.parameters["pattern"]

    def mask_failing(self, batch: pa.Table):
        ok = pc.match_substring_regex(batch[self.column], self.pattern)
        return pc.fill_null(pc.invert(ok), False)

    def mask_keep(self, batch: pa.Table):
        ok = pc.match_substring_regex(batch[self.column], self.pattern)
        return pc.fill_null(ok, False)  # filter mode drops NULLs (reference F3)


@register_check("json_validity")
class JsonValidityKernel(CheckKernel):
    """Failing row: col IS NOT NULL and is not well-formed JSON —
    the semi-structured-payload conformance check (event ``props``,
    API response bodies). NULLs never fail (pair with completeness).

    Vectorized via polars' Rust JSON path engine:
    ``json_path_match('$')`` returns NULL exactly for unparseable
    documents. Validity is STRICT RFC 8259 (serde_json); DuckDB's
    ``json_valid`` additionally accepts yyjson extensions (bare
    nan/inf, trailing commas) — a documented divergence pinned by
    test; both engines agree on every conforming/garbled doc. No
    Python row loop."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()

    def _valid_mask(self, batch: pa.Table) -> np.ndarray:
        import polars as pl

        col = batch[self.column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(col)
        # json_path_match('$') can't distinguish a parsed JSON null
        # root from an unparseable doc (both yield NULL) — the `null`
        # literal is valid JSON, so accept it explicitly
        valid = s.str.json_path_match("$").is_not_null() | (
            s.str.strip_chars() == "null"
        )
        return valid.fill_null(False).to_numpy()

    def mask_failing(self, batch: pa.Table):
        col = batch[self.column]
        notnull = pc.is_valid(col)
        return pc.and_(pa.array(~self._valid_mask(batch)), notnull)

    def mask_keep(self, batch: pa.Table):
        # filter mode drops NULLs (the reference's pattern-filter
        # asymmetry, F3)
        return pa.array(self._valid_mask(batch))


@register_check("membership")
class MembershipKernel(CheckKernel):
    """Failing row: col NOT IN allowed values (NULL never fails).

    Net-new fast path for set membership (e.g. ``lang`` ∈ ISO-639-1)
    where the reference would force a regex (SURVEY.md §2.2 R4 note).
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        values = rule.parameters.get("values")
        if not values:
            raise ValueError("Membership rule requires a 'values' parameter")
        self.value_set = pa.array(values)

    def mask_failing(self, batch: pa.Table):
        col = batch[self.column]
        bad = pc.invert(pc.is_in(col, value_set=self.value_set))
        return pc.and_(pc.fill_null(bad, False), pc.is_valid(col))

    def mask_keep(self, batch: pa.Table):
        return pc.fill_null(pc.is_in(batch[self.column], value_set=self.value_set), False)


@register_check("non_empty")
class NonEmptyKernel(CheckKernel):
    """Failing row: col == '' (NULL handled by a completeness rule)."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()

    def mask_failing(self, batch: pa.Table):
        return pc.fill_null(pc.equal(batch[self.column], ""), False)

    def mask_keep(self, batch: pa.Table):
        return pc.fill_null(pc.not_equal(batch[self.column], ""), False)


@register_check("custom")
class CustomKernel(CheckKernel):
    """DSL predicate compiled once to Arrow kernels.

    Validation mode: failed = rows where predicate TRUE (DuckDB count
    convention). Filter mode: keep = rows where predicate TRUE — the
    reference's asymmetric semantics (``duckdb_engine.py:206-212``
    treats the expression as the keep-side WHERE clause) preserved.
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        if not rule.expression:
            raise ValueError("Custom rule requires an expression")
        # grouped-aggregate form (SELECT <agg> ... HAVING <agg-pred>) —
        # the reference's own sample config uses it; runs as mergeable
        # aggregate partials in the fused pass (see AggregateQuery)
        self.agg_query = parse_aggregate_query(rule.expression)
        self.evaluator = (
            None if self.agg_query else compile_predicate(rule.expression)
        )

    def mask_failing(self, batch: pa.Table):
        if self.agg_query:
            return None  # table-level verdict; no per-row mask exists
        return predicate_true_mask(self.evaluator, batch)

    def mask_keep(self, batch: pa.Table):
        if self.agg_query:
            return None  # aggregate rules filter nothing (reference F5)
        return predicate_true_mask(self.evaluator, batch)

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        if not self.agg_query:
            return super().partial(batch)
        p = self.agg_query.partial(batch)
        p["total"] = batch.num_rows
        p["failed"] = 0
        return p

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        if not self.agg_query:
            return super().combine(partials)
        total = sum(p.pop("total") for p in partials)
        for p in partials:
            p.pop("failed", None)
        failed, agg_values = self.agg_query.evaluate(
            self.agg_query.combine(partials)
        )
        out: Dict[str, Any] = {"total": total, "failed": failed}
        out.update(
            (k, v)
            for k, v in agg_values.items()
            if isinstance(v, (int, float, str, bool)) or v is None
        )
        return out


@register_check("uniqueness")
class UniquenessKernel(CheckKernel):
    """failed = total − COUNT(DISTINCT col), NULLs excluded from the
    distinct count (DuckDB semantics — so NULL rows count as failed).

    Two tiers (SURVEY.md §7 hard parts):

    * exact (default): global ``groupby(col)`` distinct count — an
      all-to-all shuffle, run as a separate Dataset stage by the
      validator (``needs_shuffle``);
    * approx (``parameters.approx: true``): HyperLogLog partials inside
      the fused pass — no shuffle, mergeable, ~0.8% error at p=14; the
      scale tier for 10^12-row tables.
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        multi = rule.parameters.get("columns")
        if multi:
            # composite-key tier (deequ hasUniqueness on column lists):
            # the distinct unit is the TUPLE; rows with a NULL in any
            # key column are excluded from the distinct count (and so
            # count as failed), matching the single-column convention
            self.columns = [str(c) for c in multi]
            self.column = self.columns[0]
        else:
            self.column = self._require_column()
            self.columns = [self.column]
        self.approx = bool(rule.parameters.get("approx", False))
        self.hll_p = int(rule.parameters.get("hll_p", 14))
        self.needs_shuffle = not self.approx

    def _null_mask(self, batch: pa.Table):
        m = pc.is_null(batch[self.columns[0]])
        for c in self.columns[1:]:
            m = pc.or_(m, pc.is_null(batch[c]))
        return m

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        n_null = _sum_mask(self._null_mask(batch))
        out: Dict[str, Any] = {"total": batch.num_rows, "failed": 0, "nulls": n_null}
        if self.approx:
            hll = HyperLogLog(self.hll_p)
            if len(self.columns) == 1:
                valid = batch[self.column].drop_null()
                if len(valid):
                    hll.add_hashes(hash64(valid))
            else:
                t = batch.filter(pc.invert(self._null_mask(batch)))
                if t.num_rows:
                    hll.add_hashes(combined_hash64(t, self.columns))
            out["hll"] = hll.to_bytes()
        return out

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        total = sum(p["total"] for p in partials)
        nulls = sum(p.get("nulls", 0) for p in partials)
        if self.approx:
            hll = HyperLogLog(self.hll_p)
            for p in partials:
                if "hll" in p:
                    hll = hll.merge(HyperLogLog.from_bytes(p["hll"]))
            distinct = int(round(hll.estimate()))
            distinct = min(distinct, total - nulls)
            return {"total": total, "failed": total - distinct,
                    "distinct_estimate": distinct}
        # exact tier: the validator fills in the distinct count from the
        # shuffle stage; partials only carry totals
        return {"total": total, "failed": 0, "nulls": nulls}

    # mask_failing (per-row duplicate flags) requires global state; the
    # validator emits uniqueness violation rows from the shuffle stage.


@register_check("referential")
class ReferentialKernel(CheckKernel):
    """Failing row: FK NOT NULL and not present in the referenced key set.

    The referenced keys are distilled distributedly — per-block
    ``pc.unique`` partials union-merged into one Arrow array (exact
    tier), or per-block partial Bloom filters OR-reduced into ~2 MB of
    registers (scale tier, ``parameters.approx: true``) — and broadcast
    via ``ray.put``: a semi-join without a shuffle (SURVEY.md §2.6 C7);
    the driver never materializes per-row Python keys. NULL FKs never
    fail (SQL ``NOT IN`` semantics); pair with a completeness rule.

    Parameters: ``ref_table``/``ref_path`` + ``ref_column``; the
    validator resolves them to a key set before the fused pass via
    :meth:`prepare`. COMPOSITE foreign keys use ``columns: [c1, c2…]``
    + ``ref_columns: [r1, r2…]`` instead: the referenced side distils
    to 16-byte (h1, h2) double-hash tuple identities (the exact-
    uniqueness convention — collision-checked, treated as exact), so
    strings never reach the driver and the broadcast is 16 bytes per
    distinct referenced tuple; rows with a NULL in ANY key component
    are never checked (SQL composite NOT IN three-valued logic).
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        p = rule.parameters
        multi = p.get("columns")
        ref_multi = p.get("ref_columns")
        if multi or ref_multi:
            if not multi or not ref_multi or len(multi) != len(ref_multi):
                raise ValueError(
                    "Composite referential rule requires columns and "
                    "ref_columns parameters of equal length"
                )
            self.columns = [str(c) for c in multi]
            self.ref_columns = [str(c) for c in ref_multi]
            self.column = self.columns[0]
        else:
            self.columns = None
            self.ref_columns = None
            self.column = self._require_column()
            if not p.get("ref_column"):
                raise ValueError(
                    "Referential rule requires ref_table/ref_path and "
                    "ref_column parameters"
                )
        if not (p.get("ref_table") or p.get("ref_path")):
            raise ValueError(
                "Referential rule requires ref_table/ref_path and ref_column parameters"
            )
        self.approx = bool(p.get("approx", False))
        self._keys_ref = None  # ray.ObjectRef set in prepare()
        self._local_keys = None

    def prepare(self, ctx: Dict[str, Any]) -> None:
        """ctx['resolve_ref'](rule) → pa.Array of distinct keys or BloomFilter."""
        resolve = ctx.get("resolve_ref")
        if resolve is None:
            raise ValueError("Referential rule requires a reference resolver")
        keys = resolve(self.rule)
        import ray

        if self.approx and not isinstance(keys, BloomFilter):
            from ..functions.sketches import HashPairSet

            bloom = BloomFilter()
            if isinstance(keys, HashPairSet):
                bloom.add_hashes(keys.h1.astype(np.uint64))
            else:
                bloom.add_hashes(hash64(keys))
            keys = bloom
        self._keys_ref = ray.put(keys)

    def _keys(self):
        if self._local_keys is None:
            import ray

            self._local_keys = ray.get(self._keys_ref)
        return self._local_keys

    def mask_failing(self, batch: pa.Table):
        keys = self._keys()
        if self.columns is not None:
            valid = pc.is_valid(batch[self.columns[0]])
            for c in self.columns[1:]:
                valid = pc.and_(valid, pc.is_valid(batch[c]))
            # canonical key domain (int 1 == float 1.0, SQL equality)
            # then int64 view: HashPairSet stores int64 (Arrow exchange
            # dtype); bloom reinterprets the same bits as uint64
            from ..functions.sketches import canonical_key_table

            canon = canonical_key_table(batch, self.columns)
            h1 = combined_hash64(canon, self.columns, seed=0).astype(np.int64)
            if isinstance(keys, BloomFilter):
                present = keys.contains_hashes(h1)
            else:
                h2 = combined_hash64(canon, self.columns, seed=1).astype(np.int64)
                present = keys.contains(h1, h2)
            return pc.and_(pa.array(~present), valid)
        col = batch[self.column]
        if isinstance(keys, BloomFilter):
            valid = pc.is_valid(col)
            present = keys.contains_hashes(hash64(col))
            miss = pa.array(~present)
            return pc.and_(miss, valid)
        member = pc.is_in(col, value_set=keys)
        return pc.and_(pc.invert(member), pc.is_valid(col))

    def mask_keep(self, batch: pa.Table):
        return pc.invert(self.mask_failing(batch))


@register_check("rowcount")
class RowCountKernel(CheckKernel):
    """Table-size bound check (the deequ ``hasSize`` analog; net-new vs
    the reference): pass iff the table's row count lies within
    ``[min_rows, max_rows]``, and/or within ``tolerance_pct`` percent
    of a baseline table's count (``parameters.baseline`` — a Parquet
    path counted via dataset metadata, never scanned). The classic
    volume-anomaly alarm: an upstream crawler that silently shipped
    half a partition fails here before any per-row rule runs.

    total=1, failed∈{0,1} (the table-level verdict convention);
    ``row_count`` (and ``baseline_count`` when used) land in result
    metadata."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        p = rule.parameters
        self.min_rows = p.get("min_rows")
        self.max_rows = p.get("max_rows")
        self.baseline = p.get("baseline")
        self.tolerance_pct = p.get("tolerance_pct")
        if self.min_rows is None and self.max_rows is None and not self.baseline:
            raise ValueError(
                "Rowcount rule requires min_rows/max_rows or a baseline"
            )
        if self.baseline and self.tolerance_pct is None:
            raise ValueError("Rowcount baseline requires tolerance_pct")
        self._baseline_count: Optional[int] = None

    def prepare(self, ctx: Dict[str, Any]) -> None:
        if not self.baseline:
            return
        from ..pipelines.dedup import _as_dataset

        # Dataset.count() on Parquet resolves from file metadata —
        # no column data is read
        self._baseline_count = int(_as_dataset(self.baseline).count())

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        return {"total": batch.num_rows, "failed": 0}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        n = sum(p["total"] for p in partials)
        ok = True
        if self.min_rows is not None and n < int(self.min_rows):
            ok = False
        if self.max_rows is not None and n > int(self.max_rows):
            ok = False
        out: Dict[str, Any] = {"row_count": n}
        if self._baseline_count is not None:
            b = self._baseline_count
            out["baseline_count"] = b
            lo = b * (1 - float(self.tolerance_pct) / 100.0)
            hi = b * (1 + float(self.tolerance_pct) / 100.0)
            if not (lo <= n <= hi):
                ok = False
        out.update({"total": 1, "failed": 0 if ok else 1})
        return out


@register_check("schema")
class SchemaKernel(CheckKernel):
    """Type-conformance check: declared schema vs actual dataset schema
    (net-new vs the reference, required by the north rule — SURVEY.md
    §1.3). Table-level: total = number of declared columns, failed =
    missing or type-mismatched columns. ``parameters.columns`` maps
    column name → Arrow type string (as printed by ``pa.DataType``,
    e.g. ``int64``, ``string``, ``timestamp[us]``, ``binary``);
    ``parameters.strict: true`` additionally fails extra columns.
    """

    table_level = True

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        cols = rule.parameters.get("columns")
        if not cols:
            raise ValueError("Schema rule requires a 'columns' parameter")
        self.declared: Dict[str, str] = {str(k): str(v) for k, v in cols.items()}
        self.strict = bool(rule.parameters.get("strict", False))

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        return {"total": batch.num_rows, "failed": 0}

    def evaluate_table_level(self, ctx: Dict[str, Any]) -> Dict[str, Any]:
        actual: pa.Schema = ctx["schema"]
        actual_types = {f.name: str(f.type) for f in actual}
        mismatches: List[str] = []
        for name, type_str in self.declared.items():
            if name not in actual_types:
                mismatches.append(f"missing:{name}")
            elif actual_types[name] != type_str:
                mismatches.append(
                    f"type:{name}={actual_types[name]}!={type_str}"
                )
        total = len(self.declared)
        if self.strict:
            extras = [n for n in actual_types if n not in self.declared]
            mismatches.extend(f"extra:{n}" for n in extras)
            total += len(extras)
        return {"total": total, "failed": len(mismatches), "mismatches": mismatches}


@register_check("quantile")
class QuantileKernel(CheckKernel):
    """Table-level check: t-digest quantile of a numeric column must lie
    within [min_value, max_value]. total=1, failed∈{0,1} (like the
    reference's table-level placeholder checks,
    ``databricks_engine.py:279-302``, but computing something real).
    Partials are serialized t-digests merged in partition order for
    determinism."""

    table_level = True

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        p = rule.parameters
        self.q = float(p.get("q", 0.5))
        self.min_value = p.get("min_value")
        self.max_value = p.get("max_value")
        # transform: "length" sketches utf8_length(column) instead of the
        # raw value — lets string columns get length quantiles without a
        # derived-column pipeline stage
        self.transform = p.get("transform")

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        td = TDigest()
        col = batch[self.column]
        if self.transform == "length":
            col = pc.utf8_length(col)
        col = col.drop_null() if hasattr(col, "drop_null") else col
        if len(col):
            td.add(col.to_numpy(zero_copy_only=False).astype(np.float64))
        return {"total": batch.num_rows, "failed": 0, "tdigest": td.to_bytes()}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        td = TDigest()
        for p in partials:
            if "tdigest" in p:
                td = td.merge(TDigest.from_bytes(p["tdigest"]))
        value = td.quantile(self.q)
        ok = True
        if self.min_value is not None and value < self.min_value:
            ok = False
        if self.max_value is not None and value > self.max_value:
            ok = False
        return {
            "total": 1,
            "failed": 0 if ok else 1,
            "quantile": value,
            "q": self.q,
            "tdigest": td.to_bytes(),
        }


@register_check("freshness")
class FreshnessKernel(CheckKernel):
    """Data-recency check (the deequ ``hasMax``-on-timestamp / Airflow
    SLA analog; net-new vs the reference): pass iff
    ``as_of − MAX(ts_col) ≤ max_age_seconds``. The classic pipeline
    liveness alarm — an upstream feed that silently stopped landing
    files fails here before any per-row rule runs.

    Parameters: ``max_age_seconds`` (number, required) and ``as_of``
    (ISO timestamp string; defaults to the wall clock at rule
    compile time — pass a fixed ``as_of`` for reproducible runs).

    Fused-pass shape: per-batch ``pc.max`` partials (no shuffle, no
    extra read — the max merges associatively). An empty/all-NULL
    column is maximally stale and fails. total=1, failed∈{0,1}
    (table-level verdict convention); ``max_ts`` and ``lag_seconds``
    land in result metadata.
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        p = rule.parameters
        if p.get("max_age_seconds") is None:
            raise ValueError("Freshness rule requires max_age_seconds")
        self.max_age = float(p["max_age_seconds"])
        from datetime import datetime

        raw = p.get("as_of")
        self.as_of = (
            datetime.fromisoformat(str(raw)) if raw is not None else datetime.now()
        )

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        mx = pc.max(batch[self.column]).as_py()
        return {"total": batch.num_rows, "failed": 0, "mx": mx}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        from datetime import date, datetime

        maxes = [p["mx"] for p in partials if p.get("mx") is not None]
        if not maxes:
            return {
                "total": 1,
                "failed": 1,
                "max_ts": None,
                "lag_seconds": None,
            }
        mx = max(maxes)
        if isinstance(mx, date) and not isinstance(mx, datetime):
            mx = datetime(mx.year, mx.month, mx.day)
        lag = (self.as_of - mx).total_seconds()
        return {
            "total": 1,
            "failed": 0 if lag <= self.max_age else 1,
            "max_ts": mx.isoformat(sep=" "),
            "lag_seconds": round(float(lag), 6),
        }


@register_check("functional_dependency")
class FunctionalDependencyKernel(CheckKernel):
    """Functional-dependency conformance ``determinant → dependent``:
    every distinct determinant value must map to at most one distinct
    non-NULL dependent value (the denormalization-integrity check —
    e.g. ``url → domain``, ``order → customer``; deequ has no direct
    analog, net-new vs the reference).

    Verdict convention is determinant-level: total = distinct
    determinant values (NULL determinants excluded), failed =
    determinants observed with ≥2 distinct non-NULL dependent values
    (SQL ``COUNT(DISTINCT dep) > 1`` semantics — a key mapping to one
    value plus NULLs passes).

    Scale shape (mirrors the exact-uniqueness stage,
    ``validator.py:_fd_violations``): per-batch distinct
    (determinant, dependent) pairs reduce each batch before anything
    moves; the shuffle ships four 64-bit hashes per distinct pair
    (collision-checked double hashing on BOTH columns — an error needs
    two distinct values colliding on two independent 64-bit hashes,
    p < 1e-20 at 10^12 keys); per-bucket pandas dedup + nunique gives
    the per-determinant distinct-dependent counts. Equal determinants
    land in one bucket by construction, so counts are exact.

    Parameters: ``dependent`` (column name, required); ``column`` is
    the determinant.
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        dets = rule.parameters.get("determinants")
        if dets:
            # composite determinant (a, b, …) → dep; tuple identity via
            # the same combined_hash64 fold composite uniqueness uses
            self.determinants = [str(c) for c in dets]
            self.column = self.determinants[0]
        else:
            self.column = self._require_column()
            self.determinants = [self.column]
        dep = rule.parameters.get("dependent")
        if not dep:
            raise ValueError(
                "Functional-dependency rule requires a 'dependent' parameter"
            )
        self.dependent = str(dep)
        self.needs_shuffle = True

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        # row totals only; the validator's FD shuffle stage fills in the
        # determinant-level verdict (same pattern as exact uniqueness)
        return {"total": batch.num_rows, "failed": 0}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        return {
            "total": sum(p["total"] for p in partials),
            "failed": 0,
        }


@register_check("monotonic")
class MonotonicKernel(CheckKernel):
    """Per-key order/monotonicity conformance: within each key,
    ``column`` must be monotone in ``order_by`` order — the
    sequencing-integrity check for event streams (version counters
    never decrease, balances only accumulate, timestamps ordered by
    sequence number). Net-new vs the reference (deequ's ``isMonotone``
    analog, but keyed).

    Verdict convention (SQL ``LAG`` parity): a row violates iff its
    value compares against the PREVIOUS row of its key (in
    ``order_by`` order) against ``direction`` —
    ``non_decreasing`` (default): ``value < LAG(value)``;
    ``non_increasing``: ``>``; ``strict_increasing``: ``<=``;
    ``strict_decreasing``: ``>=``. NULL comparisons never violate
    (three-valued logic), so NULL values pass and also shield their
    successor (LAG passes the raw previous-row value, not the last
    non-null). ``total`` = rows in scope: all ``keys`` and
    ``order_by`` columns non-NULL (NULL keys / unordered rows have no
    defined position).

    Scale shape: the fused pass only counts rows; the verdict runs in
    the validator's bucketed per-key shuffle
    (``_monotonic_violations``) — equal keys co-locate, ONE vectorized
    sort + shifted-compare sweep per bucket for all its keys. The
    exchange ships (keys, order, value) triples only.

    Parameters: ``keys`` (non-empty list — a global unkeyed series
    needs a range partition, not a hash bucket; add a constant key
    column if truly global), ``order_by`` (non-empty list),
    ``direction``.
    """

    DIRECTIONS = (
        "non_decreasing",
        "non_increasing",
        "strict_increasing",
        "strict_decreasing",
    )

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        keys = rule.parameters.get("keys") or []
        order_by = rule.parameters.get("order_by") or []
        if not keys:
            raise ValueError("Monotonic rule requires non-empty 'keys'")
        if not order_by:
            raise ValueError("Monotonic rule requires non-empty 'order_by'")
        self.keys = [str(c) for c in keys]
        self.order_by = [str(c) for c in order_by]
        self.direction = str(
            rule.parameters.get("direction", "non_decreasing")
        )
        if self.direction not in self.DIRECTIONS:
            raise ValueError(
                f"direction must be one of {self.DIRECTIONS}, "
                f"got {self.direction!r}"
            )
        self.needs_shuffle = True

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        # row totals only; the validator's bucketed shuffle stage fills
        # in the sequence verdict (same pattern as FD / uniqueness)
        return {"total": batch.num_rows, "failed": 0}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        return {
            "total": sum(p["total"] for p in partials),
            "failed": 0,
        }


@register_check("correlation")
class CorrelationKernel(CheckKernel):
    """Table-level check (deequ ``hasCorrelation``): the Pearson
    correlation of ``column`` vs ``parameters.other`` must lie within
    [min_value, max_value]. total=1, failed∈{0,1} (the quantile/drift
    verdict convention); metadata carries ``correlation`` and
    ``n_pairs``.

    Fused, no shuffle: per-batch pairwise-complete moment sums
    (n, Σx, Σy, Σxy, Σx², Σy² over rows where BOTH are non-NULL — SQL
    ``CORR`` convention) merge associatively; the closed-form sample
    correlation (scale factors cancel) is NULL/fails when n < 2 or
    either variance is zero, matching SQL NULL (an unknown verdict is
    a failed verdict)."""

    table_level = True

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        other = rule.parameters.get("other")
        if not other:
            raise ValueError(
                "Correlation rule requires an 'other' column parameter"
            )
        self.other = str(other)
        self.min_value = rule.parameters.get("min_value")
        self.max_value = rule.parameters.get("max_value")
        if self.min_value is None and self.max_value is None:
            raise ValueError(
                "Correlation rule requires min_value and/or max_value"
            )

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        x = pc.cast(batch[self.column], pa.float64())
        y = pc.cast(batch[self.other], pa.float64())
        both = pc.and_(pc.is_valid(x), pc.is_valid(y))
        xv = x.filter(both).to_numpy(zero_copy_only=False)
        yv = y.filter(both).to_numpy(zero_copy_only=False)
        return {
            "total": batch.num_rows,
            "failed": 0,
            "m": [
                float(len(xv)),
                float(xv.sum()), float(yv.sum()),
                float((xv * yv).sum()),
                float((xv * xv).sum()), float((yv * yv).sum()),
            ],
        }

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        m = np.zeros(6)
        for p in partials:
            if "m" in p:
                m += np.asarray(p["m"])
        n, sx, sy, sxy, sxx, syy = m
        r = None
        if n >= 2:
            cov = sxy - sx * sy / n
            vx = sxx - sx * sx / n
            vy = syy - sy * sy / n
            if vx > 0 and vy > 0:
                r = cov / float(np.sqrt(vx * vy))
        ok = r is not None
        if ok and self.min_value is not None and r < self.min_value:
            ok = False
        if ok and self.max_value is not None and r > self.max_value:
            ok = False
        return {
            "total": 1,
            "failed": 0 if ok else 1,
            "correlation": r,
            "n_pairs": int(n),
        }


@register_check("entropy")
class EntropyKernel(CheckKernel):
    """Table-level check (deequ ``hasEntropy``): the Shannon entropy
    — natural log, non-NULL values — of ``column``'s value
    distribution must lie within [min_value, max_value]. total=1,
    failed∈{0,1} (the quantile/drift verdict convention); metadata
    carries ``entropy`` and ``distinct_count``.

    Fused, no shuffle: per-batch ``value_counts`` partials merge as
    counters on the driver — bounded by the column's DISTINCT count
    (the categorical-column assumption; heavy-tailed free-text columns
    belong to the hashed profile tier, cf. ``token_entropy``). Entropy
    comes out as ln(n) − Σ c·ln(c) / n, the single-divide form whose
    SQL mirror shares float semantics; counts sum in sorted order for
    run-to-run determinism."""

    table_level = True

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        self.min_value = rule.parameters.get("min_value")
        self.max_value = rule.parameters.get("max_value")
        if self.min_value is None and self.max_value is None:
            raise ValueError(
                "Entropy rule requires min_value and/or max_value"
            )

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        return _value_count_partial(batch, self.column)

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        counts = _merge_value_counts(partials)
        ent = None
        if counts:
            cs = np.sort(np.fromiter(counts.values(), dtype=np.float64))
            n = float(cs.sum())
            ent = float(np.log(n) - np.sum(cs * np.log(cs)) / n)
        ok = ent is not None
        if ok and self.min_value is not None and ent < self.min_value:
            ok = False
        if ok and self.max_value is not None and ent > self.max_value:
            ok = False
        return {
            "total": 1,
            "failed": 0 if ok else 1,
            "entropy": ent,
            "distinct_count": len(counts),
        }


def _value_count_partial(batch: pa.Table, column: str) -> Dict[str, Any]:
    """Per-batch non-NULL value→count dict (the distinct-bounded
    partial shared by entropy / distinctness / unique_value_ratio —
    the categorical-column assumption; high-cardinality columns belong
    to the uniqueness exact/HLL tiers)."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vc = col.drop_null().value_counts()
    return {
        "total": batch.num_rows,
        "failed": 0,
        "vc": dict(
            zip(
                vc.field("values").to_pylist(),
                (int(c) for c in vc.field("counts").to_pylist()),
            )
        ),
    }


def _merge_value_counts(partials: List[Dict[str, Any]]) -> Dict[Any, int]:
    counts: Dict[Any, int] = {}
    for p in partials:
        for v, c in p.get("vc", {}).items():
            counts[v] = counts.get(v, 0) + c
    return counts


class _BoundedTableCheck(CheckKernel):
    """Shared [min_value, max_value] verdict plumbing for table-level
    single-statistic checks (the deequ ``hasX(assertion)`` family)."""

    table_level = True

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.min_value = rule.parameters.get("min_value")
        self.max_value = rule.parameters.get("max_value")
        if self.min_value is None and self.max_value is None:
            raise ValueError(
                f"{rule.rule_type} rule requires min_value and/or max_value"
            )

    def _verdict(self, stat: Optional[float]) -> int:
        ok = stat is not None
        if ok and self.min_value is not None and stat < self.min_value:
            ok = False
        if ok and self.max_value is not None and stat > self.max_value:
            ok = False
        return 0 if ok else 1


@register_check("distinctness")
class DistinctnessKernel(_BoundedTableCheck):
    """Table-level check (deequ ``hasDistinctness``): the ratio of
    DISTINCT non-NULL values to non-NULL rows of ``column`` must lie
    within [min_value, max_value]. total=1, failed∈{0,1}; metadata
    carries ``distinctness``, ``distinct_count`` and
    ``non_null_count``. SQL mirror: ``COUNT(DISTINCT x)::DOUBLE /
    COUNT(x)``; an empty / all-NULL column yields a NULL ratio and an
    unknown verdict is a failed verdict.

    Fused, no shuffle: the entropy kernel's value-count partials
    (distinct-bounded driver merge — categorical columns; use the
    exact-uniqueness shuffle or HLL tiers for key-like columns)."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        return _value_count_partial(batch, self.column)

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        counts = _merge_value_counts(partials)
        n = sum(counts.values())
        ratio = (len(counts) / n) if n else None
        return {
            "total": 1,
            "failed": self._verdict(ratio),
            "distinctness": ratio,
            "distinct_count": len(counts),
            "non_null_count": n,
        }


@register_check("unique_value_ratio")
class UniqueValueRatioKernel(_BoundedTableCheck):
    """Table-level check (deequ ``hasUniqueValueRatio``): the fraction
    of DISTINCT values of ``column`` that occur EXACTLY ONCE must lie
    within [min_value, max_value]. total=1, failed∈{0,1}; metadata
    carries ``unique_value_ratio``, ``unique_count`` (values seen
    once) and ``distinct_count``. SQL mirror: grouped counts →
    ``COUNT(*) FILTER (c = 1) / COUNT(*)``. Empty / all-NULL → NULL
    ratio → failed (unknown verdict).

    Same distinct-bounded value-count partials as entropy /
    distinctness (categorical-column assumption)."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        return _value_count_partial(batch, self.column)

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        counts = _merge_value_counts(partials)
        uniq = sum(1 for c in counts.values() if c == 1)
        ratio = (uniq / len(counts)) if counts else None
        return {
            "total": 1,
            "failed": self._verdict(ratio),
            "unique_value_ratio": ratio,
            "unique_count": uniq,
            "distinct_count": len(counts),
        }


@register_check("mutual_information")
class MutualInformationKernel(_BoundedTableCheck):
    """Table-level check (deequ ``hasMutualInformation``): the mutual
    information — natural log — between ``column`` and
    ``parameters.other`` over rows where BOTH are non-NULL must lie
    within [min_value, max_value]. total=1, failed∈{0,1}; metadata
    carries ``mutual_information``, ``n_pairs`` and
    ``distinct_pairs``. MI = Σ (c_xy/n)·ln(c_xy·n / (c_x·c_y)) — the
    single-expression form whose SQL mirror (joint counts + window
    marginals) shares float semantics to ≪1e-6.

    Fused, no shuffle: per-batch Arrow ``group_by`` pair-count
    partials merge as counters on the driver — bounded by the PAIR
    distinct count (two categorical columns); marginals fall out of
    the merged joint table. Pairs sum in sorted order for run-to-run
    determinism."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        other = rule.parameters.get("other")
        if not other:
            raise ValueError(
                "mutual_information rule requires an 'other' column parameter"
            )
        self.other = str(other)

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        x, y = batch[self.column], batch[self.other]
        both = pc.and_(pc.is_valid(x), pc.is_valid(y))
        pairs = pa.table({"x": x, "y": y}).filter(both)
        g = pairs.group_by(["x", "y"]).aggregate([([], "count_all")])
        return {
            "total": batch.num_rows,
            "failed": 0,
            "vc": dict(
                zip(
                    zip(g["x"].to_pylist(), g["y"].to_pylist()),
                    (int(c) for c in g["count_all"].to_pylist()),
                )
            ),
        }

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        counts = _merge_value_counts(partials)
        mi = None
        if counts:
            keys = sorted(counts)
            c = np.array([counts[k] for k in keys], dtype=np.float64)
            n = float(c.sum())
            cx: Dict[Any, float] = {}
            cy: Dict[Any, float] = {}
            for (kx, ky), v in counts.items():
                cx[kx] = cx.get(kx, 0.0) + v
                cy[ky] = cy.get(ky, 0.0) + v
            mx = np.array([cx[k[0]] for k in keys])
            my = np.array([cy[k[1]] for k in keys])
            mi = float(np.sum((c / n) * np.log(c * n / (mx * my))))
        return {
            "total": 1,
            "failed": self._verdict(mi),
            "mutual_information": mi,
            "n_pairs": int(sum(counts.values())),
            "distinct_pairs": len(counts),
        }


@register_check("string_length")
class StringLengthKernel(CheckKernel):
    """Row-level check (deequ ``hasMinLength``/``hasMaxLength``,
    row-resolved): a non-NULL value of ``column`` fails when its
    character length (UTF-8 code points — Arrow ``utf8_length`` ==
    DuckDB ``LENGTH``) falls outside [min_length, max_length]; NULLs
    never fail (completeness's job — SQL three-valued convention, the
    range-rule precedent). Filter mode keeps in-bounds rows and drops
    NULLs (the reference's F2 NULL-drop asymmetry). Partials carry the
    observed min/max length — the free column stats deequ's
    MinLength/MaxLength analyzers report."""

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        p = rule.parameters
        self.min_length = p.get("min_length")
        self.max_length = p.get("max_length")
        if self.min_length is None and self.max_length is None:
            raise ValueError(
                "string_length rule requires min_length and/or max_length"
            )

    def _length(self, batch: pa.Table):
        return pc.utf8_length(batch[self.column])

    def mask_failing(self, batch: pa.Table):
        ln = self._length(batch)
        bad = pa.array(np.zeros(len(ln), dtype=bool))
        if self.min_length is not None:
            bad = pc.or_(bad, pc.less(ln, self.min_length))
        if self.max_length is not None:
            bad = pc.or_(bad, pc.greater(ln, self.max_length))
        return pc.fill_null(bad, False)

    def mask_keep(self, batch: pa.Table):
        ln = self._length(batch)
        ok = pc.is_valid(ln)
        if self.min_length is not None:
            ok = pc.and_(ok, pc.greater_equal(ln, self.min_length))
        if self.max_length is not None:
            ok = pc.and_(ok, pc.less_equal(ln, self.max_length))
        return pc.fill_null(ok, False)

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        p = super().partial(batch)
        lo, hi = _scalar_minmax(self._length(batch))
        p["min_len"], p["max_len"] = lo, hi
        return p

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        out = super().combine(partials)
        mins = [p["min_len"] for p in partials if p.get("min_len") is not None]
        maxs = [p["max_len"] for p in partials if p.get("max_len") is not None]
        out["min_length"] = int(min(mins)) if mins else None
        out["max_length"] = int(max(maxs)) if maxs else None
        return out


@register_check("group_limit")
class GroupLimitKernel(CheckKernel):
    """Per-group aggregate bound (the grouped-HAVING rule family —
    e.g. "no user exceeds 1000 events", "every order's line-count is
    ≥ 1"): asserts ``agg(agg_column) OP bound`` for EVERY group of
    ``keys``. Verdict is group-level: total = distinct key tuples
    (NULL keys excluded), failed = groups where the assertion is not
    satisfied — a NULL aggregate (all-NULL values under sum/avg/
    min/max) never satisfies, the SQL three-valued HAVING convention.

    Parameters: ``keys`` (non-empty list), ``agg`` ∈ {count, sum,
    avg, min, max} (count counts ROWS), ``agg_column`` (required
    except for count), ``op`` ∈ {<=, <, >=, >}, ``bound`` (number).

    Scale shape: per-batch pyarrow ``group_by`` combiner partials
    (keys, n, Σ, min, max, non-null count — distinct-bounded, never
    rows), ONE bucketed key shuffle, vectorized per-bucket merge +
    assertion (``validator._group_limit_violations``).
    """

    AGGS = ("count", "sum", "avg", "min", "max")
    OPS = ("<=", "<", ">=", ">")

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        p = rule.parameters
        keys = p.get("keys") or []
        if not keys:
            raise ValueError("group_limit rule requires non-empty 'keys'")
        self.keys = [str(c) for c in keys]
        self.agg = str(p.get("agg", "count"))
        if self.agg not in self.AGGS:
            raise ValueError(f"agg must be one of {self.AGGS}")
        self.agg_column = p.get("agg_column")
        if self.agg != "count" and not self.agg_column:
            raise ValueError(f"agg='{self.agg}' requires 'agg_column'")
        self.agg_column = str(self.agg_column) if self.agg_column else None
        self.op = str(p.get("op", "<="))
        if self.op not in self.OPS:
            raise ValueError(f"op must be one of {self.OPS}")
        if "bound" not in p:
            raise ValueError("group_limit rule requires 'bound'")
        self.bound = float(p["bound"])
        self.column = self.keys[0]
        self.needs_shuffle = True

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        # row totals only; the validator's bucketed shuffle stage fills
        # in the group-level verdict
        return {"total": batch.num_rows, "failed": 0}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        return {
            "total": sum(p["total"] for p in partials),
            "failed": 0,
        }
