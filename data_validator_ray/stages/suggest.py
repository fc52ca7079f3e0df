"""Constraint suggestion: profile a table once and propose the rule
set a user would otherwise hand-write (the deequ ConstraintSuggestion
analog; net-new vs the reference, which ships rules only by hand in
YAML). The suggested rules are the bootstrap for validating the NEXT
data delivery — suggest on a known-good snapshot, then freeze.

Decisions are EXACT (not sketch-fuzzy), with scale-honest shapes:

* completeness — suggested iff the column has zero NULLs (mergeable
  null-count partials in the one streaming pass).
* range — numeric columns get ``[min, max]`` from mergeable partials.
* membership — string columns whose EXACT distinct set has ≤
  ``enum_max`` values. Per batch, a column emits its distinct set
  only while it stays ≤ ``enum_max`` values (a single batch exceeding
  the cap proves the global set does — batch-distinct ≤
  global-distinct — so it emits an overflow marker instead); the
  exchange is bounded by ``(enum_max+1) × batches`` no matter the
  column's true cardinality.
* uniqueness — a column is a key iff exact distinct == non-NULL
  count. The O(n)-exchange exact-distinct shuffle runs ONLY for
  candidate columns whose fused-pass HLL estimate is within
  ``hll_gate`` of the row count (the gate just routes work; the final
  verdict is always the exact count, so a near-unique column is never
  mis-suggested).

``suggest_rules`` returns the suggestion table;
``suggestions_to_rules`` turns it into ready-to-run rule dicts —
pinned by a self-consistency test (every suggested rule PASSES on the
profiled data).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import HyperLogLog, hash64

_NUMERIC = (
    pa.types.is_integer,
    pa.types.is_floating,
)


def _is_numeric(t: pa.DataType) -> bool:
    return any(f(t) for f in _NUMERIC)


def suggest_rules(
    source: Any,
    *,
    enum_max: int = 20,
    hll_gate: float = 0.9,
    batch_size: int = 64 * 1024,
) -> pa.Table:
    """Suggestion table ``(column, rule_type, min_value, max_value,
    allowed)`` sorted by (column, rule_type) — see module docstring
    for the per-rule decision contracts."""
    import pandas as pd

    from ..pipelines.dedup import _as_dataset
    from ..validator import RayDataValidator

    ds = _as_dataset(source)
    names = list(ds.schema().names)

    def partials(batch: pa.Table) -> pa.Table:
        # type decisions come from the ARROW batch schema (a pandas
        # source's Dataset.schema() reports numpy dtypes)
        rows: List[Dict[str, Any]] = []
        for c in names:
            arr = batch[c].combine_chunks()
            typ = batch.schema.field(c).type
            is_num = _is_numeric(typ)
            is_str = pa.types.is_string(typ) or pa.types.is_large_string(typ)
            nn = len(arr) - arr.null_count
            row: Dict[str, Any] = {
                "column": c,
                "n": len(arr),
                "nulls": arr.null_count,
                "isn": is_num,
                "iss": is_str,
                "mn": None,
                "mx": None,
                "vals": None,
                "hll": None,
            }
            if is_num and nn:
                row["mn"] = float(pc.min(arr).as_py())
                row["mx"] = float(pc.max(arr).as_py())
            if nn:
                valid = arr.drop_null()
                hll = HyperLogLog()
                hll.add_hashes(hash64(valid))
                row["hll"] = hll.to_bytes()
                if is_str:
                    u = pc.unique(valid)
                    if len(u) <= enum_max:
                        row["vals"] = json.dumps(sorted(u.to_pylist()))
            rows.append(row)
        return pa.table(
            {
                "column": pa.array([r["column"] for r in rows], pa.string()),
                "n": pa.array([r["n"] for r in rows], pa.int64()),
                "nulls": pa.array([r["nulls"] for r in rows], pa.int64()),
                "isn": pa.array([r["isn"] for r in rows], pa.bool_()),
                "iss": pa.array([r["iss"] for r in rows], pa.bool_()),
                "mn": pa.array([r["mn"] for r in rows], pa.float64()),
                "mx": pa.array([r["mx"] for r in rows], pa.float64()),
                "vals": pa.array([r["vals"] for r in rows], pa.string()),
                "hll": pa.array([r["hll"] for r in rows], pa.binary()),
            }
        )

    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()

    out_rows: List[Dict[str, Any]] = []
    validator: Optional[RayDataValidator] = None
    for c in names:
        p = part[part["column"] == c]
        n = int(p["n"].sum())
        nulls = int(p["nulls"].sum())
        nn = n - nulls
        if n and nulls == 0:
            out_rows.append({"column": c, "rule_type": "completeness"})
        if bool(p["isn"].any()) and p["mn"].notna().any():
            out_rows.append(
                {
                    "column": c,
                    "rule_type": "range",
                    "min_value": float(p["mn"].min()),
                    "max_value": float(p["mx"].max()),
                }
            )
        # membership: merged exact distinct set, overflow-aware
        if bool(p["iss"].any()) and nn:
            has_data = p[p["hll"].notna()]
            if len(has_data) and has_data["vals"].notna().all():
                merged = sorted(
                    set().union(
                        *(json.loads(v) for v in has_data["vals"])
                    )
                )
                if len(merged) <= enum_max:
                    out_rows.append(
                        {
                            "column": c,
                            "rule_type": "membership",
                            # comma-joined sorted values — SQL
                            # string_agg(DISTINCT … ORDER BY) parity;
                            # commas inside enum values are out of
                            # scope for the suggestion surface
                            "allowed": ",".join(merged),
                        }
                    )
        # uniqueness: HLL gates, exact distinct decides. NULL-free
        # only — the uniqueness verdict counts NULL rows as failed, so
        # suggesting it for a nullable column would fail on the very
        # data that produced it (caught by the self-consistency test)
        if nn and nulls == 0:
            hll = HyperLogLog()
            for b in p["hll"].dropna():
                hll = hll.merge(HyperLogLog.from_bytes(b))
            if hll.estimate() >= hll_gate * nn:
                if validator is None:
                    from ..config import ValidationConfig

                    validator = RayDataValidator(
                        ValidationConfig(engine={"type": "ray"}, tables=[])
                    )
                distinct = validator._exact_distinct(
                    ds.select_columns([c]), c
                )
                if distinct == nn:
                    out_rows.append({"column": c, "rule_type": "uniqueness"})

    out_rows.sort(key=lambda r: (r["column"], r["rule_type"]))
    return pa.table(
        {
            "column": pa.array([r["column"] for r in out_rows], pa.string()),
            "rule_type": pa.array(
                [r["rule_type"] for r in out_rows], pa.string()
            ),
            "min_value": pa.array(
                [r.get("min_value") for r in out_rows], pa.float64()
            ),
            "max_value": pa.array(
                [r.get("max_value") for r in out_rows], pa.float64()
            ),
            "allowed": pa.array(
                [r.get("allowed") for r in out_rows], pa.string()
            ),
        }
    )


def suggestions_to_rules(table: pa.Table) -> List[Dict[str, Any]]:
    """Suggestion rows → ready-to-run rule dicts (``ValidationRule``
    model shape; names are ``suggested_{column}_{rule_type}``)."""
    rules: List[Dict[str, Any]] = []
    for r in table.to_pylist():
        rule: Dict[str, Any] = {
            "name": f"suggested_{r['column']}_{r['rule_type']}",
            "rule_type": r["rule_type"],
            "column": r["column"],
            "parameters": {},
        }
        if r["rule_type"] == "range":
            rule["parameters"] = {
                "min_value": r["min_value"],
                "max_value": r["max_value"],
            }
        elif r["rule_type"] == "membership":
            rule["parameters"] = {"values": r["allowed"].split(",")}
        rules.append(rule)
    return rules
