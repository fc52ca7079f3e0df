"""Distribution-drift checking vs a baseline snapshot (north-rule C7).

The reference has no drift machinery at all (its closest analogue is the
always-pass ``delta_quality`` placeholder, ``databricks_engine.py:304-327``);
this module is net-new, built Ray-Data-first:

* :func:`write_baseline` — snapshot per-column distribution state to a
  small Parquet file in two streaming passes over the Dataset
  (pass 1: t-digest + min/max/null partials per batch, merged on the
  driver; pass 2: exact histogram counts over equi-depth bin edges
  derived from the merged t-digest). Nothing materializes.
* :class:`DriftKernel` (``rule_type="drift"``) — runs inside the fused
  ``map_batches`` pass: each batch histograms the column over the
  baseline's stored edges (a vectorized ``np.searchsorted``) and feeds
  a t-digest; partials merge associatively on the driver into a PSI or
  KS statistic compared against ``max_value``.

The baseline file is tiny (one row per column) and travels to workers
inside the kernel closure — no shuffle, no broadcast needed.

PSI  = Σ (p_cur − p_base) · ln(p_cur / p_base) over histogram bins
       (bins floored at ``_EPS`` so empty bins don't produce ±inf).
KS   = max |CDF_cur(x) − CDF_base(x)| over the baseline edge grid,
       both CDFs evaluated from merged t-digests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import ValidationRule
from ..functions.sketches import TDigest
from .registry import CheckKernel, register_check

_EPS = 1e-6

BASELINE_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("count", pa.int64()),
        ("null_count", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("tdigest", pa.binary()),
        ("edges", pa.list_(pa.float64())),
        ("counts", pa.list_(pa.int64())),
    ]
)


def _numeric_values(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.int64())
    return col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)


def histogram_counts(values: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Counts per bin for interior edges ``edges`` (B−1 cut points →
    B bins, open-ended at both extremes so every value lands somewhere)."""
    if len(values) == 0:
        return np.zeros(len(edges) + 1, dtype=np.int64)
    idx = np.searchsorted(edges, values, side="right")
    return np.bincount(idx, minlength=len(edges) + 1).astype(np.int64)


def psi(p_base: np.ndarray, p_cur: np.ndarray) -> float:
    """Population Stability Index between two bin-probability vectors."""
    b = np.clip(p_base, _EPS, None)
    c = np.clip(p_cur, _EPS, None)
    b, c = b / b.sum(), c / c.sum()
    return float(np.sum((c - b) * np.log(c / b)))


def ks_stat(td_base: TDigest, td_cur: TDigest, grid: np.ndarray) -> float:
    """Approximate two-sample KS statistic from t-digest CDFs."""
    if len(grid) == 0:
        return 0.0
    return float(np.max(np.abs(td_cur.cdf(grid) - td_base.cdf(grid))))


# --------------------------------------------------------------------------- #
# baseline snapshot writer                                                    #
# --------------------------------------------------------------------------- #


def write_baseline(
    source: Any,
    columns: List[str],
    out_path: "str | Path",
    *,
    bins: int = 64,
    batch_size: int = 64 * 1024,
) -> Path:
    """Snapshot the distribution of numeric/timestamp ``columns`` of
    ``source`` (Dataset or parquet path) to ``out_path``.

    Two streaming passes, both pure ``map_batches`` over pruned columns:
    sketch (t-digest/min/max/null) then exact equi-depth histogram. The
    per-batch partial rows are tiny; the full dataset never
    materializes. Edges are the baseline t-digest's 1/bins..(bins−1)/bins
    quantiles — equal-frequency by construction, so downstream PSI is
    sensitive across the whole distribution rather than only at the
    mode (equal-width bins would starve the tails).
    """
    import ray.data

    if isinstance(source, ray.data.Dataset):
        ds = source.select_columns(columns)
        ds2 = ds
    else:
        ds = ray.data.read_parquet(str(source), columns=columns)
        ds2 = ray.data.read_parquet(str(source), columns=columns)

    import pickle

    def sketch(batch: pa.Table) -> pa.Table:
        rows = []
        for name in columns:
            vals = _numeric_values(batch, name)
            td = TDigest()
            td.add(vals)
            rows.append(
                {
                    "column": name,
                    "count": batch.num_rows,
                    "null_count": batch.num_rows - len(vals),
                    "min": float(vals.min()) if len(vals) else np.nan,
                    "max": float(vals.max()) if len(vals) else np.nan,
                    "payload": pickle.dumps(td.to_bytes()),
                }
            )
        return pa.Table.from_pylist(rows)

    merged: Dict[str, Dict[str, Any]] = {
        c: {"count": 0, "null_count": 0, "min": np.inf, "max": -np.inf,
            "td": TDigest()}
        for c in columns
    }
    for row in ds.map_batches(
        sketch, batch_format="pyarrow", batch_size=batch_size
    ).iter_rows():
        m = merged[row["column"]]
        m["count"] += row["count"]
        m["null_count"] += row["null_count"]
        if not np.isnan(row["min"]):
            m["min"] = min(m["min"], row["min"])
            m["max"] = max(m["max"], row["max"])
        m["td"] = m["td"].merge(TDigest.from_bytes(pickle.loads(row["payload"])))

    edges_by_col: Dict[str, np.ndarray] = {}
    for name, m in merged.items():
        qs = np.arange(1, bins) / bins
        edges = np.unique(np.array([m["td"].quantile(q) for q in qs]))
        edges_by_col[name] = edges

    def hist(batch: pa.Table) -> pa.Table:
        rows = []
        for name in columns:
            counts = histogram_counts(_numeric_values(batch, name), edges_by_col[name])
            rows.append({"column": name, "counts": counts.tolist()})
        return pa.Table.from_pylist(rows)

    counts_by_col = {c: np.zeros(len(edges_by_col[c]) + 1, dtype=np.int64) for c in columns}
    for row in ds2.map_batches(
        hist, batch_format="pyarrow", batch_size=batch_size
    ).iter_rows():
        counts_by_col[row["column"]] += np.asarray(row["counts"], dtype=np.int64)

    out = pa.Table.from_pylist(
        [
            {
                "column": name,
                "count": m["count"],
                "null_count": m["null_count"],
                "min": None if np.isinf(m["min"]) else m["min"],
                "max": None if np.isinf(m["max"]) else m["max"],
                "tdigest": m["td"].to_bytes(),
                "edges": edges_by_col[name].tolist(),
                "counts": counts_by_col[name].tolist(),
            }
            for name, m in merged.items()
        ],
        schema=BASELINE_SCHEMA,
    )
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(out, out_path)
    return out_path


def read_baseline(path: "str | Path") -> Dict[str, Dict[str, Any]]:
    tbl = pq.read_table(path)
    return {r["column"]: r for r in tbl.to_pylist()}


# --------------------------------------------------------------------------- #
# drift kernel                                                                #
# --------------------------------------------------------------------------- #


@register_check("drift")
class DriftKernel(CheckKernel):
    """Table-level drift check: PSI or KS of ``column`` vs the baseline
    snapshot at ``parameters.baseline``. total=1, failed∈{0,1} (same
    verdict convention as ``quantile``). ``parameters``:

    * ``baseline`` — path of a :func:`write_baseline` Parquet file; with
      ``edges`` set, a RAW Parquet table instead (histogrammed
      distributedly in :meth:`prepare`)
    * ``metric`` — ``"psi"`` (default) or ``"ks"``
    * ``max_value`` — pass iff stat ≤ max_value (defaults: PSI 0.2,
      KS 0.1 — the conventional alert levels)
    * ``edges`` — optional explicit interior bin edges (PSI only): the
      oracle-exact fixed-bin tier (SQL-expressible, unlike t-digest
      bins); ``baseline_column`` names the baseline table's value
      column (defaults to ``column``)
    """

    table_level = True

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        p = rule.parameters
        baseline_path = p.get("baseline")
        if not baseline_path:
            raise ValueError("Drift rule requires a 'baseline' snapshot path")
        self.metric = str(p.get("metric", "psi")).lower()
        if self.metric not in ("psi", "ks"):
            raise ValueError(f"Unknown drift metric: {self.metric}")
        self.max_value = float(
            p.get("max_value", 0.2 if self.metric == "psi" else 0.1)
        )
        edges = p.get("edges")
        if edges is not None:
            if self.metric != "psi":
                raise ValueError("Explicit 'edges' requires metric: psi")
            self.base_edges = np.asarray(edges, dtype=np.float64)
            self._base_source = baseline_path
            self._base_column = str(p.get("baseline_column", self.column))
            self.base_counts = None  # histogrammed in prepare()
            self.base_td = None
            return
        self._base_source = None
        base = read_baseline(baseline_path)
        if self.column not in base:
            raise ValueError(
                f"Column '{self.column}' not in baseline snapshot {baseline_path}"
            )
        b = base[self.column]
        self.base_edges = np.asarray(b["edges"], dtype=np.float64)
        self.base_counts = np.asarray(b["counts"], dtype=np.float64)
        self.base_td = TDigest.from_bytes(b["tdigest"])

    def prepare(self, ctx: Dict[str, Any]) -> None:
        """Fixed-edges tier: histogram the raw baseline table in one
        streaming ``map_batches`` pass (per-batch count vectors summed
        on the driver — row-count-independent exchange)."""
        if self._base_source is None:
            return
        from ..pipelines.dedup import _as_dataset

        e = self.base_edges
        col = self._base_column

        def partials(batch: pa.Table) -> pa.Table:
            vals = _numeric_values(batch, col)
            c = histogram_counts(vals, e)
            return pa.table(
                {"counts": pa.array([c.tolist()], pa.list_(pa.int64()))}
            )

        ds = _as_dataset(self._base_source, columns=[col])
        total = np.zeros(len(e) + 1, dtype=np.float64)
        part = ds.map_batches(partials, batch_format="pyarrow")
        for b in part.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
            for chunk in b["counts"].chunks:
                total += np.asarray(
                    chunk.flatten().to_numpy(zero_copy_only=False), np.float64
                ).reshape(len(chunk), -1).sum(axis=0)
        self.base_counts = total

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        vals = _numeric_values(batch, self.column)
        out: Dict[str, Any] = {
            "total": batch.num_rows,
            "failed": 0,
            "hist": histogram_counts(vals, self.base_edges).tolist(),
        }
        if self.metric == "ks":
            td = TDigest()
            td.add(vals)
            out["tdigest"] = td.to_bytes()
        return out

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        counts = np.zeros(len(self.base_edges) + 1, dtype=np.float64)
        for p in partials:
            counts += np.asarray(p["hist"], dtype=np.float64)
        if self.metric == "psi":
            stat = psi(self.base_counts, counts)
        else:
            td = TDigest()
            for p in partials:
                if "tdigest" in p:
                    td = td.merge(TDigest.from_bytes(p["tdigest"]))
            stat = ks_stat(self.base_td, td, self.base_edges)
        ok = stat <= self.max_value
        return {
            "total": 1,
            "failed": 0 if ok else 1,
            "metric": self.metric,
            "stat": round(stat, 6),
            "max_value": self.max_value,
        }


def psi_fixed_bins(
    source_base: Any,
    source_current: Any,
    value_col: str,
    edges: List[float],
    *,
    batch_size: int = 64 * 1024,
) -> "pa.Table":
    """Population Stability Index between two datasets over FIXED,
    caller-supplied bin edges — the oracle-exact sibling of the
    equi-depth/t-digest :class:`DriftKernel` tier (fixed edges are
    SQL-expressible; t-digest edges are not).

    ``edges`` are interior cut points: ``len(edges)+1`` bins, open at
    both extremes, ``searchsorted(side="right")`` membership (a value
    equal to an edge falls in the bin BELOW it, matching the SQL
    formulation ``count of edges <= v``). Each side reduces in one
    streaming ``map_batches`` pass to per-batch count vectors (one row
    of ``len(edges)+1`` ints per batch — row-count-independent
    exchange); the driver sums them and applies the standard
    clip(1e-6)+renormalize PSI. NULL values drop.

    Returns a one-row ``pa.Table``: ``n_base, n_current, psi_value``
    (psi rounded to 6, the engine's float-hash convention)."""
    import ray.data

    from ..pipelines.dedup import _as_dataset

    e = np.asarray(edges, dtype=np.float64)

    def partials(batch: pa.Table) -> pa.Table:
        vals = _numeric_values(batch, value_col)
        c = histogram_counts(vals, e)
        return pa.table({"counts": pa.array([c.tolist()], pa.list_(pa.int64()))})

    def side_counts(src: Any) -> np.ndarray:
        ds = _as_dataset(src, columns=[value_col])
        part = ds.map_batches(
            partials, batch_format="pyarrow", batch_size=batch_size
        )
        total = np.zeros(len(e) + 1, dtype=np.int64)
        for r in part.take_all():
            total += np.asarray(r["counts"], dtype=np.int64)
        return total

    cb = side_counts(source_base)
    cc = side_counts(source_current)
    return pa.table(
        {
            "n_base": pa.array([int(cb.sum())], pa.int64()),
            "n_current": pa.array([int(cc.sum())], pa.int64()),
            "psi_value": pa.array(
                [round(psi(cb.astype(np.float64), cc.astype(np.float64)), 6)],
                pa.float64(),
            ),
        }
    )


def js_fixed_bins(
    source_base: Any,
    source_current: Any,
    value_col: str,
    edges: List[float],
    *,
    batch_size: int = 64 * 1024,
) -> "pa.Table":
    """Jensen–Shannon divergence (nats) between two datasets over
    fixed bin edges — the bounded, symmetric sibling of
    :func:`psi_fixed_bins` (JS ∈ [0, ln 2] with no epsilon clipping:
    a bin empty on one side contributes finitely, where PSI needs the
    1e-6 floor; preferable when alert thresholds must be comparable
    across columns).

    Same scale shape as PSI: per-batch count vectors (one
    ``len(edges)+1``-int row per batch), driver sum, then
    ``JS = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m)`` with ``m = (p+q)/2`` over
    the observed bins (0·ln0 = 0). Terms mirror the SQL formulation;
    ROUND 6. Returns ``(n_base, n_current, js_value)``."""
    e = np.asarray(edges, dtype=np.float64)

    from ..pipelines.dedup import _as_dataset

    def partials(batch: pa.Table) -> pa.Table:
        vals = _numeric_values(batch, value_col)
        c = histogram_counts(vals, e)
        return pa.table({"counts": pa.array([c.tolist()], pa.list_(pa.int64()))})

    def side_counts(src: Any) -> np.ndarray:
        ds = _as_dataset(src, columns=[value_col])
        part = ds.map_batches(
            partials, batch_format="pyarrow", batch_size=batch_size
        )
        total = np.zeros(len(e) + 1, dtype=np.int64)
        for r in part.take_all():
            total += np.asarray(r["counts"], dtype=np.int64)
        return total

    cb = side_counts(source_base)
    cc = side_counts(source_current)
    na, nb = int(cb.sum()), int(cc.sum())
    if na == 0 or nb == 0:
        js = 0.0
    else:
        p = cb.astype(np.float64) / na
        q = cc.astype(np.float64) / nb
        m = (p + q) / 2.0
        pm, qm = p > 0, q > 0
        js = 0.5 * float(np.sum(p[pm] * np.log(p[pm] / m[pm]))) + 0.5 * float(
            np.sum(q[qm] * np.log(q[qm] / m[qm]))
        )
    return pa.table(
        {
            "n_base": pa.array([na], pa.int64()),
            "n_current": pa.array([nb], pa.int64()),
            "js_value": pa.array([round(js, 6)], pa.float64()),
        }
    )


def ks_by_group(
    source_base: Any,
    source_current: Any,
    value_col: str,
    group_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Any:
    """Per-group EXACT two-sample KS — :func:`ks_exact` keyed by a
    group column (the sliced sibling of :func:`psi_by_group`, for
    continuous columns where fixed bins are awkward).

    Scale shape differs from the global tier: a group's values must be
    co-resident to take its exact ECDF, so each side reduces per batch
    to tidy ``(group, value, side-count)`` DISTINCT partials and ONE
    bucketed groupby on the group key runs a vectorized
    sort + per-value sum + cumsum sweep per group segment. Exchange is
    per-batch-distinct (value, group) pairs — integer-ish columns stay
    tiny; continuous columns are O(rows) like the global tier's
    default (quantize upstream if that matters). Partitioning
    assumption: one GROUP's distinct values fit a worker. One-sided
    groups get KS = 1 by convention (empty ECDF differs everywhere);
    NULL groups/values drop.

    Returns a Dataset of ``(group, n_base, n_current, ks_value)``
    (rounded to 6)."""
    import pandas as pd

    from ..pipelines.dedup import _as_dataset, bucketed_groupby

    def side_partials(src: Any, side: int):
        mine, other = ("ca", "cb") if side == 0 else ("cb", "ca")

        def partials(batch: pa.Table) -> pa.Table:
            t = batch.select([group_col, value_col])
            t = t.filter(
                pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[value_col]))
            )
            g = t[group_col].combine_chunks()
            codes, uniq = pd.factorize(g.to_pandas(), sort=True)
            vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            pair = np.empty(len(vals), dtype=[("g", np.int64), ("v", np.float64)])
            pair["g"], pair["v"] = codes, vals
            up, cnt = np.unique(pair, return_counts=True)
            return pa.table(
                {
                    group_col: pa.array(np.asarray(uniq)[up["g"]]),
                    "v": pa.array(up["v"], pa.float64()),
                    mine: pa.array(cnt.astype(np.int64), pa.int64()),
                    other: pa.array(np.zeros(len(cnt), np.int64), pa.int64()),
                }
            ).select([group_col, "v", "ca", "cb"])

        ds = _as_dataset(src, columns=[group_col, value_col])
        return ds.map_batches(
            partials, batch_format="pyarrow", batch_size=batch_size
        )

    tidy = side_partials(source_base, 0).union(side_partials(source_current, 1))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gval, g in df.groupby(group_col, sort=True):
            agg = g.groupby("v", sort=True)[["ca", "cb"]].sum()
            na, nb_ = int(agg["ca"].sum()), int(agg["cb"].sum())
            if na == 0 or nb_ == 0:
                ks = 1.0 if (na or nb_) else 0.0
            else:
                fa = np.cumsum(agg["ca"].to_numpy(np.int64)) / na
                fb = np.cumsum(agg["cb"].to_numpy(np.int64)) / nb_
                ks = float(np.max(np.abs(fa - fb)))
            rows.append((gval, na, nb_, round(ks, 6)))
        return pd.DataFrame(
            rows, columns=[group_col, "n_base", "n_current", "ks_value"]
        )

    return bucketed_groupby(tidy, [group_col], per_bucket, num_buckets=num_buckets)


def psi_by_group(
    source_base: Any,
    source_current: Any,
    value_col: str,
    group_col: str,
    edges: List[float],
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "pa.Table | Any":
    """Per-group fixed-bin PSI — :func:`psi_fixed_bins` keyed by a
    group column (per-language / per-domain / per-source drift
    monitoring: one global PSI hides a shift confined to one slice).

    Scale shape: each side reduces per batch to tidy
    ``(group, bin, side, cnt)`` partial rows — the exchange is bounded
    by groups × bins per batch, never row count; one bucketed groupby
    on the group key computes every group's clip(1e-6)+renormalize PSI
    in a single vectorized sweep per bucket. Groups are the OBSERVED
    union of both sides: a group absent from one side gets that side's
    counts all-zero (clipped), i.e. maximal drift — exactly the signal
    a new/vanished slice should raise. NULL group keys drop (SQL
    GROUP BY convention would keep them; documented difference) and
    NULL values drop.

    Returns a Dataset of ``(group, n_base, n_current, psi_value)``
    (psi rounded to 6)."""
    import pandas as pd

    from ..pipelines.dedup import _as_dataset, bucketed_groupby

    e = np.asarray(edges, dtype=np.float64)
    n_bins = len(e) + 1

    def side_partials(src: Any, side: int):
        def partials(batch: pa.Table) -> pa.Table:
            t = batch.select([group_col, value_col])
            t = t.filter(
                pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[value_col]))
            )
            if t.num_rows == 0:
                return pa.table(
                    {
                        group_col: pa.array([], t.schema.field(group_col).type),
                        "bin": pa.array([], pa.int64()),
                        "side": pa.array([], pa.int8()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            g = t[group_col].combine_chunks()
            codes, uniq = pd.factorize(g.to_pandas(), sort=True)
            vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            bins = np.searchsorted(e, vals, side="right")
            flat = codes.astype(np.int64) * n_bins + bins
            cnt2d = np.bincount(flat, minlength=len(uniq) * n_bins)
            gi, bi = np.nonzero(cnt2d.reshape(len(uniq), n_bins))
            return pa.table(
                {
                    group_col: pa.array(np.asarray(uniq)[gi]),
                    "bin": pa.array(bi.astype(np.int64), pa.int64()),
                    "side": pa.array(
                        np.full(len(gi), side, np.int8), pa.int8()
                    ),
                    "cnt": pa.array(
                        cnt2d.reshape(len(uniq), n_bins)[gi, bi].astype(
                            np.int64
                        ),
                        pa.int64(),
                    ),
                }
            )

        ds = _as_dataset(src, columns=[group_col, value_col])
        return ds.map_batches(
            partials, batch_format="pyarrow", batch_size=batch_size
        )

    tidy = side_partials(source_base, 0).union(side_partials(source_current, 1))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for gval, g in df.groupby(group_col, sort=True):
            counts = np.full((2, n_bins), 0.0)
            np.add.at(
                counts,
                (g["side"].to_numpy(np.int64), g["bin"].to_numpy(np.int64)),
                g["cnt"].to_numpy(np.float64),
            )
            nb, nc = counts[0].sum(), counts[1].sum()
            out_rows.append(
                (gval, int(nb), int(nc), round(psi(counts[0], counts[1]), 6))
            )
        return pd.DataFrame(
            out_rows, columns=[group_col, "n_base", "n_current", "psi_value"]
        )

    return bucketed_groupby(tidy, [group_col], per_bucket, num_buckets=num_buckets)


def _distinct_prefix_scan(
    source_base: Any,
    source_current: Any,
    value_col: str,
    *,
    num_buckets: int,
    batch_size: int,
    quantize: Optional[float],
):
    """Shared steps 1–3 of the exact two-sample ECDF statistics
    (:func:`ks_exact`, :func:`wasserstein_exact`): per-side distinct
    ``(value, count)`` partials, union with separate count columns,
    range-partition into ``num_buckets`` on sampled quantile bounds,
    and a per-bucket ``groupby.aggregate(Sum)``.

    Returns ``(bucketed_dataset, sums_df, na, nb)`` where ``sums_df``
    is the per-bucket count frame sorted by ``__bucket`` and
    ``na``/``nb`` are the side totals. Equal values never split across
    buckets (bucket id comes from ``searchsorted`` on value), so any
    per-bucket cumulative statistic composes exactly with the driver's
    bucket-order prefix offsets.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..pipelines.curation import KNUTH
    from ..pipelines.dedup import _as_dataset

    def side_partials(src: Any, side: int):
        other = "cb" if side == 0 else "ca"
        mine = "ca" if side == 0 else "cb"

        def partials(batch: pa.Table) -> pa.Table:
            vals = _numeric_values(batch, value_col)
            if quantize is not None:
                vals = np.round(vals / quantize) * quantize
            uniq, cnt = np.unique(vals, return_counts=True)
            return pa.table(
                {
                    "v": pa.array(uniq, pa.float64()),
                    mine: pa.array(cnt.astype(np.int64), pa.int64()),
                    other: pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
                }
            ).select(["v", "ca", "cb"])

        ds = _as_dataset(src, columns=[value_col])
        return ds.map_batches(
            partials, batch_format="pyarrow", batch_size=batch_size
        )

    cnts = side_partials(source_base, 0).union(
        side_partials(source_current, 1)
    ).materialize()

    # deterministic ~1/1024 sample of distinct values → quantile bounds
    def sample_vals(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        h = (v.view(np.int64) * np.int64(KNUTH)) % 1024
        return pa.table({"v": pa.array(v[h == 0], pa.float64())})

    sdf = cnts.map_batches(sample_vals, batch_format="pyarrow").to_pandas()
    sampled = (
        np.sort(sdf["v"].to_numpy(np.float64))
        if "v" in sdf.columns and len(sdf)
        else np.empty(0, np.float64)
    )
    if len(sampled) > 1:
        q = np.linspace(0, len(sampled) - 1, num_buckets + 1)[1:-1]
        bounds = np.unique(sampled[q.astype(np.int64)])
    else:
        bounds = np.empty(0, np.float64)
    bounds_ref = ray.put(bounds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b_ = ray.get(bounds_ref)
        v = batch["v"].to_numpy(zero_copy_only=False)
        bkt = np.searchsorted(b_, v, side="right").astype(np.int64)
        return batch.append_column("__bucket", pa.array(bkt, pa.int64()))

    bucketed = cnts.map_batches(add_bucket, batch_format="pyarrow")

    sums = (
        bucketed.groupby("__bucket")
        .aggregate(Sum("ca", alias_name="sa"), Sum("cb", alias_name="sb"))
        .to_pandas()
        .sort_values("__bucket")
    )
    na = int(sums["sa"].to_numpy(np.int64).sum())
    nb = int(sums["sb"].to_numpy(np.int64).sum())
    return bucketed, sums, na, nb


def choose_auto_quantize(
    source_base: Any,
    source_current: Any,
    value_col: str,
    *,
    batch_size: int = 64 * 1024,
    distinct_threshold: int = 1 << 22,
    grid: int = 1 << 20,
) -> Optional[float]:
    """Deterministic quantization step for the exact ECDF statistics'
    ``quantize="auto"`` mode: ONE cheap pass over both sides reduces
    each batch to a ~1/4096 hash-sample of its DISTINCT values (KMV
    shape — the driver holds ≈ distinct/4096 floats); the union
    sample's size × 4096 estimates the true distinct count. At or
    under ``distinct_threshold`` (default 4.2M — the regime where the
    exact path's distinct partials are cheap) returns ``None`` (run
    bit-exact); above it returns ``q = sampled_range / grid`` so the
    quantized domain has ~``grid`` lattice points regardless of corpus
    size. Error bound (documented in :func:`ks_exact`): each value
    moves ≤ q/2, so KS shifts by at most the largest probability mass
    either sample puts in any width-q interval; with the default 2^20
    grid that is ~2^-20 of the bulk range per lattice step."""
    from ..pipelines.curation import KNUTH
    from ..pipelines.dedup import _as_dataset

    def sample(batch: pa.Table) -> pa.Table:
        vals = _numeric_values(batch, value_col)
        u = np.unique(vals)
        h = (u.view(np.int64) * np.int64(KNUTH)) % 4096
        return pa.table({"v": pa.array(u[h == 0], pa.float64())})

    parts = []
    for src in (source_base, source_current):
        sdf = (
            _as_dataset(src, columns=[value_col])
            .map_batches(sample, batch_format="pyarrow", batch_size=batch_size)
            .to_pandas()
        )
        if "v" in sdf.columns and len(sdf):
            parts.append(sdf["v"].to_numpy(np.float64))
    if not parts:
        return None
    u = np.unique(np.concatenate(parts))
    est_distinct = len(u) * 4096
    if est_distinct <= distinct_threshold or len(u) < 2:
        return None
    rng = float(u[-1] - u[0])
    if not np.isfinite(rng) or rng <= 0.0:
        return None
    return rng / float(grid)


def ks_exact(
    source_base: Any,
    source_current: Any,
    value_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
    quantize: "Optional[float] | str" = None,
) -> "pa.Table":
    """EXACT two-sample Kolmogorov-Smirnov statistic
    ``max_x |ECDF_base(x) − ECDF_current(x)|`` — the oracle-exact
    sibling of the t-digest :func:`ks_stat` tier.

    The global ECDF needs a cumulative count over sorted values — an
    all-to-all at heart — so this runs the same distributed two-pass
    prefix scan as ``pack_shards`` (`curation.py`), but over VALUES:

    1. per side, one streaming pass reduces each batch to distinct
       ``(value, count)`` partials (exchange is per-batch-distinct
       bounded, 12 bytes/row); sides union with separate count
       columns;
    2. values range-partition into ``num_buckets`` buckets on sampled
       quantile boundaries (equal values can never split across
       buckets — bucket id comes from ``searchsorted`` on value);
    3. ``groupby(bucket).aggregate(Sum)`` → #buckets rows; the driver
       takes per-side exclusive prefix counts in bucket order and
       broadcasts them via ``ray.put``;
    4. ``groupby(bucket).map_groups``: ONE vectorized
       sort + per-value sum + cumsum per bucket; each cumulative
       count plus the bucket's global offset yields the two ECDFs at
       every distinct value in the bucket — one ``(bucket, local max
       |Fa−Fb|)`` row comes back.

    ECDF divisions are ``int64 cumulative / int64 total`` in float64 —
    bit-identical to a SQL ``SUM(...) OVER (ORDER BY v) / COUNT(*)``
    oracle, and independent of the (sampling-chosen) bucket layout,
    so reruns are byte-stable. NULLs drop. Returns a one-row table:
    ``n_base, n_current, ks_value`` (rounded to 6).

    **Continuous-column caveat**: step 1's exchange is bounded by
    per-batch DISTINCT values — for an integer-ish column that is tiny,
    but for a continuous float column per-batch-distinct ≈ batch size,
    so the materialized partials are O(rows) (object-store-resident and
    spillable, but real). Set ``quantize=q`` to snap values to the
    nearest multiple of ``q`` first (``round(v/q)·q``): the statistic
    is then EXACT for the quantized distributions, and differs from the
    raw statistic by at most the largest probability mass either sample
    places within any half-open interval of width ``q`` (each value
    moves ≤ q/2) — pick ``q`` well under the distribution's scale and
    the drift-alert margin. ``quantize=None`` (default) is bit-exact vs
    the SQL oracle. ``quantize="auto"`` engages the quantized tier ONLY
    above a distinct-count threshold: :func:`choose_auto_quantize`
    KMV-estimates the union's distinct count from one cheap sampled
    pass; at or under ~4.2M distinct it runs bit-exact (q=None), above
    it snaps to a deterministic ~2^20-point lattice over the sampled
    range — so integer-ish columns stay oracle-exact and continuous
    web-scale columns get the bounded-exchange tier automatically.
    """
    import pandas as pd
    import ray

    if isinstance(quantize, str):
        if quantize != "auto":
            raise ValueError(f"quantize must be a float, None or 'auto', got {quantize!r}")
        quantize = choose_auto_quantize(
            source_base, source_current, value_col, batch_size=batch_size
        )

    bucketed, sums, na, nb = _distinct_prefix_scan(
        source_base,
        source_current,
        value_col,
        num_buckets=num_buckets,
        batch_size=batch_size,
        quantize=quantize,
    )
    sa = sums["sa"].to_numpy(np.int64)
    sb = sums["sb"].to_numpy(np.int64)
    if na == 0 or nb == 0:
        return pa.table(
            {
                "n_base": pa.array([na], pa.int64()),
                "n_current": pa.array([nb], pa.int64()),
                "ks_value": pa.array([0.0], pa.float64()),
            }
        )
    offs = {
        int(b): (int(oa), int(ob))
        for b, oa, ob in zip(
            sums["__bucket"].to_numpy(np.int64),
            np.concatenate([[0], np.cumsum(sa)[:-1]]),
            np.concatenate([[0], np.cumsum(sb)[:-1]]),
        )
    }
    offs_ref = ray.put(offs)

    def bucket_max(group: pd.DataFrame) -> pd.DataFrame:
        omap = ray.get(offs_ref)
        oa, ob = omap[int(group["__bucket"].iloc[0])]
        g = (
            group.groupby("v", sort=True)[["ca", "cb"]]
            .sum()
            .reset_index()
        )
        fa = (oa + g["ca"].to_numpy(np.int64).cumsum()) / na
        fb = (ob + g["cb"].to_numpy(np.int64).cumsum()) / nb
        return pd.DataFrame({"d": [float(np.max(np.abs(fa - fb)))]})

    dmax = (
        bucketed.groupby("__bucket")
        .map_groups(bucket_max, batch_format="pandas")
        .to_pandas()["d"]
        .max()
    )
    return pa.table(
        {
            "n_base": pa.array([na], pa.int64()),
            "n_current": pa.array([nb], pa.int64()),
            "ks_value": pa.array([round(float(dmax), 6)], pa.float64()),
        }
    )


def wasserstein_exact(
    source_base: Any,
    source_current: Any,
    value_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
    quantize: "Optional[float] | str" = None,
) -> "pa.Table":
    """EXACT 1-D Wasserstein-1 (earth-mover) distance between two
    empirical distributions — the magnitude-aware sibling of
    :func:`ks_exact` (KS says *whether* the CDFs diverge; W1 says *how
    much probability mass moved how far*, in the column's own units,
    which is the drift quantity a retraining trigger actually wants).

    For 1-D empirical distributions W1 has the closed form

        W1 = ∫ |F_base(x) − F_current(x)| dx
           = Σ_i |F_base(v_i) − F_current(v_i)| · (v_{i+1} − v_i)

    over the sorted distinct values of the union sample — exactly the
    prefix-scan shape :func:`_distinct_prefix_scan` already computes
    for KS. Per bucket, ONE vectorized sort + cumsum yields the two
    ECDFs at every distinct value and the in-bucket segment sum; the
    boundary segment between consecutive buckets (bucket k's last
    value → bucket k+1's first value) is settled on the driver from
    the per-bucket inclusive prefix counts it already holds, so the
    result is independent of the sampled bucket layout.

    Each term is ``abs(int64_cum/na − int64_cum/nb) · (v_next − v)``
    in float64 — term-identical to a SQL
    ``SUM(ABS(cca/na − ccb/nb) * (nxt − v))`` window oracle; only the
    association order of the final sum differs (ROUND 6 absorbs it).
    NULLs drop. ``quantize`` snaps values to the q-grid first with the
    same error envelope as :func:`ks_exact` (each value moves ≤ q/2,
    so W1 itself moves ≤ q/2 per side); ``quantize="auto"`` picks the
    step via :func:`choose_auto_quantize` exactly as in
    :func:`ks_exact` (bit-exact at or under the distinct threshold).
    Returns one row: ``(n_base, n_current, emd_value)``.

    Reference has no drift machinery (module docstring); net-new.
    """
    import pandas as pd
    import ray

    if isinstance(quantize, str):
        if quantize != "auto":
            raise ValueError(f"quantize must be a float, None or 'auto', got {quantize!r}")
        quantize = choose_auto_quantize(
            source_base, source_current, value_col, batch_size=batch_size
        )

    bucketed, sums, na, nb = _distinct_prefix_scan(
        source_base,
        source_current,
        value_col,
        num_buckets=num_buckets,
        batch_size=batch_size,
        quantize=quantize,
    )
    if na == 0 or nb == 0:
        return pa.table(
            {
                "n_base": pa.array([na], pa.int64()),
                "n_current": pa.array([nb], pa.int64()),
                "emd_value": pa.array([0.0], pa.float64()),
            }
        )
    sa = sums["sa"].to_numpy(np.int64)
    sb = sums["sb"].to_numpy(np.int64)
    bids = sums["__bucket"].to_numpy(np.int64)
    offs = {
        int(b): (int(oa), int(ob))
        for b, oa, ob in zip(
            bids,
            np.concatenate([[0], np.cumsum(sa)[:-1]]),
            np.concatenate([[0], np.cumsum(sb)[:-1]]),
        )
    }
    offs_ref = ray.put(offs)

    def bucket_part(group: pd.DataFrame) -> pd.DataFrame:
        omap = ray.get(offs_ref)
        bkt = int(group["__bucket"].iloc[0])
        oa, ob = omap[bkt]
        g = (
            group.groupby("v", sort=True)[["ca", "cb"]]
            .sum()
            .reset_index()
        )
        v = g["v"].to_numpy(np.float64)
        fa = (oa + g["ca"].to_numpy(np.int64).cumsum()) / na
        fb = (ob + g["cb"].to_numpy(np.int64).cumsum()) / nb
        part = (
            float(np.sum(np.abs(fa - fb)[:-1] * np.diff(v)))
            if len(v) > 1
            else 0.0
        )
        return pd.DataFrame(
            {
                "__bucket": [bkt],
                "part": [part],
                "v_first": [float(v[0])],
                "v_last": [float(v[-1])],
            }
        )

    parts = (
        bucketed.groupby("__bucket")
        .map_groups(bucket_part, batch_format="pandas")
        .to_pandas()
        .sort_values("__bucket")
        .reset_index(drop=True)
    )
    total = float(parts["part"].sum())
    if len(parts) > 1:
        # boundary segments: ECDFs are flat between bucket k's last
        # value and bucket k+1's first value at the inclusive prefix
        # counts, which the driver already has.
        order = np.argsort(bids)
        ia = np.cumsum(sa[order]).astype(np.int64)
        ib = np.cumsum(sb[order]).astype(np.int64)
        dend = np.abs(ia[:-1] / na - ib[:-1] / nb)
        gaps = (
            parts["v_first"].to_numpy(np.float64)[1:]
            - parts["v_last"].to_numpy(np.float64)[:-1]
        )
        total += float(np.sum(dend * gaps))
    return pa.table(
        {
            "n_base": pa.array([na], pa.int64()),
            "n_current": pa.array([nb], pa.int64()),
            "emd_value": pa.array([round(total, 6)], pa.float64()),
        }
    )


def chi2_categorical(
    source_base: Any,
    source_current: Any,
    cat_col: str,
    *,
    batch_size: int = 64 * 1024,
) -> "pa.Table":
    """Pearson chi-squared two-sample homogeneity test over a
    CATEGORICAL column — the categorical sibling of
    :func:`psi_fixed_bins` (language mix, domain mix, event-type mix
    drift between a baseline corpus and a new crawl; PSI needs numeric
    bins, chi2 works on the observed category set directly).

    Scale shape: each side reduces per batch to tidy
    ``(category, count)`` partials via ``pc.value_counts`` — the
    exchange is bounded by distinct categories per batch, never row
    count — and the driver merges the (categories × 2) contingency
    table and applies the textbook statistic with expected counts
    ``E[side, cat] = n_side · n_cat / n``. Categories observed on only
    one side contribute their full expected-count deviation (a
    new/vanished category is maximal drift signal). NULL categories
    drop on both sides.

    Returns a one-row table ``(n_base, n_current, n_categories, dof,
    chi2_value)`` — chi2 rounded to 6 (the engine's float-hash
    convention). Reference has no drift machinery (see module
    docstring); net-new operator.
    """
    import pandas as pd

    from ..pipelines.dedup import _as_dataset

    def side_counts(src: Any) -> "pd.Series":
        def partials(batch: pa.Table) -> pa.Table:
            col = batch[cat_col].combine_chunks()
            col = col.filter(pc.is_valid(col))
            vc = pc.value_counts(col)
            return pa.table(
                {
                    "cat": vc.field("values"),
                    "cnt": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        ds = _as_dataset(src, columns=[cat_col])
        part = ds.map_batches(
            partials, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        if not len(part):
            return pd.Series(dtype=np.int64)
        return part.groupby("cat", sort=True)["cnt"].sum()

    ca = side_counts(source_base)
    cb = side_counts(source_current)
    tab = pd.DataFrame({"ca": ca, "cb": cb}).fillna(0).astype(np.int64)
    na, nb = int(tab["ca"].sum()), int(tab["cb"].sum())
    n = na + nb
    k = len(tab)
    if n == 0 or k < 2 or na == 0 or nb == 0:
        chi2 = 0.0
    else:
        tot = (tab["ca"] + tab["cb"]).to_numpy(np.float64)
        ea = na * tot / n
        eb = nb * tot / n
        chi2 = float(
            ((tab["ca"].to_numpy(np.float64) - ea) ** 2 / ea).sum()
            + ((tab["cb"].to_numpy(np.float64) - eb) ** 2 / eb).sum()
        )
    return pa.table(
        {
            "n_base": pa.array([na], pa.int64()),
            "n_current": pa.array([nb], pa.int64()),
            "n_categories": pa.array([k], pa.int64()),
            "dof": pa.array([max(k - 1, 0)], pa.int64()),
            "chi2_value": pa.array([round(chi2, 6)], pa.float64()),
        }
    )


def partition_anomaly(
    source: Any,
    value_col: str,
    key_col: str,
    *,
    num_partitions: int = 16,
    mad_k: float = 3.0,
    batch_size: int = 64 * 1024,
) -> "pa.Table":
    """Per-partition metric profile + robust anomaly flags — the
    cross-partition consistency check a 100-TB validation run needs on
    top of per-partition verdicts: a partition whose mean or null-rate
    deviates from the corpus median by more than ``mad_k`` × MAD
    (median absolute deviation) is flagged, catching a bad shard /
    skewed source file that every within-partition rule would pass.

    Rows hash into ``num_partitions`` partitions on ``key_col`` (the
    stand-in for file/shard id; pass a real partition column with
    ``num_partitions`` ≥ its cardinality to profile natural shards).
    Scale shape: ONE streaming pass reduces each batch to
    ``num_partitions`` rows of (count, null-count, sum) partials —
    exchange is partitions × batches, never row count; the driver
    holds only the partitions × 3 table, takes medians, and flags.

    All floats are rounded to 6 BEFORE the threshold comparison so the
    flag itself is reproducible bit-exactly against a SQL oracle (a
    raw float compare could flip on accumulation-order noise exactly
    at the boundary). NULL keys drop; NULL values count into
    null-rate but not the mean.

    Returns ``(partition, n, null_rate, mean_value, dev_mean,
    dev_null_rate, is_anomaly)`` sorted by partition. Net-new operator
    (no reference analogue).
    """
    from ..pipelines.dedup import _as_dataset

    P = int(num_partitions)

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, value_col])
        t = t.filter(pc.is_valid(t[key_col]))
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = keys % P
        col = t[value_col].combine_chunks()
        vals = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
        isnull = ~pc.is_valid(col).to_numpy(zero_copy_only=False)
        n = np.bincount(part, minlength=P)
        nn = np.bincount(part[isnull], minlength=P)
        s = np.bincount(
            part[~isnull], weights=vals[~isnull], minlength=P
        )
        return pa.table(
            {
                "partition": pa.array(np.arange(P, dtype=np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "nn": pa.array(nn.astype(np.int64)),
                "s": pa.array(s, pa.float64()),
            }
        )

    ds = _as_dataset(source, columns=[key_col, value_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    agg = part.groupby("partition", sort=True).agg(
        n=("n", "sum"), nn=("nn", "sum"), s=("s", "sum")
    )
    agg = agg[agg["n"] > 0]
    n = agg["n"].to_numpy(np.int64)
    nn = agg["nn"].to_numpy(np.int64)
    mean = np.round(agg["s"].to_numpy(np.float64) / np.maximum(n - nn, 1), 6)
    null_rate = np.round(nn / n, 6)

    def devs(x: np.ndarray) -> "tuple[np.ndarray, float]":
        med = np.median(x)
        d = np.round(np.abs(x - med), 6)
        # single rounding at the threshold (round(mad,6) first would
        # double-round and can flip the flag vs the SQL formulation)
        return d, float(np.median(d))

    dm, mad_m = devs(mean)
    dn, mad_n = devs(null_rate)
    thr_m = round(mad_k * mad_m, 6)
    thr_n = round(mad_k * mad_n, 6)
    flag = (dm > thr_m) | (dn > thr_n)
    return pa.table(
        {
            "partition": pa.array(agg.index.to_numpy(np.int64)),
            "n": pa.array(n),
            "null_rate": pa.array(null_rate, pa.float64()),
            "mean_value": pa.array(mean, pa.float64()),
            "dev_mean": pa.array(dm, pa.float64()),
            "dev_null_rate": pa.array(dn, pa.float64()),
            "is_anomaly": pa.array(flag),
        }
    )
