"""Column-profiling operators: frequent values (exact and sketched)
and equi-width histograms. No reference analogue — these are the
"what is in this column" primitives a 100-TB curation pipeline runs
before choosing filters (reference scope: data quality checks,
/root/reference/src/data_validator/validator.py; profiling is the
natural pre-step the reference leaves to the user).

Scale shapes:

* :func:`top_values` — EXACT heavy hitters. Per-batch pyarrow
  ``group_by`` collapses each batch to its distinct values (the
  combiner), the global groupby then moves one row per (value, batch)
  — bounded by batch-distincts, never raw rows. Exchange is
  distinct-bounded: right for moderate-cardinality columns (status
  codes, languages, domains). For unbounded-cardinality columns use
  :func:`misra_gries_topk`.
* :func:`misra_gries_topk` — the sketch tier. Each batch compresses
  to ≤ ``capacity`` (value, count) counters via the one-shot
  Misra-Gries decrement (subtract the (capacity+1)-th largest count,
  keep positives), so the exchange is capacity × #batches rows no
  matter the column's cardinality. Merged counts are lower bounds;
  the summed decrements give the per-value upper bound. Any value
  with true frequency > n/(capacity+1) is guaranteed present.
* :func:`histogram` — fixed equi-width bins, one ``np.bincount`` per
  batch (the combiner), then a tiny groupby over (bin, count)
  partials. Out-of-range values drop (explicit contract); emit only
  non-empty bins.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _as_dataset

Dataset = ray.data.Dataset


def top_values(
    source: Any,
    column: str,
    *,
    k: int = 10,
    drop_null: bool = True,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Exact top-k most frequent values of ``column``:
    ``(value, n)`` sorted by count desc, value asc (deterministic
    tie-break). NULLs drop by default.

    Two-level exact count: in-batch ``group_by`` combiner → global
    groupby sum → sort → limit k. The limit is applied after the
    global sort (k is tiny; the sort input is one row per distinct
    value)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.select([column])
        if drop_null:
            col = col.filter(pc.is_valid(col[column]))
        g = col.group_by(column).aggregate([([], "count_all")])
        return g.rename_columns(["value", "n"])

    ds = _as_dataset(source, columns=[column])
    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("value")
        .sum("n")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "value": batch["value"],
                "n": pc.cast(batch["sum(n)"], pa.int64()),
            }
        )

    return (
        merged.map_batches(finalize, batch_format="pyarrow")
        .sort(["n", "value"], descending=[True, False])
        .limit(k)
    )


def misra_gries_topk(
    source: Any,
    column: str,
    *,
    k: int = 10,
    capacity: int = 256,
    batch_size: int = 64 * 1024,
) -> "pa.Table":
    """Approximate top-k frequent values with a mergeable Misra-Gries
    summary: exchange is ≤ ``capacity`` rows per batch regardless of
    the column's cardinality (the scale tier for unbounded-cardinality
    columns, where :func:`top_values` would shuffle every distinct).

    Returns a small arrow table ``(value, est_count, upper_bound)``:
    ``est_count`` never overestimates, ``upper_bound = est_count +
    total decrement`` never underestimates, and any value with true
    count > n/(capacity+1) per batch is guaranteed to survive. Ties
    break by value for determinism.
    """

    def partial_with_sentinel(batch: pa.Table) -> pa.Table:
        col = batch.select([column]).filter(pc.is_valid(batch[column]))
        g = col.group_by(column).aggregate([([], "count_all")])
        vals, counts = g[column], g["count_all"].to_numpy(zero_copy_only=False)
        delta = np.int64(0)
        if len(counts) > capacity:
            # one-shot Misra-Gries: subtract the (capacity+1)-th
            # largest count; ≤ capacity positives remain
            delta = np.partition(counts, -capacity - 1)[-capacity - 1]
            keep = counts > delta
            vals = vals.filter(pa.array(keep))
            counts = counts[keep] - delta
        # the batch's decrement rides as ONE sentinel row (value NULL)
        # so the global groupby can recover the total error bound
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        return pa.table(
            {
                "value": pa.concat_arrays(
                    [vals, pa.array([None], vals.type)]
                ),
                "est": pa.array(
                    np.append(counts.astype(np.int64), np.int64(delta)),
                    pa.int64(),
                ),
            }
        )

    ds = _as_dataset(source, columns=[column])
    merged = (
        ds.map_batches(
            partial_with_sentinel,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        .groupby("value")
        .sum("est")
        .to_pandas()  # ≤ capacity × #batches + #batches rows — tiny
    )
    null_mask = merged["value"].isna()
    total_delta = int(merged.loc[null_mask, "sum(est)"].sum())
    top = (
        merged.loc[~null_mask]
        .rename(columns={"sum(est)": "est_count"})
        .sort_values(
            ["est_count", "value"], ascending=[False, True], kind="stable"
        )
        .head(k)
        .reset_index(drop=True)
    )
    top["est_count"] = top["est_count"].astype(np.int64)
    top["upper_bound"] = top["est_count"] + total_delta
    return pa.Table.from_pandas(top, preserve_index=False)


def histogram(
    source: Any,
    column: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 32,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Equi-width histogram of a numeric column over ``[lo, hi)``:
    ``(bin_id, bin_lo, bin_hi, n)`` for non-empty bins. NULLs and
    out-of-range values drop (explicit contract — callers wanting
    clamped edge bins can pre-clip with an expression).

    One ``np.bincount`` per batch (the combiner: each batch collapses
    to ≤ n_bins rows), then a tiny global groupby."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    width = (hi - lo) / n_bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v < hi)]
        b = ((v - lo) / width).astype(np.int64)
        # float roundoff can push v==hi-eps into bin n_bins; clip
        np.clip(b, 0, n_bins - 1, out=b)
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin_id": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[column])
    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bin_id")
        .sum("n")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        b = batch["bin_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bin_id": pa.array(b, pa.int64()),
                "bin_lo": pa.array(lo + b * width, pa.float64()),
                "bin_hi": pa.array(lo + (b + 1) * width, pa.float64()),
                "n": pc.cast(batch["sum(n)"], pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow").sort("bin_id")


# --------------------------------------------------------------------------- #
# grouped statistical moments (mean / variance / correlation)                 #
# --------------------------------------------------------------------------- #


def histogram2d(
    source: Any,
    x_col: str,
    y_col: str,
    *,
    x_lo: float,
    x_hi: float,
    y_lo: float,
    y_hi: float,
    n_bins_x: int = 16,
    n_bins_y: int = 16,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Joint equi-width 2-D histogram (the density heatmap behind
    scatter-scale EDA and joint-drift checks): ``(bin_x, bin_y, n)``
    for non-empty cells. Rows with a NULL or out-of-range value in
    EITHER column drop (the 1-D :func:`histogram` contract, jointly).

    One flattened ``np.bincount`` over ``bin_x · n_bins_y + bin_y``
    per batch (the combiner — each batch collapses to ≤ cells rows),
    then a tiny global groupby. The SQL bin expression
    ``CAST(FLOOR((v − lo)/width) AS BIGINT)`` is evaluated in the same
    IEEE doubles, so cells are engine-exact."""
    if not (x_hi > x_lo and y_hi > y_lo):
        raise ValueError("hi must be > lo on both axes")
    wx = (x_hi - x_lo) / n_bins_x
    wy = (y_hi - y_lo) / n_bins_y
    n_cells = n_bins_x * n_bins_y

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = (
            ~np.isnan(x) & ~np.isnan(y)
            & (x >= x_lo) & (x < x_hi) & (y >= y_lo) & (y < y_hi)
        )
        bx = np.floor((x[ok] - x_lo) / wx).astype(np.int64)
        by = np.floor((y[ok] - y_lo) / wy).astype(np.int64)
        np.clip(bx, 0, n_bins_x - 1, out=bx)
        np.clip(by, 0, n_bins_y - 1, out=by)
        flat = bx * n_bins_y + by
        counts = np.bincount(flat, minlength=n_cells)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[x_col, y_col])
    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("cell")
        .sum("n")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bin_x": pa.array(c // n_bins_y, pa.int64()),
                "bin_y": pa.array(c % n_bins_y, pa.int64()),
                "n": pc.cast(batch["sum(n)"], pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def standardize_column(
    source: Any,
    value_col: str,
    *,
    method: str = "zscore",
    out_col: "str | None" = None,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Feature scaling (ML-prep): appends ``out_col`` (default
    ``{value_col}_std``) = the z-score ``(v − mean)/stddev_samp``
    (``method="zscore"``) or min-max ``(v − min)/(max − min)``
    (``method="minmax"``), rounded to 6 — the float-hash convention.
    NULLs stay NULL; a constant column (zero stddev / zero range)
    yields all-NULL scores, matching SQL's NULL-on-division-by-zero.

    Scale shape: TWO streaming passes — a mergeable-moments pass
    (n, Σx, Σx², min, max per batch; a handful of floats each, combined
    on the driver) and a broadcast-constants transform pass. Nothing
    shuffles; nothing materializes. Magnitude note: the sums-of-squares
    variance form matches :func:`grouped_stats` — center first for
    extreme means."""
    if method not in ("zscore", "minmax"):
        raise ValueError(f"method must be zscore|minmax, got {method!r}")
    name = out_col or f"{value_col}_std"

    def moments(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        v = ~np.isnan(x)
        x0 = np.where(v, x, 0.0)
        return pa.table(
            {
                "n": pa.array([int(v.sum())], pa.int64()),
                "s1": pa.array([float(x0.sum())], pa.float64()),
                "s2": pa.array([float((x0 * x0).sum())], pa.float64()),
                "mn": pa.array(
                    [float(x[v].min()) if v.any() else np.inf], pa.float64()
                ),
                "mx": pa.array(
                    [float(x[v].max()) if v.any() else -np.inf], pa.float64()
                ),
            }
        )

    ds = _as_dataset(source, columns=None)
    proj = _as_dataset(source, columns=[value_col])
    parts = proj.map_batches(
        moments, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()  # #batches rows of 5 scalars
    n = int(parts["n"].sum())
    s1, s2 = float(parts["s1"].sum()), float(parts["s2"].sum())
    mn, mx = float(parts["mn"].min()), float(parts["mx"].max())
    if method == "zscore":
        var = (s2 - s1 * s1 / n) / (n - 1) if n > 1 else 0.0
        scale = float(np.sqrt(var)) if var > 0 else 0.0
        center = s1 / n if n else 0.0
    else:
        center, scale = mn, mx - mn

    def transform(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        if scale > 0:
            z = np.round((x - center) / scale, 6)
        else:
            z = np.full(len(x), np.nan)
        return batch.append_column(name, pa.array(z, pa.float64()))

    return ds.map_batches(
        transform, batch_format="pyarrow", batch_size=batch_size
    )


def robust_scale_by_group(
    source: Any,
    group_col: str,
    value_col: str,
    *,
    out_col: "str | None" = None,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Per-group ROBUST feature scaling (ML-prep for heavy-tailed
    columns): appends ``out_col`` (default ``{value_col}_robust``) =
    ``(v − median_g) / (p75_g − p25_g)`` with the group's own exact
    continuous quantiles — outlier-insensitive where the z-score is
    not. Rounded to 6 (float-hash convention). NULL values stay NULL;
    a zero-IQR group (constant bulk) yields all-NULL scores (SQL
    NULL-on-division-by-zero); rows whose group key is NULL get NULL.

    Composition of existing scale-safe pieces: ONE
    :func:`.relational.grouped_exact_quantiles` shuffle produces the
    per-group (p25, p50, p75) table — #groups rows, collected and
    broadcast via ``ray.put`` — then one broadcast-lookup transform
    pass over the full stream (searchsorted on the sorted group keys;
    no second shuffle). Partitioning assumption: the quantile tier's
    (each group's values fit a worker); the constants table must fit
    the driver (#groups × 4 scalars)."""
    from .relational import grouped_exact_quantiles

    name = out_col or f"{value_col}_robust"
    qt = grouped_exact_quantiles(
        source, group_col, value_col, quantiles=(0.25, 0.5, 0.75),
        num_buckets=num_buckets, batch_size=batch_size,
    ).to_pandas()
    qt = qt.sort_values(group_col).reset_index(drop=True)
    keys = qt[group_col].to_numpy()
    med = qt["p50"].to_numpy(np.float64)
    iqr = qt["p75"].to_numpy(np.float64) - qt["p25"].to_numpy(np.float64)
    ref = ray.put((keys, med, iqr))

    def transform(batch: pa.Table) -> pa.Table:
        k_arr, m_arr, i_arr = ray.get(ref)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        z = np.full(len(x), np.nan)
        if len(k_arr):
            # NULL group keys can't be compared/searched — mask them
            # out and substitute a sentinel so searchsorted stays typed
            valid_g = pc.is_valid(batch[group_col]).to_numpy(
                zero_copy_only=False
            )
            g_safe = np.where(valid_g, g, k_arr[0])
            pos = np.searchsorted(k_arr, g_safe)
            pos_c = np.minimum(pos, len(k_arr) - 1)
            with np.errstate(invalid="ignore"):
                hit = (k_arr[pos_c] == g_safe) & valid_g
                ok = hit & ~np.isnan(x) & (i_arr[pos_c] > 0)
                z[ok] = np.round(
                    (x[ok] - m_arr[pos_c][ok]) / i_arr[pos_c][ok], 6
                )
        return batch.append_column(name, pa.array(z, pa.float64()))

    ds = _as_dataset(source, columns=None)
    return ds.map_batches(
        transform, batch_format="pyarrow", batch_size=batch_size
    )


def quantile_bucketize(
    source: Any,
    value_col: str,
    *,
    n_bins: int = 4,
    out_col: str = "bin",
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Quantile feature binning: appends ``out_col`` = the 1-based
    quantile bin of ``value_col`` (``n_bins=4`` → quartiles), where
    bin = 1 + #edges ≤ v and the edges are EXACT ``quantile_cont``
    values at k/n_bins — bit-exact vs DuckDB, so boundary comparisons
    agree with a SQL oracle. NULL values get NULL bins. Unlike NTILE
    (rank-based, splits ties), equal values always share a bin.

    Scale shape: edges come from the :func:`.relational.global_rank`
    prefix-scan (range partition + per-bucket counts — never a full
    sort or collect); only the ≤ 2·(n_bins−1) order-statistic rows
    reach the driver. The transform pass broadcasts the tiny edge
    array in-closure."""
    from .relational import global_rank

    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")

    def nonnull(batch: pa.Table) -> pa.Table:
        return batch.select([value_col]).filter(
            pc.is_valid(batch[value_col])
        )

    proj = _as_dataset(source, columns=[value_col])
    vals_ds = proj.map_batches(
        nonnull, batch_format="pyarrow", batch_size=batch_size
    )
    n = vals_ds.count()
    if n == 0:
        edges = np.array([], np.float64)
    else:
        qs = [k / n_bins for k in range(1, n_bins)]
        rns = [(n - 1) * q for q in qs]
        need = sorted(
            {int(np.floor(rn)) + 1 for rn in rns}
            | {int(np.ceil(rn)) + 1 for rn in rns}
        )
        ranked = global_rank(vals_ds, value_col)
        need_arr = pa.array(np.array(need, np.int64))
        picked = (
            ranked.map_batches(
                lambda b: b.filter(pc.is_in(b["rank"], value_set=need_arr)),
                batch_format="pyarrow",
            )
            .to_pandas()  # <= 2*(n_bins-1) rows
            .set_index("rank")[value_col]
        )
        edges = np.empty(len(qs), np.float64)
        for i, rn in enumerate(rns):
            frn, crn = int(np.floor(rn)), int(np.ceil(rn))
            lo = float(picked.loc[frn + 1])
            if crn == frn:
                edges[i] = lo
            else:
                hi = float(picked.loc[crn + 1])
                # DuckDB quantile_cont interpolation (bit-exact form)
                edges[i] = (crn - rn) * lo + (rn - frn) * hi

    def transform(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        valid = ~np.isnan(x)
        b = np.searchsorted(edges, x, side="right") + 1
        arr = pa.array(b.astype(np.int64), pa.int64(), mask=~valid)
        return batch.append_column(out_col, arr)

    ds = _as_dataset(source, columns=None)
    return ds.map_batches(
        transform, batch_format="pyarrow", batch_size=batch_size
    )


def grouped_stats(
    source: Any,
    key_cols: "list[str]",
    x_col: str,
    y_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Per-group one-pass statistical moments: ``n_x`` (non-null x),
    ``avg_x``, ``var_x`` (sample variance), and ``corr_xy`` (Pearson,
    over PAIRWISE-complete rows — SQL ``CORR`` ignores a row when
    either side is NULL, while ``AVG/VAR_SAMP`` ignore only their own
    column's NULLs; both conventions preserved). Floats rounded to 6;
    ``var_x`` NULL when n<2, ``corr_xy`` NULL on zero variance —
    DuckDB's conventions.

    Scale shape: each batch reduces to per-group moment sums via ONE
    pyarrow ``group_by`` (sums of x, x², y, xy, y² plus two counts —
    exchange is groups × batches, row-count-independent), merged by a
    null-safe bucketed groupby; the closed-form moments are evaluated
    per group at the end. Magnitude note: the sums-of-squares form is
    fine while ``n·var ≫ mean²·n·eps``; for extreme means, center the
    column first."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[x_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        y = pc.cast(batch[y_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        vx = ~np.isnan(x)
        vp = vx & ~np.isnan(y)
        x0 = np.where(vx, x, 0.0)
        xp = np.where(vp, x, 0.0)
        yp = np.where(vp, y, 0.0)
        t = pa.table(
            {
                **{c: batch[c] for c in key_cols},
                "__nx": pa.array(vx.astype(np.int64)),
                "__sx": pa.array(x0),
                "__sxx": pa.array(x0 * x0),
                "__np": pa.array(vp.astype(np.int64)),
                "__px": pa.array(xp),
                "__py": pa.array(yp),
                "__pxx": pa.array(xp * xp),
                "__pyy": pa.array(yp * yp),
                "__pxy": pa.array(xp * yp),
            }
        )
        aggs = [(c, "sum") for c in t.column_names if c.startswith("__")]
        return t.group_by(key_cols).aggregate(aggs)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby(key_cols, dropna=False, sort=False)
            .sum(numeric_only=True)
            .reset_index()
        )
        nx = s["__nx_sum"].to_numpy(np.float64)
        sx, sxx = s["__sx_sum"].to_numpy(), s["__sxx_sum"].to_numpy()
        npair = s["__np_sum"].to_numpy(np.float64)
        px, py = s["__px_sum"].to_numpy(), s["__py_sum"].to_numpy()
        pxx, pyy = s["__pxx_sum"].to_numpy(), s["__pyy_sum"].to_numpy()
        pxy = s["__pxy_sum"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = sx / nx
            var = (sxx - sx * sx / nx) / (nx - 1)
            cnum = npair * pxy - px * py
            cden = np.sqrt(
                (npair * pxx - px * px) * (npair * pyy - py * py)
            )
            corr = cnum / cden
        out = s[key_cols].copy()
        out["n_x"] = s["__nx_sum"].to_numpy(np.int64)
        out["avg_x"] = np.where(nx > 0, np.round(avg, 6), np.nan)
        out["var_x"] = np.where(nx > 1, np.round(var, 6), np.nan)
        out["corr_xy"] = np.where(
            (npair > 1) & (cden > 0), np.round(corr, 6), np.nan
        )
        return out

    ds = _as_dataset(source, columns=[*key_cols, x_col, y_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        part, key_cols, merge,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def correlation_matrix(
    source: Any,
    cols: "list[str]",
    *,
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """All-pairs Pearson correlation over m numeric columns in ONE
    streaming pass — the feature-redundancy screen before model /
    mixture work. One row per unordered pair ``(col_a, col_b)`` with
    ``n_pairs`` (pairwise-complete count — SQL ``CORR`` NULL handling)
    and ``corr`` (ROUND 6; NULL when n < 2 or either side has zero
    variance — DuckDB conventions).

    Scale shape: each batch reduces to four m×m moment matrices via
    masked MATMULS (V=validity, X0=null-zeroed values: N=VᵀV, SX=X0ᵀV,
    SXY=X0ᵀX0, SXX=(X0∘X0)ᵀV — every pairwise-complete sum in four
    BLAS calls, no per-pair loop), shipped as m(m−1)/2 partial rows
    per batch; the global merge is a pair-bounded groupby sum and the
    closed form evaluates on the driver over m²/2 rows. Magnitude
    note: sums-of-squares form — center extreme-mean columns first.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    m = len(cols)
    if m < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    iu, ju = np.triu_indices(m, k=1)

    def partials(batch: pa.Table) -> pa.Table:
        X = np.empty((batch.num_rows, m), np.float64)
        for c_idx, c in enumerate(cols):
            X[:, c_idx] = pc.cast(batch[c], pa.float64()).to_numpy(
                zero_copy_only=False
            )
        V = (~np.isnan(X)).astype(np.float64)
        X0 = np.where(V > 0, X, 0.0)
        N = V.T @ V
        SX = X0.T @ V          # SX[i,j] = Σ x_i over rows valid_i&valid_j
        SXY = X0.T @ X0
        SXX = (X0 * X0).T @ V
        return pa.table(
            {
                "i": pa.array(iu, pa.int64()),
                "j": pa.array(ju, pa.int64()),
                "n": pa.array(N[iu, ju], pa.float64()),
                "sx": pa.array(SX[iu, ju], pa.float64()),
                "sy": pa.array(SX[ju, iu], pa.float64()),
                "sxx": pa.array(SXX[iu, ju], pa.float64()),
                "syy": pa.array(SXX[ju, iu], pa.float64()),
                "sxy": pa.array(SXY[iu, ju], pa.float64()),
            }
        )

    ds = _as_dataset(source, columns=list(cols))
    merged = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["i", "j"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()  # m²/2 rows
    )
    n = merged["n"].to_numpy(np.float64)
    sx, sy = merged["sx"].to_numpy(), merged["sy"].to_numpy()
    sxx, syy = merged["sxx"].to_numpy(), merged["syy"].to_numpy()
    sxy = merged["sxy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        # constant-column snap: a zero-variance column's n·sxx − sx²
        # cancels to a float residue ~n·eps relative, which would turn
        # the NULL corr into a garbage 0/tiny. Snap below 1e-9 relative
        # (std/mean < 3e-5 reads as constant — documented envelope,
        # same magnitude note as the sums-of-squares form itself).
        vx = np.where(vx <= 1e-9 * np.maximum(n * sxx, 1.0), 0.0, vx)
        vy = np.where(vy <= 1e-9 * np.maximum(n * syy, 1.0), 0.0, vy)
        corr = (n * sxy - sx * sy) / np.sqrt(vx * vy)
        corr = np.where((n >= 2) & (vx > 0) & (vy > 0),
                        np.round(corr, 6), np.nan)
    out = pd.DataFrame(
        {
            "col_a": [cols[int(i)] for i in merged["i"]],
            "col_b": [cols[int(j)] for j in merged["j"]],
            "n_pairs": n.astype(np.int64),
            "corr": corr,
        }
    )
    return out.sort_values(["col_a", "col_b"]).reset_index(drop=True)


def type_conformance_profile(
    source: Any,
    cols: "list[str]",
    *,
    ts_format: str = "%Y-%m-%d %H:%M:%S",
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """Type-inference / conformance profile of string columns — the
    dirty-ingestion "what could this column be" report that precedes
    a TRY_CAST migration: for each column, how many values are NULL,
    empty (after trim), integer-parseable, float-parseable, and
    timestamp-parseable. Shares the exact parse definitions of
    :func:`.relational.try_cast_columns` (RE2 ``[+-]?\\d{1,18}`` for
    int64, plain/scientific for float, ``strptime(error_is_null)`` for
    timestamps), so the profile predicts the cast outcome exactly and
    both are SQL-oracle-checkable with the same regexes.

    Scale shape: one streaming pass; each batch reduces to ONE row per
    column (Arrow regex/strptime kernels + sum), the merge is a
    K-column-bounded groupby sum."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .relational import _TRY_FLOAT_RE, _TRY_INT_RE

    def partials(batch: pa.Table) -> pa.Table:
        rows = {
            "column": [], "n": [], "n_null": [], "n_empty": [],
            "n_int": [], "n_float": [], "n_ts": [],
        }
        for c in cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
            valid = pc.is_valid(s)
            nonempty = pc.and_(valid, pc.not_equal(s, ""))

            def count(mask) -> int:
                return int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)

            is_int = pc.and_(
                nonempty, pc.fill_null(
                    pc.match_substring_regex(s, _TRY_INT_RE), False)
            )
            is_float = pc.and_(
                nonempty, pc.fill_null(
                    pc.match_substring_regex(s, _TRY_FLOAT_RE), False)
            )
            ts = pc.strptime(s, format=ts_format, unit="us",
                             error_is_null=True)
            is_ts = pc.and_(nonempty, pc.is_valid(ts))
            rows["column"].append(c)
            rows["n"].append(batch.num_rows)
            rows["n_null"].append(batch.num_rows - count(valid))
            rows["n_empty"].append(count(valid) - count(nonempty))
            rows["n_int"].append(count(is_int))
            rows["n_float"].append(count(is_float))
            rows["n_ts"].append(count(is_ts))
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                **{
                    k: pa.array(rows[k], pa.int64())
                    for k in ("n", "n_null", "n_empty", "n_int",
                              "n_float", "n_ts")
                },
            }
        )

    ds = _as_dataset(source, columns=list(cols))
    out = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby("column")
        .aggregate(
            *[
                Sum(k, alias_name=k)
                for k in ("n", "n_null", "n_empty", "n_int", "n_float", "n_ts")
            ]
        )
        .to_pandas()
    )
    for k in ("n", "n_null", "n_empty", "n_int", "n_float", "n_ts"):
        out[k] = out[k].astype(np.int64)
    return out.sort_values("column").reset_index(drop=True)


def grouped_weighted_stats(
    source: Any,
    key_cols: "list[str]",
    value_col: str,
    weight_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Per-group WEIGHTED statistics — the mixture-weighting /
    importance-sampling moment pass: ``n_pairs`` (rows where value AND
    weight are non-NULL — SQL pairwise semantics), ``weight_sum``,
    ``weighted_sum`` (Σ w·x) and ``weighted_mean`` (Σ w·x / Σ w), all
    ROUND 6; mean NULL when the group's weight sum is 0 or no pairs.

    Scale shape: per-batch pyarrow ``group_by`` moment partials (three
    sums + a count — exchange is groups × batches), null-safe bucketed
    merge, closed form at the end."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        w = pc.cast(batch[weight_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        vp = ~np.isnan(x) & ~np.isnan(w)
        wp = np.where(vp, w, 0.0)
        t = batch.select(key_cols).append_column(
            "__n", pa.array(vp.astype(np.int64))
        ).append_column(
            "__w", pa.array(wp, pa.float64())
        ).append_column(
            "__wx", pa.array(wp * np.where(vp, x, 0.0), pa.float64())
        )
        return t.group_by(key_cols).aggregate(
            [("__n", "sum"), ("__w", "sum"), ("__wx", "sum")]
        ).rename_columns([*key_cols, "__n", "__w", "__wx"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(key_cols, dropna=False, sort=False).sum().reset_index()
        n = agg["__n"].to_numpy(np.int64)
        wsum = agg["__w"].to_numpy(np.float64)
        wx = agg["__wx"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(
                (n > 0) & (wsum != 0), np.round(wx / wsum, 6), np.nan
            )
        out = agg[key_cols].copy()
        out["n_pairs"] = n
        out["weight_sum"] = np.round(wsum, 6)
        # millions: a raw Σw·x can reach 1e10+, where the 6th decimal
        # sits below float64 spacing and accumulation order would
        # decide the hash — rescale so round-6 is numerically real
        out["weighted_sum_m"] = np.round(wx / 1e6, 6)
        out["weighted_mean"] = mean
        return out

    ds = _as_dataset(source, columns=[*key_cols, value_col, weight_col])
    parts = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(parts, key_cols, per_bucket,
                            num_buckets=num_buckets, batch_size=batch_size)


def join_size_profile(
    a: Any,
    a_key: str,
    b: Any,
    b_key: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """Pre-join cardinality & skew report — answers "how big would this
    join be, and does one hot key dominate?" BEFORE paying for the
    shuffle: exact output row count Σₖ cₐ(k)·c_b(k), shared-key count,
    the hottest key's contribution, and ``skew_ratio`` = hottest /
    average contribution (unrounded integer-ratio division —
    bit-exact). NULL keys never join (SQL inner semantics).

    Scale shape: each side reduces to per-batch (key, count) partials
    (combiner — exchange is key-bounded, rows never move), ONE
    null-safe bucketed merge multiplies per-key counts, and the driver
    folds a handful of integers per bucket."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def side_partials(src: Any, key: str, side: int):
        def f(batch: pa.Table) -> pa.Table:
            col = batch.select([key])
            col = col.filter(pc.is_valid(col[key]))
            g = col.group_by([key]).aggregate([([], "count_all")])
            g = g.rename_columns(["k", "__cnt"])
            return g.append_column(
                "__side", pa.array(np.full(g.num_rows, side, np.int64))
            )

        return _as_dataset(src, columns=[key]).map_batches(
            f, batch_format="pyarrow", batch_size=batch_size
        )

    unioned = side_partials(a, a_key, 0).union(side_partials(b, b_key, 1))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            __ca=np.where(g["__side"].to_numpy() == 0,
                          g["__cnt"].to_numpy(), 0),
            __cb=np.where(g["__side"].to_numpy() == 1,
                          g["__cnt"].to_numpy(), 0),
        )
        agg = g.groupby("k", sort=False)[["__ca", "__cb"]].sum()
        pairs = agg["__ca"].to_numpy(np.int64) * agg["__cb"].to_numpy(np.int64)
        shared = pairs > 0
        if not shared.any():
            return pd.DataFrame(
                {"rows_out": [0], "shared_keys": [0], "max_key_rows": [0]}
            )
        return pd.DataFrame(
            {
                "rows_out": [int(pairs[shared].sum())],
                "shared_keys": [int(shared.sum())],
                "max_key_rows": [int(pairs.max())],
            }
        )

    folded = bucketed_groupby(
        unioned, ["k"], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    ).to_pandas()
    rows_out = int(folded["rows_out"].sum())
    shared = int(folded["shared_keys"].sum())
    max_rows = int(folded["max_key_rows"].max()) if len(folded) else 0
    skew = (
        max_rows / (rows_out / shared) if rows_out and shared else float("nan")
    )
    return pd.DataFrame(
        {
            "rows_out": pd.array([rows_out], dtype="int64"),
            "shared_keys": pd.array([shared], dtype="int64"),
            "max_key_rows": pd.array([max_rows], dtype="int64"),
            "skew_ratio": [skew],
        }
    )


def missingness_matrix(
    source: Any,
    cols: "list[str]",
    *,
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """Co-missingness profile — which columns are NULL TOGETHER (the
    structural-missingness screen: a sensor outage or join miss nulls
    whole column groups, random dirt doesn't): for every unordered
    column pair, ``n_both_null``, ``n_either_null`` and the null-
    overlap Jaccard (unrounded integer-ratio division, bit-exact; NULL
    when no row has either column null).

    Scale shape: one m×m matmul of the null-mask matrix per batch
    (plus per-column null counts), merged as m(m−1)/2 partial rows per
    batch — the :func:`correlation_matrix` pattern on bit masks."""
    import pandas as pd

    from ray.data.aggregate import Sum

    m = len(cols)
    if m < 2:
        raise ValueError("missingness_matrix needs >= 2 columns")
    iu, ju = np.triu_indices(m, k=1)

    def partials(batch: pa.Table) -> pa.Table:
        Nmask = np.empty((batch.num_rows, m), np.float64)
        for c_idx, c in enumerate(cols):
            Nmask[:, c_idx] = pc.is_null(batch[c]).to_numpy(
                zero_copy_only=False
            )
        both = Nmask.T @ Nmask
        col_nulls = Nmask.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(iu, pa.int64()),
                "j": pa.array(ju, pa.int64()),
                "nb": pa.array(both[iu, ju], pa.float64()),
                "ni": pa.array(col_nulls[iu], pa.float64()),
                "nj": pa.array(col_nulls[ju], pa.float64()),
            }
        )

    ds = _as_dataset(source, columns=list(cols))
    merged = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["i", "j"])
        .aggregate(
            Sum("nb", alias_name="nb"),
            Sum("ni", alias_name="ni"),
            Sum("nj", alias_name="nj"),
        )
        .to_pandas()
    )
    nb = merged["nb"].to_numpy(np.int64)
    either = (
        merged["ni"].to_numpy(np.int64) + merged["nj"].to_numpy(np.int64) - nb
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(either > 0, nb / np.maximum(either, 1), np.nan)
    # counts are symmetric — orient each pair lexicographically so the
    # output is independent of the caller's column order
    names = [
        tuple(sorted((cols[int(i)], cols[int(j)])))
        for i, j in zip(merged["i"], merged["j"])
    ]
    out = pd.DataFrame(
        {
            "col_a": [a for a, _ in names],
            "col_b": [b for _, b in names],
            "n_both_null": nb,
            "n_either_null": either,
            "null_jaccard": jac,
        }
    )
    return out.sort_values(["col_a", "col_b"]).reset_index(drop=True)


def float_anomaly_profile(
    source: Any,
    cols: "list[str]",
    *,
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """Floating-point hygiene audit — the NaN/Inf screen run before
    any aggregate trusts a float column (one overflowed ratio poisons
    a SUM silently): per column, counts of NULL, NaN, +Inf, −Inf,
    exact zero and negative values. One row per column per batch
    (vectorized numpy masks), K-bounded merge. Distinguishes SQL NULL
    from float NaN — Parquet can carry both and most engines conflate
    them somewhere."""
    import pandas as pd

    from ray.data.aggregate import Sum

    fields = ("n", "n_null", "n_nan", "n_posinf", "n_neginf",
              "n_zero", "n_negative")

    def partials(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("column", *fields)}
        for c in cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            null = pc.is_null(col, nan_is_null=False).to_numpy(
                zero_copy_only=False
            )
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~null
            nan = ok & np.isnan(v)
            fin = ok & ~nan
            rows["column"].append(c)
            rows["n"].append(batch.num_rows)
            rows["n_null"].append(int(null.sum()))
            rows["n_nan"].append(int(nan.sum()))
            rows["n_posinf"].append(int((fin & (v == np.inf)).sum()))
            rows["n_neginf"].append(int((fin & (v == -np.inf)).sum()))
            rows["n_zero"].append(int((fin & (v == 0.0)).sum()))
            rows["n_negative"].append(
                int((fin & (v < 0) & (v > -np.inf)).sum())
            )
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                **{k: pa.array(rows[k], pa.int64()) for k in fields},
            }
        )

    ds = _as_dataset(source, columns=list(cols))
    out = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby("column")
        .aggregate(*[Sum(k, alias_name=k) for k in fields])
        .to_pandas()
    )
    for k in fields:
        out[k] = out[k].astype(np.int64)
    return out.sort_values("column").reset_index(drop=True)


def grouped_higher_moments(
    source: Any,
    key_cols: "list[str]",
    x_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Per-group SKEWNESS and KURTOSIS — the 3rd/4th-moment siblings
    of :func:`grouped_stats`, the distribution-shape signals a drift
    monitor wants next to mean/variance (a mean-stable column whose
    tail flips sign is invisible to PSI on coarse bins but loud in
    skewness). Definitions match DuckDB/SQL exactly: adjusted
    Fisher-Pearson skewness ``G1 = g1·√(n(n−1))/(n−2)`` (NULL when
    n < 3 or zero variance) and bias-corrected EXCESS kurtosis
    ``G2 = (n−1)/((n−2)(n−3)) · ((n+1)·g2 + 6)`` (NULL when n < 4 or
    zero variance), both over non-NULL values only, rounded to 6.

    Scale shape: identical to :func:`grouped_stats` — ONE pyarrow
    ``group_by`` per batch reduces rows to per-group power sums
    (n, Σx, Σx², Σx³, Σx⁴; exchange is groups × batches), a null-safe
    bucketed groupby merges them, and the closed-form central moments
    ``m₂ = s₂ − s₁²/n``, ``m₃ = s₃ − 3μs₂ + 2nμ³``,
    ``m₄ = s₄ − 4μs₃ + 6μ²s₂ − 3nμ⁴`` evaluate per group at the end.
    Magnitude note: power sums to the 4th amplify the sums-of-squares
    caveat — fine while ``|x|⁴·n`` stays ≪ 2⁵³·m₄; for extreme means,
    center the column first."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[x_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        v = ~np.isnan(x)
        x0 = np.where(v, x, 0.0)
        x2 = x0 * x0
        t = pa.table(
            {
                **{c: batch[c] for c in key_cols},
                "__n": pa.array(v.astype(np.int64)),
                "__s1": pa.array(x0),
                "__s2": pa.array(x2),
                "__s3": pa.array(x2 * x0),
                "__s4": pa.array(x2 * x2),
            }
        )
        aggs = [(c, "sum") for c in t.column_names if c.startswith("__")]
        return t.group_by(key_cols).aggregate(aggs)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby(key_cols, dropna=False, sort=False)
            .sum(numeric_only=True)
            .reset_index()
        )
        n = s["__n_sum"].to_numpy(np.float64)
        s1 = s["__s1_sum"].to_numpy(np.float64)
        s2 = s["__s2_sum"].to_numpy(np.float64)
        s3 = s["__s3_sum"].to_numpy(np.float64)
        s4 = s["__s4_sum"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mu = s1 / n
            m2 = s2 - s1 * mu
            m3 = s3 - 3.0 * mu * s2 + 2.0 * n * mu**3
            m4 = s4 - 4.0 * mu * s3 + 6.0 * mu * mu * s2 - 3.0 * n * mu**4
            g1 = (m3 / n) / np.power(m2 / n, 1.5)
            skew = g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
            g2 = (m4 / n) / np.power(m2 / n, 2.0) - 3.0
            kurt = (n - 1.0) / ((n - 2.0) * (n - 3.0)) * ((n + 1.0) * g2 + 6.0)
        out = s[key_cols].copy()
        out["n_x"] = s["__n_sum"].to_numpy(np.int64)
        out["skew_x"] = np.where(
            (n >= 3) & (m2 > 0), np.round(skew, 6), np.nan
        )
        out["kurt_x"] = np.where(
            (n >= 4) & (m2 > 0), np.round(kurt, 6), np.nan
        )
        return out

    ds = _as_dataset(source, columns=[*key_cols, x_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        part, key_cols, merge,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def grouped_mode(
    source: Any,
    key_cols: "list[str]",
    value_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Per-group modal value: the most frequent non-NULL ``value_col``
    per ``key_cols`` group, ties broken to the SMALLEST value —
    deterministic under any batch/bucket layout, matching a
    ``ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, value)`` SQL oracle.

    Scale shape: each batch collapses to per-(group, value) counts via
    ONE pyarrow ``group_by`` (the combiner — exchange is bounded by
    per-batch distinct pairs, never raw rows); groups co-locate via a
    bucketed groupby on the key hash; each bucket sums its partials and
    takes the per-group argmax in one vectorized sort +
    ``drop_duplicates`` sweep. Output: ``key_cols + (mode_value,
    mode_count)``.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select([*key_cols, value_col]).filter(
            pc.is_valid(batch[value_col])
        )
        return t.group_by([*key_cols, value_col]).aggregate(
            [([], "count_all")]
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = (
            df.groupby([*key_cols, value_col], dropna=False, sort=False)[
                "count_all"
            ]
            .sum()
            .reset_index()
        )
        s = s.sort_values(
            [*key_cols, "count_all", value_col],
            ascending=[True] * len(key_cols) + [False, True],
            kind="stable",
        ).drop_duplicates(key_cols)
        s["count_all"] = s["count_all"].astype(np.int64)
        return s.rename(
            columns={value_col: "mode_value", "count_all": "mode_count"}
        )

    ds = _as_dataset(source, columns=[*key_cols, value_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        part, key_cols, per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def grouped_ols(
    source: Any,
    key_cols: "list[str]",
    x_col: str,
    y_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Per-group simple linear regression of ``y`` on ``x`` — SQL
    ``REGR_SLOPE/REGR_INTERCEPT/REGR_R2/REGR_COUNT`` semantics: only
    PAIRWISE-complete rows count; slope NULL on zero x-variance; R²
    is the squared Pearson correlation (NULL on zero variance of
    either side). Floats rounded to 6.

    Scale shape: identical to :func:`grouped_stats` — each batch
    collapses to per-group sums (n, Σx, Σy, Σxx, Σxy, Σyy) via ONE
    pyarrow ``group_by`` (exchange is groups × batches), a null-safe
    bucketed groupby merges the partials, and the closed forms
    evaluate per group at the end. Same magnitude caveat: the
    sums-of-squares form wants ``x`` and ``y`` to not carry extreme
    means — center epoch-like columns upstream.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[x_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        y = pc.cast(batch[y_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        vp = ~np.isnan(x) & ~np.isnan(y)
        xp = np.where(vp, x, 0.0)
        yp = np.where(vp, y, 0.0)
        t = pa.table(
            {
                **{c: batch[c] for c in key_cols},
                "__n": pa.array(vp.astype(np.int64)),
                "__sx": pa.array(xp),
                "__sy": pa.array(yp),
                "__sxx": pa.array(xp * xp),
                "__syy": pa.array(yp * yp),
                "__sxy": pa.array(xp * yp),
            }
        )
        aggs = [(c, "sum") for c in t.column_names if c.startswith("__")]
        return t.group_by(key_cols).aggregate(aggs)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby(key_cols, dropna=False, sort=False)
            .sum(numeric_only=True)
            .reset_index()
        )
        n = s["__n_sum"].to_numpy(np.float64)
        sx, sy = s["__sx_sum"].to_numpy(), s["__sy_sum"].to_numpy()
        sxx, syy = s["__sxx_sum"].to_numpy(), s["__syy_sum"].to_numpy()
        sxy = s["__sxy_sum"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            vx = n * sxx - sx * sx          # n² · var_pop(x)
            vy = n * syy - sy * sy
            cxy = n * sxy - sx * sy
            slope = cxy / vx
            intercept = sy / n - slope * (sx / n)
            r2 = (cxy * cxy) / (vx * vy)
        out = s[key_cols].copy()
        out["regr_n"] = s["__n_sum"].to_numpy(np.int64)
        ok = (n > 0) & (vx > 0)
        out["slope"] = np.where(ok, np.round(slope, 6), np.nan)
        out["intercept"] = np.where(ok, np.round(intercept, 6), np.nan)
        out["r2"] = np.where(
            ok & (vy > 0), np.round(r2, 6), np.nan
        )
        return out

    ds = _as_dataset(source, columns=[*key_cols, x_col, y_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        part, key_cols, merge,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def key_skew_profile(
    source: Any,
    key_col: str,
    *,
    top_k: int = 10,
    batch_size: int = 64 * 1024,
) -> "pandas.DataFrame":
    """Partitioning-skew profile of a key column — the numbers you
    read BEFORE choosing a shuffle key: distinct keys, total rows,
    share of the heaviest key (``top1_share``), share of the ``top_k``
    heaviest (``topk_share``), and the Gini coefficient of the per-key
    row-count distribution (0 = perfectly even, → 1 = one key owns
    everything). NULL keys drop.

    Scale shape: per-batch pyarrow ``group_by`` count partials (the
    combiner) → ONE bucketed groupby sums per-key counts, and each
    bucket immediately collapses to its COUNT-OF-COUNTS histogram
    (count value → #keys), so the driver only merges
    frequency-of-frequency rows — bounded by the number of DISTINCT
    per-key counts, never by #keys or #rows. All rank sums are exact
    integer arithmetic over the run-length form.

    Returns a one-row DataFrame ``(n_keys, n_rows, top1_share,
    topk_share, gini)``.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def partial_counts(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col])
        t = t.filter(pc.is_valid(t[key_col]))
        return t.group_by([key_col]).aggregate([([], "count_all")])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per_key = g.groupby(key_col, sort=False)["count_all"].sum()
        fof = per_key.value_counts()  # count value -> #keys
        return pd.DataFrame(
            {"cnt": fof.index.to_numpy(np.int64),
             "m": fof.to_numpy(np.int64)}
        )

    ds = _as_dataset(source, columns=[key_col])
    parts = ds.map_batches(
        partial_counts, batch_format="pyarrow", batch_size=batch_size
    )
    fof = (
        bucketed_groupby(parts, [key_col], per_bucket)
        .groupby("cnt")
        .sum("m")
        .to_pandas()
    )
    cnt = fof["cnt"].to_numpy(np.int64)
    m = fof["sum(m)"].to_numpy(np.int64)
    order = np.argsort(cnt)  # ascending count
    cnt, m = cnt[order], m[order]
    n_keys = int(m.sum())
    n_rows = int((cnt * m).sum())
    # Σ rank·count over ascending ranks, run-length exact (Python ints)
    s1, rank = 0, 1
    for c, mm in zip(cnt.tolist(), m.tolist()):
        s1 += c * (mm * rank + mm * (mm - 1) // 2)
        rank += mm
    top1 = int(cnt[-1])
    need, topk = top_k, 0
    for c, mm in zip(cnt[::-1].tolist(), m[::-1].tolist()):
        take = min(mm, need)
        topk += c * take
        need -= take
        if need == 0:
            break
    gini = (2.0 * s1) / (n_keys * n_rows) - (n_keys + 1.0) / n_keys
    return pd.DataFrame(
        {
            "n_keys": [np.int64(n_keys)],
            "n_rows": [np.int64(n_rows)],
            "top1_share": [round(top1 / n_rows, 6)],
            "topk_share": [round(topk / n_rows, 6)],
            "gini": [round(gini, 6)],
        }
    )


def benford_digits(
    source: Any,
    value_col: str,
    *,
    batch_size: int = 64 * 1024,
) -> "pandas.DataFrame":
    """Benford's-law first-significant-digit profile of a numeric
    column — the fraud/synthetic-data smell test: observed count per
    leading digit 1–9, the Benford expectation ``n·log10(1+1/d)``,
    and each digit's χ² term. NULLs and zeros drop (no leading
    digit); negatives use |x|.

    Scale shape: the combiner pattern at its purest — each batch
    reduces to a 9-bin count vector (one vectorized
    log10/floor/pow pass + bincount), the driver sums 9-int partials.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        x = np.abs(x[~np.isnan(x)])
        x = x[x > 0]
        # mantissa clamped into [1, 10). Two cross-engine hazards,
        # both handled: (a) numpy's SIMD pow is NOT correctly rounded
        # for negative exponents (np.power(10.,-1.) ≠ 0.1), so only
        # exactly-representable POSITIVE powers are used — divide for
        # e ≥ 0, multiply for e < 0 (exact for |e| ≤ 22; IEEE ÷ and ×
        # are correctly rounded on both engines); (b) a ±1-ulp log10
        # slip at a power-of-10 boundary shifts e by one, which the
        # ×10 clamp corrects identically here and in the SQL oracle.
        e = np.floor(np.log10(x))
        p = np.power(10.0, np.abs(e))
        m = np.where(e >= 0, x / p, x * p)
        m = np.where(m >= 10.0, m / 10.0, m)
        m = np.where(m < 1.0, m * 10.0, m)
        d = np.floor(m)
        cnt = np.bincount(d.astype(np.int64), minlength=10)[1:10]
        return pa.table({"d": pa.array(np.arange(1, 10, dtype=np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = (
        _as_dataset(source, columns=[value_col])
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .groupby("d")
        .sum("c")
        .to_pandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    obs = parts["sum(c)"].to_numpy(np.int64)
    n = int(obs.sum())
    digits = parts["d"].to_numpy(np.int64)
    expected = n * np.log10(1.0 + 1.0 / digits)
    chi2 = (obs - expected) ** 2 / expected
    return pd.DataFrame(
        {
            "digit": digits,
            "observed": obs,
            "expected": np.round(expected, 6),
            "chi2_term": np.round(chi2, 6),
        }
    )


def null_rate_by_period(
    source: Any,
    ts_col: str,
    check_cols: "list[str]",
    *,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Completeness drift monitor: per calendar DAY, row count and
    per-column null count + null rate — the first chart a validation
    engine draws when a feed degrades. Rows with NULL ``ts_col``
    drop (they have no day).

    Scale shape: per-batch pyarrow ``group_by(day)`` partials (row
    count + null counts per column), then ONE tiny global groupby over
    days × batches rows. Output ``(day, n_rows, {col}_nulls,
    {col}_null_rate …)`` sorted by day.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[ts_col]))
        day = pc.cast(pc.floor_temporal(t[ts_col], unit="day"),
                      pa.date32())
        arrs = {"day": day,
                "__n": pa.array(np.ones(t.num_rows, np.int64))}
        for c in check_cols:
            arrs[f"__z_{c}"] = pc.cast(
                pc.is_null(t[c]), pa.int64()
            )
        tt = pa.table(arrs)
        aggs = [(c, "sum") for c in tt.column_names if c.startswith("__")]
        return tt.group_by(["day"]).aggregate(aggs)

    agg = (
        _as_dataset(source, columns=[ts_col, *check_cols])
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .groupby("day")
        .sum([f"__z_{c}_sum" for c in check_cols] + ["__n_sum"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["sum(__n_sum)"], pa.int64())
        out = {"day": batch["day"], "n_rows": n}
        nf = n.to_numpy(zero_copy_only=False).astype(np.float64)
        for c in check_cols:
            z = pc.cast(batch[f"sum(__z_{c}_sum)"], pa.int64())
            out[f"{c}_nulls"] = z
            zr = z.to_numpy(zero_copy_only=False).astype(np.float64)
            out[f"{c}_null_rate"] = pa.array(np.round(zr / nf, 6))
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


def cat_association(
    source: Any,
    col_a: str,
    col_b: str,
    *,
    batch_size: int = 64 * 1024,
) -> pa.Table:
    """Association strength between two CATEGORICAL columns of one
    table: Pearson chi-squared independence statistic, Cramér's V, and
    mutual information (nats) — the "are these columns independent"
    profiler (event mix vs shard, language vs domain, label vs split;
    feature-leak and stratification-skew detection).

    Scale shape: ONE streaming pass; each batch collapses to distinct
    ``(a, b, count)`` cells via zero-copy Arrow ``group_by`` (the
    exchange is cell-bounded, never row-bounded); the driver merges the
    |A|×|B| contingency table — bounded by the category-cardinality
    product, the same envelope as :func:`~..stages.drift.chi2_categorical`
    (use bucketed variants for unbounded-cardinality keys). Rows where
    either side is NULL drop (pairwise-complete convention).

    Float math mirrors the SQL formulation term-for-term
    (``e = ra·cb/n`` as double multiply-then-divide; MI term
    ``(o/n)·ln((o·n)/(ra·cb))``), so the rounded statistics hash-match
    a DuckDB oracle. Zero-observed cells contribute their full expected
    count to chi2 (textbook), and nothing to MI (0·ln0 = 0).

    Returns one row: ``(n, r_categories, c_categories, chi2,
    cramers_v, mutual_info)``, statistics rounded to 6.
    """
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select([col_a, col_b])
        t = t.filter(
            pc.and_(pc.is_valid(t[col_a]), pc.is_valid(t[col_b]))
        )
        g = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        return pa.table(
            {
                "a": g[col_a],
                "b": g[col_b],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[col_a, col_b])
    cells = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()

    def result(n, r, c, chi2, v, mi):
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "r_categories": pa.array([r], pa.int64()),
                "c_categories": pa.array([c], pa.int64()),
                "chi2": pa.array([chi2], pa.float64()),
                "cramers_v": pa.array([v], pa.float64()),
                "mutual_info": pa.array([mi], pa.float64()),
            }
        )

    if not len(cells):
        return result(0, 0, 0, 0.0, 0.0, 0.0)

    merged = cells.groupby(["a", "b"], sort=True)["cnt"].sum()
    obs = merged.unstack(fill_value=0)  # r x c contingency grid
    o = obs.to_numpy(np.float64)
    n = float(o.sum())
    ra = o.sum(axis=1)  # row marginals
    cb = o.sum(axis=0)  # col marginals
    r, c = o.shape
    e = (ra[:, None] * cb[None, :]) / n
    chi2 = float(np.sum((o - e) ** 2 / e))
    k = min(r, c) - 1
    v = float(np.sqrt(chi2 / (n * k))) if k > 0 else 0.0
    pos = o > 0
    mi = float(
        np.sum(
            (o[pos] / n)
            * np.log((o[pos] * n) / (ra[:, None] * cb[None, :])[pos])
        )
    )
    return result(
        int(n), r, c, round(chi2, 6), round(v, 6), round(mi, 6)
    )


def categorical_profile(
    source: Any,
    columns: "list[str]",
    *,
    batch_size: int = 64 * 1024,
) -> pa.Table:
    """Per-column categorical profile: non-null count, NULL count,
    exact distinct count, Shannon entropy (nats) of the value
    distribution, and top-category share — the "how informative /
    skewed is this column" pre-step before choosing stratification or
    dedup keys (a near-zero entropy column is a constant; a
    top_share→1 column is a degenerate key).

    ONE streaming pass over all requested columns: each batch reduces
    every column to tidy ``(value, count)`` partials via
    ``pc.value_counts`` (exchange bounded by per-batch distincts);
    the driver merges per-column counters — the distinct-bounded
    envelope (use :func:`misra_gries_topk` for unbounded-cardinality
    columns). Entropy terms mirror SQL ``-SUM((c/n)·LN(c/n))``
    term-for-term; entropy and top_share round to 6.

    Returns one row per column, ordered as given:
    ``(column, n, null_count, n_distinct, entropy, top_share)``.
    """
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        names, vals, cnts, nulls = [], [], [], []
        for col in columns:
            arr = batch[col].combine_chunks()
            n_null = arr.null_count
            arr = arr.drop_null()
            vc = pc.value_counts(arr)
            k = len(vc)
            names.extend([col] * max(k, 1))
            if k:
                vals.extend(
                    pc.cast(vc.field("values"), pa.string()).to_pylist()
                )
                cnts.extend(pc.cast(vc.field("counts"), pa.int64()).to_pylist())
                nulls.extend([0] * (k - 1) + [n_null])
            else:
                vals.append(None)
                cnts.append(0)
                nulls.append(n_null)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "value": pa.array(vals, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=list(columns))
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()

    rows = []
    for col in columns:
        p = part[part["column"] == col]
        nulls = int(p["nulls"].sum())
        vc = p[p["value"].notna()].groupby("value", sort=True)["cnt"].sum()
        n = int(vc.sum())
        if n:
            probs = vc.to_numpy(np.float64) / n
            entropy = float(-(probs * np.log(probs)).sum())
            top = float(vc.max() / n)
        else:
            entropy, top = 0.0, 0.0
        rows.append(
            (col, n, nulls, int(len(vc)), round(entropy, 6), round(top, 6))
        )
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "null_count": pa.array([r[2] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
            "entropy": pa.array([r[4] for r in rows], pa.float64()),
            "top_share": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


def label_encode(
    source: Any,
    cat_col: str,
    *,
    out_col: "str | None" = None,
    max_vocab: int = 1 << 22,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Deterministic label encoding (the StringIndexer feature-eng
    step): appends ``out_col`` (default ``<col>_idx``) = the 0-based
    rank of the value in the SORTED distinct vocabulary — stable under
    repartitioning/re-runs, unlike fit-order indexers. NULL → NULL.

    Two passes, no shuffle: per-batch ``pc.unique`` partials reduce to
    the distinct set on the driver (vocabulary-bounded — guarded by
    ``max_vocab`` with a loud error; a billion-key id column is not a
    categorical feature), sorted once, broadcast once, then one
    vectorized ``searchsorted`` per batch.
    """
    out_col = out_col or f"{cat_col}_idx"

    def distinct(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[cat_col])
        u = u.drop_null()
        return pa.table({"v": u})

    ds = _as_dataset(source)
    parts = (
        _as_dataset(source, columns=[cat_col])
        .map_batches(distinct, batch_format="pyarrow",
                     batch_size=batch_size)
        .to_pandas()
    )
    vocab = np.sort(parts["v"].unique())
    if len(vocab) > max_vocab:
        raise ValueError(
            f"label_encode: {len(vocab)} distinct values exceeds "
            f"max_vocab={max_vocab} — a key-like column is not a "
            "categorical feature (hash or bucketize it instead)"
        )
    import ray as _ray

    ref = _ray.put(vocab)

    def encode(batch: pa.Table) -> pa.Table:
        vb = _ray.get(ref)
        col = batch[cat_col]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        vals = col.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vb, vals[valid])
        out = np.zeros(batch.num_rows, np.int64)
        out[valid] = idx
        return batch.append_column(
            out_col, pa.array(out, pa.int64(), mask=~valid)
        )

    return ds.map_batches(
        encode, batch_format="pyarrow", batch_size=batch_size
    )


def target_encode(
    source: Any,
    cat_col: str,
    target_col: str,
    *,
    smoothing: float = 10.0,
    out_col: "str | None" = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Smoothed target encoding (the mean-target feature-eng step):
    appends ``out_col`` (default ``<col>_te``) =
    ``(Σ target + m·global_mean) / (n + m)`` per category, where n and
    Σ run over non-NULL targets — the standard additive-smoothing
    estimator that shrinks rare categories toward the global mean.
    NULL category or an all-NULL-target category encodes to the global
    mean (n = 0); values ROUND 6.

    Two passes, no shuffle: per-batch (category, Σ, n) combiner
    partials merge on the driver (category-bounded), the encoding map
    broadcasts once, then one vectorized probe per batch.
    """
    import pandas as pd

    out_col = out_col or f"{cat_col}_te"

    def sums(batch: pa.Table) -> pa.Table:
        val = pc.cast(batch[target_col], pa.float64())
        valid = pc.is_valid(val)
        t = pa.table(
            {
                "c": batch[cat_col],
                "s": pc.if_else(pc.fill_null(valid, False), val,
                                pa.scalar(0.0)),
                "n": pc.cast(valid, pa.int64()),
            }
        )
        g = t.group_by("c").aggregate([("s", "sum"), ("n", "sum")])
        return g.rename_columns(["c", "s", "n"])

    parts = (
        _as_dataset(source, columns=[cat_col, target_col])
        .map_batches(sums, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
    )
    agg = parts.groupby("c", dropna=False).agg(
        s=("s", "sum"), n=("n", "sum")
    ).reset_index()
    total_s, total_n = float(agg["s"].sum()), int(agg["n"].sum())
    if total_n == 0:
        raise ValueError("target_encode: target column is all NULL")
    gmean = total_s / total_n
    agg["te"] = (agg["s"] + smoothing * gmean) / (
        agg["n"].astype(np.float64) + smoothing
    )
    cats = agg[~agg["c"].isna()]
    vocab = np.sort(cats["c"].to_numpy())
    order = np.argsort(cats["c"].to_numpy())
    te = cats["te"].to_numpy()[order]
    import ray as _ray

    ref = _ray.put((vocab, te, gmean))

    def encode(batch: pa.Table) -> pa.Table:
        vb, tv, gm = _ray.get(ref)
        col = batch[cat_col]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        vals = col.to_numpy(zero_copy_only=False)
        out = np.full(batch.num_rows, gm)
        if valid.any():
            out[valid] = tv[np.searchsorted(vb, vals[valid])]
        return batch.append_column(
            out_col, pa.array(np.round(out, 6), pa.float64())
        )

    return _as_dataset(source).map_batches(
        encode, batch_format="pyarrow", batch_size=batch_size
    )
