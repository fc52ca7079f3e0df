"""Relational operators Ray Data lacks natively: tumbling-window
aggregates and as-of joins (named explicitly by the build brief as
custom-operator targets; no reference analogue).

Both follow the engine's scale patterns:

* :func:`windowed_aggregate` — tumbling time windows via ONE
  pre-aggregating ``map_batches`` pass (pyarrow ``Table.group_by``
  inside each batch collapses rows to (window, key) partials) followed
  by a SMALL global groupby over the partial rows. The shuffle moves
  per-(window,key) partials, never raw events — at 100 TB the exchange
  volume is bounded by windows × keys, not rows.
* :func:`asof_join` — for each left row, the latest right row of the
  same key with ``right_ts ≤ left_ts`` (backward direction; DuckDB
  ``ASOF JOIN`` semantics). Both sides are hash-bucketed on the join
  key (equal keys co-locate — the documented partitioning assumption),
  then each bucket runs ONE vectorized ``pd.merge_asof`` over all its
  keys. Inner semantics: unmatched left rows drop (ties broken
  deterministically by pre-deduplicating the right side upstream).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _as_dataset, bucketed_groupby

Dataset = ray.data.Dataset


def windowed_aggregate(
    source: Any,
    ts_col: str,
    value_col: str,
    *,
    key_cols: Optional[List[str]] = None,
    window_seconds: int = 3600,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Tumbling-window stats of ``value_col`` per (window, key):
    ``window_start, *key_cols, n_events, value_sum, value_min,
    value_max, value_avg``.

    Window origin is the Unix epoch; for hour/day windows this matches
    DuckDB ``time_bucket(INTERVAL .. , ts)`` exactly (both origins are
    midnight-aligned). NULL timestamps drop (no window); NULL values
    count toward ``n_events`` but not the value stats (SQL aggregate
    semantics)."""
    key_cols = list(key_cols or [])
    w_us = np.int64(window_seconds) * 1_000_000

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[ts_col]))
        # normalize to µs first: pandas-born blocks carry ns timestamps
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # numpy // floors toward -inf, so pre-epoch (negative)
        # timestamps bucket like DuckDB time_bucket (pc.divide
        # truncates toward zero and would land them one window high)
        win = pa.array((ts // w_us) * w_us, pa.int64())
        t = batch.select(key_cols + [value_col]).append_column("__w", win)
        g = t.group_by(["__w"] + key_cols).aggregate(
            [
                ("__w", "count"),
                (value_col, "sum"),
                (value_col, "min"),
                (value_col, "max"),
                (value_col, "count"),
            ]
        )
        return g.rename_columns(
            ["__w"] + key_cols + ["n", "v_sum", "v_min", "v_max", "v_cnt"]
        )

    ds = _as_dataset(source, columns=[ts_col, value_col] + key_cols)
    part = ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)

    from ray.data.aggregate import Max, Min, Sum

    out = part.groupby(["__w"] + key_cols).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("v_sum", alias_name="value_sum"),
        Min("v_min", alias_name="value_min"),
        Max("v_max", alias_name="value_max"),
        Sum("v_cnt", alias_name="__vc"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        win = pa.array(
            batch["__w"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        )
        avg = pc.divide(
            pc.cast(batch["value_sum"], pa.float64()),
            pc.cast(batch["__vc"], pa.float64()),
        )
        cols = {"window_start": win}
        for k in key_cols:
            cols[k] = batch[k]
        cols["n_events"] = pc.cast(batch["n_events"], pa.int64())
        cols["value_sum"] = batch["value_sum"]
        cols["value_min"] = batch["value_min"]
        cols["value_max"] = batch["value_max"]
        cols["value_avg"] = avg
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def asof_join(
    left: Any,
    right: Any,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: List[str],
    right_cols: List[str],
    direction: str = "backward",
    num_buckets: int = 64,
) -> Dataset:
    """As-of join: each left row pairs with the latest right row of the
    same key whose ``right_ts`` ≤ ``left_ts`` (``direction="backward"``;
    ``"forward"`` = earliest ≥). Inner semantics — left rows with no
    match drop, mirroring DuckDB ``ASOF JOIN``.

    Output columns: ``left_cols + [left_ts] + right_cols`` (names must
    be disjoint). Rows with NULL key or NULL timestamp on either side
    never match (SQL comparison semantics) and are dropped up front.

    Partitioning assumption (documented): equal join keys co-locate via
    ``hash(key) % num_buckets``; each bucket must fit one worker —
    raise ``num_buckets`` at scale, and pre-deduplicate the right side
    if (key, ts) ties exist (tie order within equal timestamps is
    otherwise unspecified, as in DuckDB)."""
    lcols = [left_key, left_ts] + [c for c in left_cols if c not in (left_key, left_ts)]
    rcols = [right_key, right_ts] + [
        c for c in right_cols if c not in (right_key, right_ts)
    ]
    l_ds = _as_dataset(left, columns=lcols)
    r_ds = _as_dataset(right, columns=rcols)
    r_extra = [c for c in right_cols if c not in (right_key, right_ts)]
    l_extra = [c for c in left_cols if c not in (left_key, left_ts)]

    # the two sides must union with an identical schema: probe each
    # side's column types once so null-fills are typed correctly
    l_schema = l_ds.schema()
    r_schema = r_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def norm_typed(side: int, key: str, ts: str):
        def fn(batch: pa.Table) -> pa.Table:
            keep = pc.and_(pc.is_valid(batch[key]), pc.is_valid(batch[ts]))
            batch = batch.filter(keep)
            cols = {
                "__key": pc.cast(batch[key], pa.int64()),
                "__ts": pc.cast(batch[ts], pa.timestamp("us")),
                "__side": pa.array(np.full(batch.num_rows, side, np.int8)),
            }
            for c in l_extra:
                cols[c] = (
                    batch[c] if side == 0 else pa.nulls(batch.num_rows, l_types[c])
                )
            for c in r_extra:
                cols[c] = (
                    batch[c] if side == 1 else pa.nulls(batch.num_rows, r_types[c])
                )
            return pa.table(cols)

        return fn

    tagged = l_ds.map_batches(
        norm_typed(0, left_key, left_ts), batch_format="pyarrow"
    ).union(r_ds.map_batches(norm_typed(1, right_key, right_ts), batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lft = df[df.__side == 0].sort_values("__ts", kind="stable")
        rgt = df[df.__side == 1].sort_values("__ts", kind="stable")
        if len(lft) == 0:
            return df.iloc[0:0].drop(columns="__side")
        merged = pd.merge_asof(
            lft[["__key", "__ts"] + l_extra],
            rgt[["__key", "__ts"] + r_extra],
            on="__ts",
            by="__key",
            direction=direction,
        )
        # inner semantics: drop unmatched left rows (every right extra
        # is NaN iff no match, since matched right rows are non-null by
        # construction only when the source column is; use the sentinel
        # of ALL right extras null)
        if r_extra:
            matched = ~merged[r_extra].isna().all(axis=1)
            merged = merged[matched]
        return merged

    out = bucketed_groupby(tagged, ["__key"], per_bucket, num_buckets=num_buckets)

    def rename(batch: pa.Table) -> pa.Table:
        names = [
            {"__key": left_key, "__ts": left_ts}.get(c, c)
            for c in batch.column_names
        ]
        return batch.rename_columns(names)

    return out.map_batches(rename, batch_format="pyarrow")


def hash_join(
    left: Any,
    right: Any,
    *,
    left_key: str,
    right_key: str,
    left_cols: List[str],
    right_cols: List[str],
    num_buckets: int = 64,
    salt: int = 1,
    hot_keys: Any = None,
    how: str = "inner",
) -> Dataset:
    """Large-×-large equi-join via ONE hash-bucketed shuffle of each
    side (the shuffle-join tier; for a small right side use
    :func:`broadcast_join` — no shuffle at all). ``how`` is ``inner``
    (default), ``left``, ``right`` (left with the sides swapped),
    ``full``, ``semi`` or ``anti``; outer modes
    keep unmatched rows with NULLs on the other side. ``semi``/``anti``
    are the FILTERING joins (SQL EXISTS / NOT EXISTS) for a right side
    too big to broadcast (cf. :func:`semi_join_broadcast`): left
    columns only, right duplicates never multiply rows, NULL left keys
    kept by ``anti`` (they match nothing), dropped by ``semi``.
    NULL keys never MATCH (SQL
    semantics) but outer modes preserve null-keyed rows of the kept
    side(s) via a shuffle-free bypass stream; in ``full`` mode the
    output key column carries ``COALESCE(left.key, right.key)`` so
    unmatched right keys are not lost. ``salt > 1`` works for
    ``inner``/``left``/``right``/``semi``/``anti`` — semi/anti match by
    MEMBERSHIP (replicated right rows can't multiply output) and
    left/right emit only preserved-side rows (each left (key, salt)
    copy meets exactly its own salt's right replicas) — but NOT
    ``full``: a replicated hot right row unmatched at some salt would
    emit one spurious NULL-padded output per salt value, so ``full``
    stays unsalted (split a skewed FULL join into a salted LEFT join
    UNION the anti-of-right instead).

    Both sides bucket on ``hash(key) % num_buckets`` so equal keys
    co-locate, then each bucket runs ONE vectorized ``pd.merge``
    handling all its keys (the bucketed-groupby pattern: per-group
    overhead is O(#buckets), never O(#keys)). Duplicate keys on both
    sides produce the full per-key cross product, as in SQL.

    **Skew handling**: with ``salt > 1``, rows whose key is in the hot
    set are spread across ``salt`` sub-buckets — left hot rows get a
    round-robin salt, right hot rows are REPLICATED once per salt value
    (the classic salted-join trade: ``salt×`` copies of the hot right
    rows buy ``salt×`` parallelism over the hot left rows). Matching is
    on ``(key, salt)``, so output is identical to the unsalted join.
    ``hot_keys`` is an explicit list of key values or ``"auto"`` — a
    Misra-Gries heavy-hitter pass over the left key marks every key
    whose estimated count exceeds ``n_left / num_buckets`` (one extra
    cheap scan; the MG exchange is O(capacity) rows per batch).

    Output columns: ``[left_key] + left_cols + right_cols`` (names
    must be disjoint; the right key is dropped — it equals the left).
    NULL keys never match and are dropped (SQL semantics). Keys must
    share a comparable dtype across sides (the right key is cast to
    the left key's type). Partitioning assumption (documented): each
    (key, salt) bucket fits one worker — raise ``num_buckets`` and/or
    ``salt`` at scale.
    """
    if how == "right":
        # RIGHT OUTER = LEFT OUTER with the sides swapped; output
        # columns are reordered back so the caller's (left, right)
        # framing is preserved. The output key column is the RIGHT key
        # (the preserved side), per SQL.
        swapped = hash_join(
            right,
            left,
            left_key=right_key,
            right_key=left_key,
            left_cols=right_cols,
            right_cols=left_cols,
            num_buckets=num_buckets,
            salt=salt,
            hot_keys=hot_keys,
            how="left",
        )
        order = [right_key] + [c for c in left_cols if c != right_key] + [
            c for c in right_cols if c != right_key
        ]
        seen: List[str] = []
        for c in order:
            if c not in seen:
                seen.append(c)
        return swapped.map_batches(
            # the swapped join drops the original LEFT key column (it
            # is the swapped call's right key) — select what exists
            lambda b, cols=tuple(seen): b.select(
                [c for c in cols if c in b.schema.names]
            ),
            batch_format="pyarrow",
        )
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(
            f"how must be inner|left|full|semi|anti, got {how!r}"
        )
    if salt > 1 and how == "full":
        raise ValueError(
            "salt > 1 does not support how='full': an unmatched "
            "replicated hot right row would emit one NULL-padded "
            "output per salt value; use a salted left join UNION the "
            "right anti side instead"
        )
    l_extra = [c for c in left_cols if c != left_key]
    r_extra = [c for c in right_cols if c != right_key]
    if how in ("semi", "anti"):
        # filtering joins return LEFT columns only; the right side
        # contributes membership, never data
        if r_extra:
            raise ValueError(f"how={how!r} takes no right output columns")
    if set(l_extra) & set(r_extra):
        raise ValueError("left/right output columns must be disjoint")
    l_ds = _as_dataset(left, columns=[left_key] + l_extra)
    r_ds = _as_dataset(right, columns=[right_key] + r_extra)

    def _arrow_dtype(t):
        # pandas-block datasets report numpy dtypes / python classes
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    l_schema = l_ds.schema()
    r_schema = r_ds.schema()
    l_types = {
        n: _arrow_dtype(t) for n, t in zip(l_schema.names, l_schema.types)
    }
    r_types = {
        n: _arrow_dtype(t) for n, t in zip(r_schema.names, r_schema.types)
    }
    key_type = l_types[left_key]

    hot_ref = None
    if salt > 1:
        if isinstance(hot_keys, str) and hot_keys == "auto":
            from .profile import misra_gries_topk

            n_left = l_ds.count()
            mg = misra_gries_topk(
                l_ds, left_key, k=16, capacity=max(4 * num_buckets, 64)
            )
            thr = max(1, n_left // num_buckets)
            hot_vals = [
                v
                for v, ub in zip(
                    mg["value"].to_pylist(), mg["upper_bound"].to_pylist()
                )
                if ub > thr
            ]
        elif hot_keys is None:
            raise ValueError("salt > 1 requires hot_keys (a list or 'auto')")
        else:
            hot_vals = list(hot_keys)
        hot_ref = ray.put(pa.array(hot_vals, key_type))

    def norm_typed(side: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch[key]))
            kcol = pc.cast(batch[key], key_type)
            if isinstance(kcol, pa.ChunkedArray):
                kcol = kcol.combine_chunks()
            n = len(kcol)
            if hot_ref is not None:
                hot = pc.fill_null(
                    pc.is_in(kcol, value_set=ray.get(hot_ref)), False
                ).to_numpy(zero_copy_only=False)
                if side == 0:
                    s = np.where(hot, np.arange(n, dtype=np.int64) % salt, 0)
                else:
                    reps = np.where(hot, salt, 1).astype(np.int64)
                    take = np.repeat(np.arange(n, dtype=np.int64), reps)
                    offs = np.repeat(np.cumsum(reps) - reps, reps)
                    s = np.arange(len(take), dtype=np.int64) - offs
                    idx = pa.array(take)
                    batch = batch.take(idx)
                    kcol = kcol.take(idx)
                    n = len(kcol)
            else:
                s = np.zeros(n, np.int64)
            cols = {
                "__key": kcol,
                "__salt": pa.array(s, pa.int64()),
                "__side": pa.array(np.full(n, side, np.int8)),
            }
            for c in l_extra:
                cols[c] = batch[c] if side == 0 else pa.nulls(n, l_types[c])
            for c in r_extra:
                cols[c] = batch[c] if side == 1 else pa.nulls(n, r_types[c])
            return pa.table(cols)

        return fn

    tagged = l_ds.map_batches(
        norm_typed(0, left_key), batch_format="pyarrow"
    ).union(r_ds.map_batches(norm_typed(1, right_key), batch_format="pyarrow"))

    pd_how = {
        "inner": "inner", "left": "left", "full": "outer",
        "semi": "inner", "anti": "inner",
    }[how]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lft = df.loc[df.__side == 0, ["__key", "__salt"] + l_extra]
        rgt = df.loc[df.__side == 1, ["__key", "__salt"] + r_extra]
        if how in ("semi", "anti"):
            hit = lft["__key"].isin(rgt["__key"].unique())
            out = lft[hit] if how == "semi" else lft[~hit]
            return out.drop(columns="__salt")
        if how == "inner" and (len(lft) == 0 or len(rgt) == 0):
            return df.iloc[0:0].drop(columns=["__side", "__salt"])
        # in-bucket keys are never NULL (filtered before tagging), so
        # pandas' NaN-matches-NaN merge quirk cannot fire here
        return pd.merge(lft, rgt, on=["__key", "__salt"], how=pd_how).drop(
            columns="__salt"
        )

    out = bucketed_groupby(
        tagged, ["__key", "__salt"], per_bucket, num_buckets=num_buckets
    )

    if how in ("left", "full", "anti"):
        # shuffle-free bypass for null-keyed rows of the preserved
        # side(s); for anti, NULL left keys match nothing so NOT
        # EXISTS keeps them
        def null_side(side: int, key: str):
            def fn(batch: pa.Table) -> pa.Table:
                b = batch.filter(pc.is_null(batch[key]))
                n = b.num_rows
                cols = {"__key": pa.nulls(n, key_type)}
                for c in l_extra:
                    cols[c] = b[c] if side == 0 else pa.nulls(n, l_types[c])
                for c in r_extra:
                    cols[c] = b[c] if side == 1 else pa.nulls(n, r_types[c])
                return pa.table(cols)

            return fn

        bypass = l_ds.map_batches(
            null_side(0, left_key), batch_format="pyarrow"
        )
        if how == "full":
            bypass = bypass.union(
                r_ds.map_batches(null_side(1, right_key), batch_format="pyarrow")
            )
        out = out.union(bypass)

    # the per-bucket pandas merge pads the absent side with NULLs, which
    # promotes integer columns to float64 — cast back to the input Arrow
    # types so inner joins return the exact source dtypes
    out_types = {
        left_key: key_type,
        **{c: l_types[c] for c in l_extra},
        **{c: r_types[c] for c in r_extra},
    }

    def rename(batch: pa.Table) -> pa.Table:
        names = [
            left_key if c == "__key" else c for c in batch.column_names
        ]
        batch = batch.rename_columns(names)
        cols = {}
        for c in batch.column_names:
            col = batch[c]
            want = out_types[c]
            cols[c] = col if col.type == want else pc.cast(col, want)
        return pa.table(cols)

    return out.map_batches(rename, batch_format="pyarrow")


def interval_join_shuffle(
    left: Any,
    right: Any,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    left_cols: Optional[List[str]] = None,
    right_cols: Optional[List[str]] = None,
    bin_width: float,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
    max_bins_per_interval: int = 4096,
) -> Dataset:
    """Interval join where BOTH sides are large (the shuffle tier of
    :func:`range_join_broadcast`): every (left row, interval) pair with
    ``lo ≤ value < hi`` (half-open; NULL values/bounds never match).

    Scale shape — the classic binned interval join: the value domain
    splits into fixed ``bin_width`` bins; a left row ships ONCE to the
    bin of its value, an interval replicates to every bin it overlaps
    (``⌊lo/w⌋ .. ⌈hi/w⌉−1``), and each qualifying pair meets in exactly
    one bin (the row's), so no distinct pass is needed. One shared
    hash-bucketed shuffle co-locates bins; per bucket, ONE vectorized
    sweep per bin segment matches values against that bin's intervals.

    Tuning: right-side traffic is Σ ``span/w`` copies — pick ``w``
    near the typical interval width so replication is O(1) per
    interval while per-bin interval counts stay small (the per-bin
    match is O(n_bin × k_bin) vectorized). ``max_bins_per_interval``
    fails loudly when an interval would fan out wider than that
    (raise ``bin_width`` instead of silently exploding the shuffle).

    Output: ``[value_col] + left_cols + [lo_col, hi_col] + right_cols``
    (names must be disjoint).
    """
    l_extra = list(left_cols or [])
    r_extra = list(right_cols or [])
    if set(l_extra) & set(r_extra):
        raise ValueError("left/right output columns must be disjoint")
    w = float(bin_width)
    if not (w > 0):
        raise ValueError("bin_width must be positive")
    l_ds = _as_dataset(left, columns=[value_col] + l_extra)
    r_ds = _as_dataset(right, columns=[lo_col, hi_col] + r_extra)

    def _arrow_dtype(t):
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    l_schema, r_schema = l_ds.schema(), r_ds.schema()
    l_types = {n: _arrow_dtype(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _arrow_dtype(t) for n, t in zip(r_schema.names, r_schema.types)}

    def tag_left(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        ok = ~np.isnan(v)
        batch = batch.filter(pa.array(ok))
        v = v[ok]
        n = len(v)
        bins = np.floor(v / w).astype(np.int64)
        cols = {
            "__bin": pa.array(bins, pa.int64()),
            "__side": pa.array(np.zeros(n, np.int8)),
            "__v": pa.array(v, pa.float64()),
            "__lo": pa.nulls(n, pa.float64()),
            "__hi": pa.nulls(n, pa.float64()),
        }
        for c in l_extra:
            cols[c] = batch[c]
        for c in r_extra:
            cols[c] = pa.nulls(n, r_types[c])
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        lo = pc.cast(batch[lo_col], pa.float64()).to_numpy(zero_copy_only=False)
        hi = pc.cast(batch[hi_col], pa.float64()).to_numpy(zero_copy_only=False)
        ok = ~np.isnan(lo) & ~np.isnan(hi) & (hi > lo)
        batch = batch.filter(pa.array(ok))
        lo, hi = lo[ok], hi[ok]
        b_lo = np.floor(lo / w).astype(np.int64)
        b_hi = (np.ceil(hi / w) - 1).astype(np.int64)
        spans = b_hi - b_lo + 1
        if len(spans) and int(spans.max()) > max_bins_per_interval:
            raise ValueError(
                f"an interval spans {int(spans.max())} bins at "
                f"bin_width={w} (cap {max_bins_per_interval}); raise "
                "bin_width or split wide intervals"
            )
        take = np.repeat(np.arange(len(lo), dtype=np.int64), spans)
        offs = np.arange(len(take), dtype=np.int64) - np.repeat(
            np.cumsum(spans) - spans, spans
        )
        bins = b_lo[take] + offs
        rep = batch.take(pa.array(take, pa.int64()))
        n = len(take)
        cols = {
            "__bin": pa.array(bins, pa.int64()),
            "__side": pa.array(np.ones(n, np.int8)),
            "__v": pa.nulls(n, pa.float64()),
            "__lo": pa.array(lo[take], pa.float64()),
            "__hi": pa.array(hi[take], pa.float64()),
        }
        for c in l_extra:
            cols[c] = pa.nulls(n, l_types[c])
        for c in r_extra:
            cols[c] = rep[c]
        return pa.table(cols)

    tagged = l_ds.map_batches(
        tag_left, batch_format="pyarrow", batch_size=batch_size
    ).union(
        r_ds.map_batches(tag_right, batch_format="pyarrow", batch_size=batch_size)
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["__v"] + l_extra + ["__lo", "__hi"] + r_extra
        parts: List[pd.DataFrame] = []
        for _, g in df.groupby("__bin", sort=False):
            lft = g[g.__side == 0]
            rgt = g[g.__side == 1]
            if len(lft) == 0 or len(rgt) == 0:
                continue
            v = lft["__v"].to_numpy(np.float64)
            lo = rgt["__lo"].to_numpy(np.float64)
            hi = rgt["__hi"].to_numpy(np.float64)
            # vectorized (n_bin × k_bin) containment — k_bin is small by
            # bin-width construction
            m = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
            r, c = np.nonzero(m)
            if len(r) == 0:
                continue
            lp = lft.iloc[r][["__v"] + l_extra].reset_index(drop=True)
            rp = rgt.iloc[c][["__lo", "__hi"] + r_extra].reset_index(drop=True)
            parts.append(pd.concat([lp, rp], axis=1))
        if not parts:
            return df.iloc[0:0][out_cols]
        return pd.concat(parts, ignore_index=True)[out_cols]

    out = bucketed_groupby(tagged, ["__bin"], per_bucket, num_buckets=num_buckets)

    out_names = {"__v": value_col, "__lo": lo_col, "__hi": hi_col}

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [out_names.get(c, c) for c in batch.column_names]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def range_join_broadcast(
    source: Any,
    intervals: pd.DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    keep_cols: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Range (interval) join with a broadcast small side: each left row
    pairs with every interval where ``lo ≤ value < hi`` (half-open, so
    band tables never double-match at the boundary). Inner semantics —
    rows matching no interval drop; NULL values never match.

    The interval table is shipped once via ``ray.put`` and read per
    task — never re-shipped per batch and never shuffled. Two tiers,
    chosen automatically:

    * sorted non-overlapping intervals → one ``np.searchsorted`` per
      batch (O(log k) per row);
    * overlapping intervals → one vectorized mask per interval
      (O(k) passes; fine for the broadcast-sized k this operator is
      for — a large right side needs a shuffle join, not this).
    """
    keep_cols = list(keep_cols or [c for c in intervals.columns
                                   if c not in (lo_col, hi_col)])
    iv = intervals.sort_values(lo_col, kind="stable").reset_index(drop=True)
    lo = iv[lo_col].to_numpy(np.float64)
    hi = iv[hi_col].to_numpy(np.float64)
    non_overlapping = bool((hi[:-1] <= lo[1:]).all()) if len(iv) > 1 else True
    payload = {c: iv[c].to_numpy() for c in keep_cols}
    import ray as _ray

    ref = _ray.put((lo, hi, payload, non_overlapping))

    def join(batch: pa.Table) -> pa.Table:
        lo_a, hi_a, pay, fast = _ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(v)
        if fast:
            idx = np.searchsorted(lo_a, v, side="right") - 1
            ok = valid & (idx >= 0) & (v < hi_a[np.clip(idx, 0, None)])
            rows = np.nonzero(ok)[0]
            ivx = idx[rows]
        else:
            row_parts, ivx_parts = [], []
            for i in range(len(lo_a)):
                m = valid & (v >= lo_a[i]) & (v < hi_a[i])
                r = np.nonzero(m)[0]
                row_parts.append(r)
                ivx_parts.append(np.full(len(r), i, np.int64))
            rows = np.concatenate(row_parts) if row_parts else np.zeros(0, np.int64)
            ivx = np.concatenate(ivx_parts) if ivx_parts else np.zeros(0, np.int64)
            order = np.argsort(rows, kind="stable")  # deterministic row order
            rows, ivx = rows[order], ivx[order]
        out = batch.take(pa.array(rows, pa.int64()))
        for c in keep_cols:
            out = out.append_column(c, pa.array(pay[c][ivx]))
        return out

    ds = _as_dataset(source)
    return ds.map_batches(join, batch_format="pyarrow", batch_size=batch_size)


def sessionize(
    source: Any,
    key_col: str,
    ts_col: str,
    order_col: str,
    *,
    gap_seconds: int = 1800,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Session assignment (gaps-and-islands): per key, events ordered
    by (ts, order_col) start a new session when the gap from the
    previous event exceeds ``gap_seconds``. Output: one row per
    session — ``key, session_seq (1-based per key), session_start,
    session_end, n_events``.

    Scale shape: hash-bucket the keys (``bucketed_groupby`` — equal
    keys co-locate; ONE vectorized numpy pass per bucket computes the
    flags/cumsums for ALL its users), so the exchange is one shuffle of
    (key, ts, order) rows and no per-user Python calls. NULL
    timestamps drop (no session). Matches the SQL
    ``lag ... over (partition by key order by ts, order_col)``
    gaps-and-islands formulation exactly.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    gap_ns = np.int64(gap_seconds) * 1_000_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, order_col], kind="mergesort")
        u = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy("datetime64[ns]").astype(np.int64)
        new_user = np.empty(len(g), bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(len(g), bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_ns
        new_sess = new_user | gap
        sid = np.cumsum(new_sess)  # global (within bucket) session id
        base = np.maximum.accumulate(np.where(new_user, sid, 0))
        seq = sid - base + 1  # 1-based per-key session sequence
        out = pd.DataFrame(
            {
                key_col: u,
                "session_seq": seq.astype(np.int64),
                "__ts": g[ts_col].to_numpy("datetime64[ns]"),
            }
        )
        agg = out.groupby([key_col, "session_seq"], sort=False).agg(
            session_start=("__ts", "min"),
            session_end=("__ts", "max"),
            n_events=("__ts", "size"),
        ).reset_index()
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    def drop_null_ts(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[ts_col]))

    ds = _as_dataset(source, columns=[key_col, ts_col, order_col])
    ds = ds.map_batches(
        drop_null_ts, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def running_window(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key ORDERED running aggregates — the `ROWS UNBOUNDED
    PRECEDING` window family: for each key, rows ordered by
    ``order_cols`` get ``row_seq`` (ROW_NUMBER), ``running_sum``
    (cumulative SUM of ``value_col``, NULL until the key's first
    non-NULL value, rounded to 6 — the float-hash convention) and
    ``prev_value`` (LAG, NULL at each key's first row).

    Scale shape: identical to :func:`sessionize` — ONE hash-bucket
    shuffle co-locates each key, then ONE vectorized numpy pass per
    bucket (sort + segment-boundary masks + cumsum with per-key
    offsets) computes all three windows for ALL the bucket's keys; no
    per-key Python. NULL order values sort last (both pandas
    ``na_position`` and the SQL ``ASC NULLS LAST`` default).
    ``order_cols`` must totally order each key's rows (include a
    tiebreak id) or ties make ``prev_value`` arrival-dependent.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col] + order_cols, kind="mergesort", na_position="last"
        )
        n = len(g)
        u = g[key_col].to_numpy()
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        row_seq = idx - seg_start + 1

        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        nn = ~np.isnan(vals)
        contrib = np.where(nn, vals, 0.0)
        cs = np.cumsum(contrib)
        base = cs[seg_start] - contrib[seg_start]
        running = cs - base
        cnn = np.cumsum(nn.astype(np.int64))
        nn_base = cnn[seg_start] - nn[seg_start]
        seen = cnn - nn_base  # non-null values so far within the key
        running_sum = np.where(seen > 0, np.round(running, 6), np.nan)

        prev = np.empty(n, np.float64)
        prev[0] = np.nan
        prev[1:] = vals[:-1]
        prev[new_key] = np.nan

        out = g.copy()
        out["row_seq"] = row_seq
        out["running_sum"] = running_sum
        out["prev_value"] = prev
        return out

    ds = _as_dataset(source, columns=[key_col, *order_cols, value_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def edge_values(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key partition-EDGE window values — the LEAD / FIRST_VALUE /
    LAST_VALUE family completing :func:`running_window`'s LAG: for each
    key, rows ordered by ``order_cols`` get ``next_value`` (LEAD(v, 1),
    NULL at each key's last row), ``first_value`` / ``last_value`` (the
    value at the partition's first/last ROW over the full frame,
    RESPECT NULLS — SQL default) and ``key_rows`` (COUNT(*) OVER the
    partition, handy for pct-of-partition math downstream).

    Scale shape: identical to :func:`running_window` — ONE hash-bucket
    shuffle co-locates each key, then ONE vectorized numpy pass per
    bucket (sort + segment boundary masks + segment-edge gathers); no
    per-key Python. ``order_cols`` must totally order each key's rows
    (include a tiebreak id) or ``next_value`` is arrival-dependent.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col] + order_cols, kind="mergesort", na_position="last"
        )
        n = len(g)
        if n == 0:
            out = g.copy()
            for c in ("next_value", "first_value", "last_value"):
                out[c] = np.array([], np.float64)
            out["key_rows"] = np.array([], np.int64)
            return out
        u = g[key_col].to_numpy()
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        # seg_end via the mirrored trick on the reversed boundary mask
        last_of_key = np.empty(n, bool)
        last_of_key[-1] = True
        last_of_key[:-1] = new_key[1:]
        seg_end = np.minimum.accumulate(
            np.where(last_of_key, idx, n - 1)[::-1]
        )[::-1]

        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        nxt = np.empty(n, np.float64)
        nxt[-1] = np.nan
        nxt[:-1] = vals[1:]
        nxt[last_of_key] = np.nan

        out = g.copy()
        out["next_value"] = nxt
        out["first_value"] = vals[seg_start]
        out["last_value"] = vals[seg_end]
        out["key_rows"] = seg_end - seg_start + 1
        return out

    ds = _as_dataset(source, columns=[key_col, *order_cols, value_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def moving_window(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    preceding: int,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key MOVING-window aggregates — SQL ``ROWS BETWEEN k
    PRECEDING AND CURRENT ROW``: for each key, rows ordered by
    ``order_cols`` get ``mov_sum`` / ``mov_avg`` (rounded to 6, the
    float-hash convention), ``mov_min`` / ``mov_max`` (exact input
    values) and ``mov_count`` (non-NULL count) over the trailing
    ``preceding + 1`` rows of the same key. SQL NULL semantics: NULL
    values are ignored inside the window; an all-NULL window yields
    NULL sum/avg/min/max and count 0.

    Scale shape: same as :func:`running_window` — ONE hash-bucket
    shuffle co-locates each key, then ONE vectorized pass per bucket.
    sum/avg/count are cumulative-sum differences with per-key-clamped
    window starts; min/max use a log-doubling sparse table (O(n·log k)
    numpy, no per-row Python), querying each row's variable-length
    range ``[max(seg_start, i-k), i]`` as two overlapping power-of-two
    windows. ``order_cols`` must totally order each key's rows
    (include a tiebreak id); NULL order values sort last (SQL ``ASC
    NULLS LAST``).
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    if preceding < 0:
        raise ValueError("preceding must be >= 0")

    def _trailing_extrema(
        m0: np.ndarray, win_len: np.ndarray, op
    ) -> np.ndarray:
        """extrema over [i - win_len[i] + 1, i] for every i, via a
        log-doubling sparse table; win_len >= 1 and never crosses a
        segment boundary by construction of the caller's clamping."""
        n = len(m0)
        max_len = int(win_len.max()) if n else 1
        levels = [m0]
        j, span = 0, 1
        while span * 2 <= max_len:
            prev = levels[j]
            nxt = prev.copy()
            op(nxt[span:], prev[:-span], out=nxt[span:])
            levels.append(nxt)
            j += 1
            span *= 2
        # j_q = floor(log2(win_len)); combine the 2^j_q-window ending at
        # i with the one ending at (start + 2^j_q - 1)
        j_q = np.floor(np.log2(win_len)).astype(np.int64)
        j_q = np.minimum(j_q, len(levels) - 1)
        spans = np.int64(1) << j_q
        idx = np.arange(n, dtype=np.int64)
        left_end = idx - win_len + spans
        stacked = np.empty(n, m0.dtype)
        for lvl in range(len(levels)):
            sel = j_q == lvl
            if not sel.any():
                continue
            L = levels[lvl]
            stacked[sel] = op(L[idx[sel]], L[left_end[sel]])
        return stacked

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col] + order_cols, kind="mergesort", na_position="last"
        )
        n = len(g)
        if n == 0:
            out = g.copy()
            for c in ("mov_sum", "mov_avg", "mov_min", "mov_max"):
                out[c] = np.array([], np.float64)
            out["mov_count"] = np.array([], np.int64)
            return out
        u = g[key_col].to_numpy()
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        w_start = np.maximum(seg_start, idx - preceding)
        win_len = idx - w_start + 1

        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        nn = ~np.isnan(vals)
        contrib = np.where(nn, vals, 0.0)
        # cumulative sums in extended precision (80-bit longdouble on
        # x86): window sums are differences of nearby prefixes, so the
        # error is bounded by the prefix rounding ~ |Σvalues|·2⁻⁶⁴ —
        # the 6-decimal ROUND stays exact while the running |prefix|
        # is ≲ 9e12 (vs ~4e9 for a float64 cumsum; ADVICE round 2).
        # Beyond that envelope, pre-split the key's series.
        cs0 = np.concatenate(
            ([0.0], np.cumsum(contrib, dtype=np.longdouble))
        )
        cn0 = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        wsum = (cs0[idx + 1] - cs0[w_start]).astype(np.float64)
        wcnt = cn0[idx + 1] - cn0[w_start]
        has = wcnt > 0
        mov_sum = np.where(has, np.round(wsum, 6), np.nan)
        mov_avg = np.where(has, np.round(wsum / np.maximum(wcnt, 1), 6), np.nan)

        mins = _trailing_extrema(
            np.where(nn, vals, np.inf), win_len, np.minimum
        )
        maxs = _trailing_extrema(
            np.where(nn, vals, -np.inf), win_len, np.maximum
        )
        mov_min = np.where(has, mins, np.nan)
        mov_max = np.where(has, maxs, np.nan)

        out = g.copy()
        out["mov_sum"] = mov_sum
        out["mov_avg"] = mov_avg
        out["mov_min"] = mov_min
        out["mov_max"] = mov_max
        out["mov_count"] = wcnt
        return out

    ds = _as_dataset(source, columns=[key_col, *order_cols, value_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def ratio_to_report(
    source: Any,
    key_col: str,
    value_col: str,
    *,
    columns: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
    num_buckets: Optional[int] = None,
) -> Dataset:
    """Percent-of-total window — SQL ``value / SUM(value) OVER
    (PARTITION BY key)`` (``RATIO_TO_REPORT``), rounded to 6 (the
    float-hash convention). NULL values get NULL shares and contribute
    nothing to their partition's sum; an all-NULL partition divides by
    NULL (share NULL). NULL keys form their own partition (SQL GROUP
    semantics).

    Scale shape — two tiers:

    * default (``num_buckets=None``), NO row shuffle: per-partition
      sums are key-bounded, so pass 1 is a per-batch pyarrow
      ``group_by`` combiner whose partials merge on the driver (one
      float per key), and pass 2 is a single ``map_batches`` probe
      against the broadcast sum map. Rows never move; only key-bounded
      partials do. Right when the distinct-key table fits the driver.
    * ``num_buckets=N``, the beyond-broadcast tier: rows shuffle ONCE
      by ``hash(key) % N`` (:func:`..dedup.bucketed_groupby`) and each
      bucket computes its keys' sums and shares locally — the driver
      never holds any key sums, per-task state is that bucket's keys
      only. Use when key cardinality is unbounded (e.g. URL hosts over
      a web corpus). Output is value-identical to the default tier.
    """
    import pandas as pd

    cols = list(dict.fromkeys([*(columns or []), key_col, value_col]))
    ds = _as_dataset(source, columns=cols)

    if num_buckets is not None:
        from .dedup import bucketed_groupby

        def share_bucket(df: pd.DataFrame) -> pd.DataFrame:
            sums = df.groupby(key_col, dropna=False)[value_col].sum(
                min_count=1
            )
            denom = df[key_col].map(sums).astype(np.float64)
            isna = df[key_col].isna()
            if isna.any():
                nan_rows = sums[sums.index.isna()]
                denom[isna] = (
                    float(nan_rows.iloc[0]) if len(nan_rows) else np.nan
                )
            vals = df[value_col].to_numpy(np.float64, na_value=np.nan)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.round(vals / denom.to_numpy(np.float64), 6)
            res = df.copy()
            res["value_share"] = out
            return res

        return bucketed_groupby(
            ds, [key_col], share_bucket,
            num_buckets=num_buckets, batch_size=batch_size,
        )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([key_col, value_col])
            .group_by([key_col])
            .aggregate([(value_col, "sum")])
        )
        return g.rename_columns([key_col, "__sum"])

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()  # key-bounded
    )
    sums = parts.groupby(key_col, dropna=False, sort=False)["__sum"].sum(
        min_count=1
    )
    # NaN key (pandas groupby dropna=False) keyed separately
    null_sum = float("nan")
    sum_map: Dict[Any, float] = {}
    for k, v in sums.items():
        if pd.isna(k):
            null_sum = v
        else:
            sum_map[k] = v

    def share(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pandas()
        denom = keys.map(sum_map)
        denom[keys.isna()] = null_sum
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = denom.to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.round(vals / d, 6)
        return batch.append_column(
            "value_share", pa.array(out, pa.float64())
        )

    return ds.map_batches(share, batch_format="pyarrow", batch_size=batch_size)


def anomaly_zscore(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    preceding: int = 16,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key trailing-window anomaly score — each row's z-score
    against the mean/stddev of the PRIOR ``preceding`` rows of the same
    key (leakage-free: the window is SQL ``ROWS BETWEEN k PRECEDING AND
    1 PRECEDING``, the current row never scores itself):
    ``zscore = (value − AVG(value) OVER w) / NULLIF(STDDEV_SAMP(value)
    OVER w, 0)``, rounded to 6 (the float-hash convention). NULL when
    the trailing window holds < 2 non-NULL values, when its sample
    stddev is 0 (constant history — NULLIF parity), or when the row's
    own value is NULL.

    Scale shape: identical to :func:`moving_window` — ONE hash-bucket
    shuffle co-locates each key, then ONE vectorized numpy pass per
    bucket; window sums and sums-of-squares are differences of
    extended-precision (longdouble) prefix scans, so no per-row or
    per-key Python. A constant window's variance is snapped to exactly
    0 when the cancellation residue is below 1e-18 of the window's
    mean square, matching SQL's exact-zero stddev → NULL. ``order_cols``
    must totally order each key's rows (include a tiebreak id); NULL
    order values sort last (SQL ``ASC NULLS LAST``).
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    if preceding < 1:
        raise ValueError("preceding must be >= 1")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col] + order_cols, kind="mergesort", na_position="last"
        )
        n = len(g)
        out = g.copy()
        if n == 0:
            out["zscore"] = np.array([], np.float64)
            return out
        u = g[key_col].to_numpy()
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        w_start = np.maximum(seg_start, idx - preceding)
        # trailing window is [w_start, i) — end-EXCLUSIVE: prior rows only

        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        nn = ~np.isnan(vals)
        contrib = np.where(nn, vals, 0.0)
        cs = np.concatenate(([0.0], np.cumsum(contrib, dtype=np.longdouble)))
        cs2 = np.concatenate(
            ([0.0], np.cumsum(contrib * contrib, dtype=np.longdouble))
        )
        cn = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        wsum = cs[idx] - cs[w_start]
        wsumsq = cs2[idx] - cs2[w_start]
        wcnt = cn[idx] - cn[w_start]

        cnt_f = np.maximum(wcnt, 1).astype(np.float64)
        mean = (wsum / cnt_f).astype(np.float64)
        var = ((wsumsq - wsum * wsum / cnt_f) / np.maximum(cnt_f - 1, 1)).astype(
            np.float64
        )
        # constant-history snap: cancellation residue of c²·n prefixes
        # is ~2⁻⁶³ relative; a true zero variance must become EXACT 0 so
        # the NULLIF(stddev,0) parity holds instead of a garbage z.
        msq = (wsumsq / cnt_f).astype(np.float64)
        var = np.where(var <= 1e-18 * np.maximum(msq, 1.0), 0.0, var)
        std = np.sqrt(np.maximum(var, 0.0))

        ok = (wcnt >= 2) & (std > 0) & nn
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(ok, np.round((vals - mean) / np.where(std > 0, std, 1.0), 6), np.nan)
        out["zscore"] = z
        return out

    ds = _as_dataset(source, columns=[key_col, *order_cols, value_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def time_range_window(
    source: Any,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    preceding_seconds: int,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key TIME-based moving aggregates — SQL ``RANGE BETWEEN
    INTERVAL k PRECEDING AND CURRENT ROW`` over a timestamp order
    column: each row aggregates every same-key row whose timestamp
    falls in ``[ts − k, ts]``. RANGE frames include PEERS — rows
    sharing the current timestamp are in the frame even when they
    appear later in row order — which is what distinguishes this from
    the ROWS-based :func:`moving_window` (a row count can't express a
    7-day trailing revenue window on irregular event times).

    Output columns: ``rng_sum`` / ``rng_avg`` (ROUND 6, the float-hash
    convention), ``rng_min`` / ``rng_max`` (exact input values) and
    ``rng_count`` (non-NULL count). SQL NULL semantics: NULL values
    are ignored inside the frame; an all-NULL frame yields NULL
    sum/avg/min/max and count 0. NULL timestamps sort last and frame
    only their fellow NULL-ts peers (the SQL ``RANGE`` NULLS group).

    Scale shape: identical to :func:`moving_window` — ONE hash-bucket
    shuffle co-locates each key, then ONE vectorized pass per bucket.
    Frame bounds come from ``np.searchsorted`` over per-segment
    monotone timestamps (segments made globally monotone by an
    int128-free per-segment offset trick), sums/counts are prefix
    differences in longdouble, extrema reuse the log-doubling sparse
    table queried at each row's frame end.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    if preceding_seconds < 0:
        raise ValueError("preceding_seconds must be >= 0")
    delta_ns = np.int64(preceding_seconds) * 1_000_000_000

    def _range_extrema(
        m0: np.ndarray, w_start: np.ndarray, w_end: np.ndarray, op
    ) -> np.ndarray:
        """extrema over [w_start[i], w_end[i]] (inclusive, nonempty)
        via a log-doubling sparse table of trailing windows."""
        n = len(m0)
        win_len = w_end - w_start + 1
        max_len = int(win_len.max()) if n else 1
        levels = [m0]
        j, span = 0, 1
        while span * 2 <= max_len:
            prev = levels[j]
            nxt = prev.copy()
            op(nxt[span:], prev[:-span], out=nxt[span:])
            levels.append(nxt)
            j += 1
            span *= 2
        j_q = np.floor(np.log2(win_len)).astype(np.int64)
        j_q = np.minimum(j_q, len(levels) - 1)
        spans = np.int64(1) << j_q
        out = np.empty(n, m0.dtype)
        for lvl in range(len(levels)):
            sel = j_q == lvl
            if not sel.any():
                continue
            L = levels[lvl]
            # two overlapping 2^lvl windows: one ending at w_end, one
            # ending at (w_start + 2^lvl - 1)
            out[sel] = op(L[w_end[sel]], L[w_start[sel] + spans[sel] - 1])
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col, ts_col], kind="mergesort", na_position="last"
        )
        n = len(g)
        if n == 0:
            out = g.copy()
            for c in ("rng_sum", "rng_avg", "rng_min", "rng_max"):
                out[c] = np.array([], np.float64)
            out["rng_count"] = np.array([], np.int64)
            return out
        u = g[key_col].to_numpy()
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(new_key) - 1
        ts = g[ts_col].to_numpy("datetime64[ns]").astype(np.int64)
        ts_null = g[ts_col].isna().to_numpy()
        # make segments globally monotone so ONE searchsorted serves
        # every key: offset each segment past the global ts span.
        t_valid = ts[~ts_null]
        lo = t_valid.min() if len(t_valid) else np.int64(0)
        hi = t_valid.max() if len(t_valid) else np.int64(0)
        span = np.int64(hi - lo) + delta_ns + np.int64(2)
        base = ts - lo
        # NULL-ts rows sort last within their segment; give them the
        # base one past the max valid one so `mono` stays sorted AND
        # no non-null row's [target, mono_i] range can reach a prior
        # segment's NULL rows (their own frames are overwritten below)
        base[ts_null] = np.int64(hi - lo) + np.int64(1)
        mono = seg_id * span + base
        w_start = np.searchsorted(mono, mono - delta_ns, side="left")
        w_end = np.searchsorted(mono, mono, side="right") - 1
        # the SQL NULLS frame: NULL-ts rows frame exactly their key's
        # NULL-ts peer group
        if ts_null.any():
            idx = np.arange(n, dtype=np.int64)
            # NULL-ts peer runs are contiguous after the sort (one run
            # per segment tail); frame = the whole run
            grp = np.where(ts_null, seg_id, -1)
            is_start = np.empty(n, bool)
            is_start[0] = True
            is_start[1:] = grp[1:] != grp[:-1]
            run_start = np.maximum.accumulate(np.where(is_start, idx, 0))
            starts = idx[is_start]
            ends = np.append(starts[1:] - 1, n - 1)
            run_end = np.repeat(ends, np.diff(np.append(starts, n)))
            w_start = np.where(ts_null, run_start, w_start)
            w_end = np.where(ts_null, run_end, w_end)

        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        nn = ~np.isnan(vals)
        contrib = np.where(nn, vals, 0.0)
        cs0 = np.concatenate(
            ([0.0], np.cumsum(contrib, dtype=np.longdouble))
        )
        cn0 = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        wsum = (cs0[w_end + 1] - cs0[w_start]).astype(np.float64)
        wcnt = cn0[w_end + 1] - cn0[w_start]
        has = wcnt > 0
        rng_sum = np.where(has, np.round(wsum, 6), np.nan)
        rng_avg = np.where(has, np.round(wsum / np.maximum(wcnt, 1), 6), np.nan)

        mins = _range_extrema(np.where(nn, vals, np.inf), w_start, w_end, np.minimum)
        maxs = _range_extrema(np.where(nn, vals, -np.inf), w_start, w_end, np.maximum)

        out = g.copy()
        out["rng_sum"] = rng_sum
        out["rng_avg"] = rng_avg
        out["rng_min"] = np.where(has, mins, np.nan)
        out["rng_max"] = np.where(has, maxs, np.nan)
        out["rng_count"] = wcnt
        return out

    ds = _as_dataset(source, columns=[key_col, ts_col, value_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def _grouping_sets_aggregate(
    source: Any,
    key_cols: List[str],
    value_col: str,
    sets: "List[tuple[int, List[str]]]",
    level_name: str,
    num_buckets: int,
    batch_size: int,
) -> Dataset:
    """Shared engine for ROLLUP / CUBE / arbitrary GROUPING SETS: each
    batch pre-aggregates EVERY grouping set with pyarrow ``group_by``
    (exchange bounded by #sets × per-batch distinct keys, never rows),
    then one null-safe ``bucketed_groupby`` merge (pandas
    ``dropna=False``) — real NULL keys group correctly, which a plain
    Ray groupby can't guarantee, and stay distinguishable from
    rolled-up NULLs via the ``level_name`` id column. ``value_sum`` is
    int64 exact for integer inputs, else float64 rounded to 6."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        vt = batch[value_col].type
        is_int = pa.types.is_integer(vt)
        val = pc.cast(
            batch[value_col], pa.int64() if is_int else pa.float64()
        )
        out = []
        for set_id, keys in sets:
            t = pa.table(
                {
                    **{c: batch[c] for c in keys},
                    "__n": pa.array(
                        np.ones(batch.num_rows, np.int64), pa.int64()
                    ),
                    "__v": val,
                }
            )
            if keys:
                g = t.group_by(keys).aggregate(
                    [("__n", "sum"), ("__v", "sum")]
                )
            else:
                g = pa.table(
                    {
                        "__n_sum": pa.array(
                            [batch.num_rows], pa.int64()
                        ),
                        "__v_sum": pa.array(
                            [pc.sum(val).as_py() or 0],
                            pa.int64() if is_int else pa.float64(),
                        ),
                    }
                )
            cols = {
                level_name: pa.array(np.full(g.num_rows, set_id, np.int64))
            }
            for c in key_cols:
                cols[c] = (
                    g[c]
                    if c in g.column_names
                    else pa.nulls(g.num_rows, batch[c].type)
                )
            cols["__n"] = g["__n_sum"]
            cols["__v"] = g["__v_sum"]
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([level_name] + key_cols, dropna=False, sort=False)
            .agg(n_rows=("__n", "sum"), value_sum=("__v", "sum"))
            .reset_index()
        )
        if np.issubdtype(agg["value_sum"].dtype, np.floating):
            agg["value_sum"] = agg["value_sum"].round(6)
        agg["n_rows"] = agg["n_rows"].astype(np.int64)
        # rolled-up string keys: emit None (SQL NULL), not float NaN —
        # pandas blocks can reach the caller without an Arrow round-trip,
        # and NaN-in-object-column diverges from every SQL client's output
        # (an all-null bucket comes back float64, hence the forced astype)
        for c in string_keys:
            agg[c] = agg[c].astype(object)
            agg.loc[pd.isna(agg[c]), c] = None
        return agg

    ds = _as_dataset(source, columns=[*key_cols, value_col])
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    def _is_stringy(t) -> bool:
        if isinstance(t, pa.DataType):
            return pa.types.is_string(t) or pa.types.is_large_string(t)
        return t is object or t is str  # pandas-block schema types

    string_keys = [c for c in key_cols if _is_stringy(types[c])]
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        part, [level_name] + key_cols, merge,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def rollup_aggregate(
    source: Any,
    key_cols: List[str],
    value_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``GROUP BY ROLLUP(k1, k2, …)``: aggregates at every prefix
    level — ``(k1,k2,…)``, ``(k1,…)``, …, ``()`` — in ONE pass. Output
    rows carry ``level`` (= number of rolled-up keys, the SQL
    ``GROUPING(k1)+…`` convention), the key columns (NULL where rolled
    up), ``n_rows`` and ``value_sum``. See
    :func:`_grouping_sets_aggregate` for the scale shape."""
    L = len(key_cols)
    sets = [(lvl, key_cols[: L - lvl]) for lvl in range(L + 1)]
    return _grouping_sets_aggregate(
        source, key_cols, value_col, sets, "level",
        num_buckets, batch_size,
    )


def cube_aggregate(
    source: Any,
    key_cols: List[str],
    value_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``GROUP BY CUBE(k1, …, kn)``: aggregates over ALL 2^n key
    subsets in ONE pass. Output rows carry ``grouping_id`` — the SQL
    bitmask convention ``GROUPING(k1)·2^(n-1) + … + GROUPING(kn)``
    (bit set ⇔ that key is rolled up), which unlike a plain level
    count is unique per subset. See :func:`_grouping_sets_aggregate`
    for the scale shape; #sets is 2^n, so keep ``n`` small (the SQL
    planner's own constraint)."""
    L = len(key_cols)
    sets = []
    for mask in range(1 << L):
        keys = [
            key_cols[i] for i in range(L) if not (mask >> (L - 1 - i)) & 1
        ]
        sets.append((mask, keys))
    return _grouping_sets_aggregate(
        source, key_cols, value_col, sets, "grouping_id",
        num_buckets, batch_size,
    )


def top_k_rows(
    source: Any,
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_cols: Optional[List[str]] = None,
    columns: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Global ``ORDER BY order_col [DESC] LIMIT k`` WITHOUT a full
    sort: each batch keeps its own top-k via ``np.argpartition``
    (O(rows) per batch), so only ``k × #batches`` candidate rows reach
    the driver for the final exact sort — the same partial-top-k shape
    as ``knn_brute``. ``tiebreak_cols`` make the cut deterministic
    when ``order_col`` ties at the boundary; NULL order values never
    rank (SQL-filter them oracle-side). Returns the k rows as a
    (small) pandas DataFrame."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[order_col]))
        if batch.num_rows == 0:
            return batch
        v = batch[order_col].to_numpy(zero_copy_only=False)
        key = -v if descending else v
        if batch.num_rows > k:
            idx = np.argpartition(key, k)[:k]
            batch = batch.take(pa.array(np.sort(idx)))
        return batch

    cols = columns
    if cols is not None:
        need = {order_col, *(tiebreak_cols or [])}
        cols = list(dict.fromkeys([*cols, *need]))
    ds = _as_dataset(source, columns=cols)
    cands = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    sort_cols = [order_col] + (tiebreak_cols or [])
    asc = [not descending] + [True] * len(tiebreak_cols or [])
    out = cands.sort_values(
        sort_cols, ascending=asc, kind="mergesort"
    ).head(k)
    if columns is not None:
        out = out[columns]
    return out.reset_index(drop=True)


def global_rank(
    source: Any,
    order_col: str,
    *,
    tiebreak_cols: Optional[List[str]] = None,
    ntile: Optional[int] = None,
    percentiles: bool = False,
    rank_ties: bool = False,
    dense: bool = False,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
    max_dense_distinct: int = 5_000_000,
) -> Dataset:
    """Global ordered window over the WHOLE dataset: appends ``rank``
    (1-based ``ROW_NUMBER() OVER (ORDER BY order_col, tiebreaks)``),
    when ``ntile`` is given ``tile`` (SQL ``NTILE(n)`` — first
    ``N % n`` tiles get the extra row), and when ``percentiles`` is
    set ``percent_rank`` = (rank−1)/(N−1) and ``cume_dist`` = rank/N
    (bit-exact vs SQL under a total order: identical int/int float64
    divisions). NULL order values rank last
    (the ASC ``NULLS LAST`` default); ``tiebreak_cols`` must complete
    a total order for deterministic output.

    A global rank is a prefix scan, not a full sort: values
    range-partition on sampled bounds (``searchsorted`` keeps ties in
    one bucket), per-bucket counts give the driver an exclusive
    prefix, and ONE vectorized sort per bucket assigns
    ``offset + arange``. Only bucket counts reach the driver.

    ``rank_ties`` adds SQL ``RANK()`` (ties — equal ``order_col``
    values, NULLs tying with NULLs — share the rank of their first
    row) at NO extra exchange: a tie run never crosses a bucket, so
    the existing row-count offsets suffice. ``dense`` adds
    ``DENSE_RANK()``, which needs the count of distinct values in
    every PRIOR bucket — one extra distinct-bounded pre-pass
    (per-batch distinct ``(bucket, value)`` pairs merged driver-side;
    meant for categorical/banded columns, where distinct ≪ rows)."""
    import pandas as pd

    sort_cols = [order_col] + (tiebreak_cols or [])

    def sample_bounds(batch: pa.Table) -> pa.Table:
        v = batch[order_col].drop_null()
        return pa.table({"v": v[:: 1024]})

    ds = _as_dataset(source)
    sdf = ds.map_batches(
        sample_bounds, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    if "v" in sdf.columns and len(sdf):
        sampled = np.sort(sdf["v"].to_numpy())
        q = np.linspace(0, len(sampled) - 1, num_buckets + 1)[1:-1]
        bounds = np.unique(sampled[q.astype(np.int64)])
    else:
        bounds = np.empty(0)
    bounds_ref = ray.put(bounds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b_ = ray.get(bounds_ref)
        v = batch[order_col].to_numpy(zero_copy_only=False)
        bkt = (
            np.searchsorted(b_, v, side="right").astype(np.int64)
            if len(b_)
            else np.zeros(len(v), np.int64)
        )
        # NaN/NaT compare false against every bound -> bucket 0; send
        # them to the LAST bucket instead (NULLS LAST)
        null_mask = pc.is_null(batch[order_col]).to_numpy(
            zero_copy_only=False
        )
        if null_mask.any():
            bkt[null_mask] = len(b_)
        return batch.append_column("__bucket", pa.array(bkt, pa.int64()))

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", batch_size=batch_size
    )

    # bucket counts WITHOUT a shuffle: per-batch bincount vectors
    # (≤ num_buckets+1 ints each) summed on the driver
    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch["__bucket"].to_numpy(zero_copy_only=False)
        c = np.bincount(b, minlength=num_buckets + 1)
        return pa.table(
            {"counts": pa.array([c.tolist()], pa.list_(pa.int64()))}
        )

    cnt = np.zeros(num_buckets + 1, dtype=np.int64)
    for r in bucketed.map_batches(
        count_partial, batch_format="pyarrow"
    ).take_all():
        c = np.asarray(r["counts"], dtype=np.int64)
        cnt[: len(c)] += c
    total = int(cnt.sum())
    offs = dict(
        zip(
            range(num_buckets + 1),
            np.concatenate([[0], np.cumsum(cnt)[:-1]]),
        )
    )
    offs_ref = ray.put(offs)
    n = ntile

    dense_offs_ref = None
    if dense:
        # distinct-bounded pre-pass: per-batch distinct (bucket, value)
        # pairs, merged on the driver (categorical/banded columns)
        def distinct_pairs(batch: pa.Table) -> pa.Table:
            return batch.select(["__bucket", order_col]).group_by(
                ["__bucket", order_col]
            ).aggregate([])

        pairs_ds = bucketed.map_batches(
            distinct_pairs, batch_format="pyarrow", batch_size=batch_size
        ).materialize()
        n_pairs = pairs_ds.count()
        if n_pairs > max_dense_distinct:
            raise ValueError(
                f"global_rank(dense=True) would collect {n_pairs} distinct "
                f"(bucket, {order_col}) pairs to the driver (cap "
                f"{max_dense_distinct}); DENSE_RANK needs the distinct "
                "values, which for a continuous column is O(rows) — band "
                "or quantize the order column first, or raise "
                "max_dense_distinct explicitly"
            )
        pairs = pairs_ds.to_pandas().drop_duplicates()
        isna = pairs[order_col].isna()
        per_bucket = (
            pairs[~isna].groupby("__bucket")[order_col].nunique()
            .add(pairs[isna].groupby("__bucket").size(), fill_value=0)
            .astype(np.int64)
        )
        d_cnt = np.zeros(num_buckets + 1, np.int64)
        d_cnt[per_bucket.index.to_numpy()] = per_bucket.to_numpy()
        dense_offs = dict(
            zip(
                range(num_buckets + 1),
                np.concatenate([[0], np.cumsum(d_cnt)[:-1]]),
            )
        )
        dense_offs_ref = ray.put(dense_offs)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        omap = ray.get(offs_ref)
        bkt = int(group["__bucket"].iloc[0])
        base = omap[bkt]
        g = group.sort_values(
            sort_cols, kind="mergesort", na_position="last"
        ).drop(columns="__bucket")
        r0 = base + np.arange(len(g), dtype=np.int64)  # 0-based
        g["rank"] = r0 + 1
        if rank_ties or dense:
            v = g[order_col].to_numpy()
            na = g[order_col].isna().to_numpy()
            m = len(g)
            new_run = np.ones(m, bool)
            if m > 1:
                with np.errstate(invalid="ignore"):
                    neq = v[1:] != v[:-1]
                new_run[1:] = (np.asarray(neq, bool) & ~(na[1:] & na[:-1])) | (
                    na[1:] != na[:-1]
                )
            idx = np.arange(m, dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
            if rank_ties:
                g["rank_ties"] = base + run_start + 1
            if dense:
                dbase = ray.get(dense_offs_ref)[bkt]
                g["dense_rank"] = dbase + np.cumsum(new_run)
        if n:
            q, rem = divmod(total, n)
            split = rem * (q + 1)
            tile = np.where(
                r0 < split,
                r0 // (q + 1) if q + 1 > 0 else 0,
                rem + (np.maximum(r0 - split, 0) // q if q else 0),
            )
            g["tile"] = tile.astype(np.int64) + 1
        if percentiles:
            g["percent_rank"] = (
                r0 / (total - 1) if total > 1 else np.zeros(len(g))
            )
            g["cume_dist"] = (r0 + 1) / total
        return g

    return bucketed.groupby("__bucket").map_groups(
        assign, batch_format="pandas"
    )


def grouped_top_k(
    source: Any,
    key_cols: List[str],
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_cols: Optional[List[str]] = None,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key top-k rows by ``order_col`` — the SQL
    ``QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY order
    [DESC], tiebreaks) <= k`` pattern (k=1 ≡ a deterministic
    ``arg_max``/``arg_min``). NULL order values never rank.

    Scale shape: a per-batch COMBINER keeps at most k rows per key
    before the shuffle (sort + groupby-head, C-speed), so the
    exchange is bounded by k × #batches × #keys-per-batch, never the
    row count; one bucketed groupby then takes the exact top-k per
    key. ``tiebreak_cols`` must complete a total order for
    deterministic output."""
    import pandas as pd

    from .dedup import bucketed_groupby

    sort_cols = [*key_cols, order_col] + (tiebreak_cols or [])
    asc = [True] * len(key_cols) + [not descending] + [True] * len(
        tiebreak_cols or []
    )

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[order_col].notna()]
        if not len(df):
            return df
        return (
            df.sort_values(sort_cols, ascending=asc, kind="mergesort")
            .groupby(key_cols, dropna=False, sort=False)
            .head(k)
        )

    def partial(batch: pa.Table) -> pd.DataFrame:
        return head_k(batch.to_pandas()).reset_index(drop=True)

    ds = _as_dataset(source)
    part = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        part, key_cols, lambda g: head_k(g).reset_index(drop=True),
        num_buckets=num_buckets, batch_size=batch_size,
    )


def set_op(
    left: Any,
    right: Any,
    op: str,
    key_cols: List[str],
    *,
    right_cols: Optional[List[str]] = None,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL set operations: ``intersect`` / ``except`` (DISTINCT
    semantics — rows in both / rows in left not in right) and their
    BAG-semantics siblings ``intersect_all`` / ``except_all``
    (``INTERSECT ALL`` emits each row min(countL, countR) times,
    ``EXCEPT ALL`` max(countL − countR, 0) times). Output columns take
    the LEFT side's names (the SQL convention); NULLs compare equal
    (``IS NOT DISTINCT FROM`` — a NULL row present on both sides
    intersects).

    Scale shape: each side pre-aggregates per batch to (distinct row,
    count) partials (pyarrow ``group_by`` combiner — exchange is
    per-batch-distinct bounded even for the ALL variants: counts ride
    as int64, duplicate rows never travel), sides union with a 0/1
    tag, then ONE null-safe bucketed groupby sums per-side counts and
    decides/replicates per distinct row. No side ever broadcasts."""
    import pandas as pd

    from .dedup import bucketed_groupby

    if op not in ("intersect", "except", "intersect_all", "except_all"):
        raise ValueError(f"unknown set op: {op!r}")
    rcols = right_cols or key_cols

    def side_partials(src: Any, cols: List[str], side: int):
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
            g = g.rename_columns([*key_cols, "__cnt"])
            return g.append_column(
                "__side",
                pa.array(np.full(g.num_rows, side, np.int64)),
            )

        return _as_dataset(src, columns=cols).map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size
        )

    unioned = side_partials(left, key_cols, 0).union(
        side_partials(right, rcols, 1)
    )

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            __cl=np.where(g["__side"].to_numpy() == 0, g["__cnt"].to_numpy(), 0),
            __cr=np.where(g["__side"].to_numpy() == 1, g["__cnt"].to_numpy(), 0),
        )
        agg = (
            g.groupby(key_cols, dropna=False, sort=False)[["__cl", "__cr"]]
            .sum()
            .reset_index()
        )
        cl = agg["__cl"].to_numpy(np.int64)
        cr = agg["__cr"].to_numpy(np.int64)
        if op == "intersect":
            reps = ((cl > 0) & (cr > 0)).astype(np.int64)
        elif op == "except":
            reps = ((cl > 0) & (cr == 0)).astype(np.int64)
        elif op == "intersect_all":
            reps = np.minimum(cl, cr)
        else:  # except_all
            reps = np.maximum(cl - cr, 0)
        idx = np.repeat(np.arange(len(agg), dtype=np.int64), reps)
        return agg.iloc[idx][key_cols].reset_index(drop=True)

    return bucketed_groupby(
        unioned, key_cols, decide,
        num_buckets=num_buckets, batch_size=batch_size,
    )


_TRY_INT_RE = r"^[+-]?\d{1,18}$"
_TRY_FLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def grouped_count_distinct(
    source: Any,
    key_col: str,
    value_col: str,
    *,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """EXACT ``COUNT(DISTINCT value)`` per group. Each batch first
    reduces to its distinct ``(key, value)`` pairs (one pyarrow
    ``group_by`` — the combiner; exchange is distinct-bounded, never
    row-bounded), then ONE hash-bucket shuffle on the key co-locates
    each group and a vectorized ``drop_duplicates`` + C-level count
    per bucket finishes. SQL semantics: NULL values don't count but an
    all-NULL group still appears with 0; NULL keys form a group. The
    approximate sibling (HLL registers, row-count-independent
    exchange) is :func:`grouped_approx_distinct`."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, value_col]).group_by(
            [key_col, value_col]
        ).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key_col, value_col])
        agg = (
            d.groupby(key_col, dropna=False, sort=False)[value_col]
            .count()  # non-null distinct values
            .reset_index(name=out_col)
        )
        agg[out_col] = agg[out_col].astype(np.int64)
        return agg

    ds = _as_dataset(source, columns=[key_col, value_col])
    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        pairs, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def distinct_rows(
    source: Any,
    cols: List[str],
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``SELECT DISTINCT cols``: per-batch pyarrow ``group_by``
    pre-dedup (the combiner — exchange is distinct-bounded), then one
    hash-bucket shuffle and a vectorized ``drop_duplicates`` per
    bucket. NULLs are not distinct from each other (SQL DISTINCT
    semantics; pandas ``drop_duplicates`` agrees)."""
    import pandas as pd  # noqa: F401 — bucket fn signature

    from .dedup import bucketed_groupby

    def pre(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    def per_bucket(g):
        return g.drop_duplicates(cols)

    ds = _as_dataset(source, columns=cols)
    pre_ds = ds.map_batches(
        pre, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        pre_ds, cols, per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def snapshot_diff(
    old: Any,
    new: Any,
    key_cols: List[str],
    value_cols: List[str],
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Diff two dataset snapshots by key — the data-versioning /
    CDC-style audit: one row per key that was ``added`` (new only),
    ``removed`` (old only) or ``changed`` (present in both with any
    value column differing; NULL-safe compare — NULL equals NULL, the
    SQL ``IS DISTINCT FROM`` convention). Unchanged keys emit nothing.
    Output: ``key_cols``, ``change``, and ``{c}_old`` / ``{c}_new``
    per value column (NULL on the absent side).

    Scale shape: both snapshots tag a side column and shuffle ONCE on
    the key hash (equal keys co-locate), then one vectorized outer
    merge + compare per bucket — the :func:`hash_join` shape. Assumes
    keys are unique within each snapshot (a snapshot, not a log);
    duplicate keys produce join-style row multiplication."""
    import pandas as pd

    from .dedup import bucketed_groupby

    o_ds = _as_dataset(old, columns=[*key_cols, *value_cols])
    n_ds = _as_dataset(new, columns=[*key_cols, *value_cols])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__side",
                pa.array(np.full(batch.num_rows, side, np.int8)),
            )

        return fn

    tagged = o_ds.map_batches(tag(0), batch_format="pyarrow").union(
        n_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g.__side == 0, [*key_cols, *value_cols]]
        n = g.loc[g.__side == 1, [*key_cols, *value_cols]]
        m = pd.merge(
            o, n, on=key_cols, how="outer", suffixes=("_old", "_new"),
            indicator=True,
        )
        status = m["_merge"].map(
            {"left_only": "removed", "right_only": "added", "both": None}
        )
        both = status.isna()
        if both.any():
            diff = np.zeros(len(m), bool)
            for c in value_cols:
                a, b = m[f"{c}_old"], m[f"{c}_new"]
                diff |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
            status = status.where(~(both & diff), "changed")
        keep = status.notna()
        out = m.loc[keep, [*key_cols]].copy()
        out["change"] = status[keep].astype(str)
        for c in value_cols:
            out[f"{c}_old"] = m.loc[keep, f"{c}_old"]
            out[f"{c}_new"] = m.loc[keep, f"{c}_new"]
        return out

    return bucketed_groupby(
        tagged, key_cols, per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def try_cast_columns(
    source: Any,
    types: "Dict[str, pa.DataType]",
    *,
    ts_format: str = "%Y-%m-%d %H:%M:%S",
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``TRY_CAST`` for string columns: cast each named column to
    its target type, yielding NULL (never an error) for values that
    don't parse — the dirty-ingestion primitive. Whitespace is trimmed
    first and empty strings are NULL (DuckDB's conventions). Integer
    targets accept ``[+-]?\\d{1,18}`` (≤18 digits guarantees an int64
    fit; DuckDB additionally accepts 19-digit values under 2^63 — the
    one documented divergence), float targets plain/scientific
    notation, timestamp targets parse via ``ts_format`` with
    parse-errors → NULL. Pure per-batch Arrow kernels (regex validity
    mask + cast / ``strptime(error_is_null)``), no shuffle."""

    def cast_batch(batch: pa.Table) -> pa.Table:
        for name, dt in types.items():
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
            if pa.types.is_integer(dt):
                ok = pc.match_substring_regex(s, _TRY_INT_RE)
                # Arrow's int parser rejects an explicit leading '+'
                # (SQL accepts it) — strip it before the cast
                digits = pc.replace_substring_regex(s, r"^\+", "")
                out = pc.cast(pc.if_else(ok, digits, None), dt)
            elif pa.types.is_floating(dt):
                ok = pc.match_substring_regex(s, _TRY_FLOAT_RE)
                out = pc.cast(pc.if_else(ok, s, None), dt)
            elif pa.types.is_timestamp(dt):
                out = pc.cast(
                    pc.strptime(s, format=ts_format, unit=dt.unit,
                                error_is_null=True),
                    dt,
                )
            else:
                raise ValueError(
                    f"unsupported try-cast target for {name!r}: {dt}"
                )
            batch = batch.set_column(
                batch.schema.get_field_index(name), name, out
            )
        return batch

    ds = _as_dataset(source)
    return ds.map_batches(
        cast_batch, batch_format="pyarrow", batch_size=batch_size
    )


def regex_extract(
    source: Any,
    text_col: str,
    pattern: str,
    *,
    keep_cols: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Structured extraction via an RE2 pattern with NAMED groups
    (``(?P<name>…)``): one column per group, NULL when the pattern
    does not match (SQL ``regexp_extract`` convention — both Arrow
    and DuckDB run RE2, so matches are engine-exact). First match
    wins (search semantics). Pure per-batch ``pc.extract_regex``
    (one Rust pass per batch, no shuffle)."""
    import re as _re

    group_names = list(_re.compile(pattern).groupindex)
    if not group_names:
        raise ValueError("pattern must contain named groups (?P<name>…)")

    def extract(batch: pa.Table) -> pa.Table:
        s = batch[text_col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        st = pc.extract_regex(pc.fill_null(s, ""), pattern)
        cols = {
            c: batch[c]
            for c in (keep_cols if keep_cols is not None else batch.column_names)
        }
        for g in group_names:
            cols[g] = pc.struct_field(st, g)
        return pa.table(cols)

    need = keep_cols if keep_cols is not None else None
    ds = _as_dataset(
        source,
        columns=(list(dict.fromkeys([*need, text_col])) if need else None),
    )
    return ds.map_batches(
        extract, batch_format="pyarrow", batch_size=batch_size
    )


def regex_extract_all(
    source: Any,
    id_col: str,
    text_col: str,
    pattern: str,
    *,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """ALL non-overlapping matches of an RE2-compatible pattern per
    row, exploded to ``(id, match_idx, match)`` rows — the link/entity
    scraper: one document yields every URL/mention it contains, with
    ``match_idx`` preserving in-document order (1-based; SQL
    ``unnest(regexp_extract_all(...)) WITH ORDINALITY`` parity). Rows
    with no match emit nothing; NULL text emits nothing.

    One polars Rust-regex ``extract_all`` + explode pass per batch —
    vectorized, no shuffle; output size is match-bounded, not
    row-bounded (cap the pattern's selectivity, not the operator)."""
    import polars as pl

    def extract(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        s = pl.from_arrow(col).fill_null("")
        fr = (
            pl.DataFrame({"__i": pl.int_range(0, len(s), eager=True),
                          "__t": s})
            .with_columns(pl.col("__t").str.extract_all(pattern))
            .explode("__t", empty_as_null=True)
            .filter(pl.col("__t").is_not_null())
            .with_columns(
                (pl.col("__i").cum_count().over("__i")).alias("__r")
            )
        )
        row_idx = fr["__i"].to_numpy()
        return pa.table(
            {
                id_col: pa.array(ids[row_idx]),
                "match_idx": pa.array(
                    fr["__r"].to_numpy().astype(np.int64), pa.int64()
                ),
                "match": pa.array(fr["__t"].to_list(), pa.string()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(
        extract, batch_format="pyarrow", batch_size=batch_size
    )


def json_extract(
    source: Any,
    json_col: str,
    fields: "Dict[str, str]",
    *,
    types: "Optional[Dict[str, pa.DataType]]" = None,
    keep_json: bool = False,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Structured extraction from a JSON string column: for each output
    name in ``fields`` (name → JSON path like ``"$.k"`` or
    ``"$.a.b"``), append a column with the matched value. Scalars come
    back as their unquoted text (the SQL ``->>`` convention) and are
    optionally cast via ``types``; missing paths, JSON nulls and
    unparseable documents all yield NULL — no row ever errors out.

    Pure per-batch ``map_batches`` (polars' Rust JSON-path kernel per
    field — no Python-level parsing, no shuffle); the JSON column is
    dropped after extraction unless ``keep_json``."""
    import polars as pl

    tmap = types or {}

    def extract(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch.select([json_col]))[json_col]
        out = batch if keep_json else batch.drop([json_col])
        for name, path in fields.items():
            v = s.str.json_path_match(path).to_arrow()
            if name in tmap:
                v = pc.cast(v, tmap[name])
            out = out.append_column(name, v)
        return out

    ds = _as_dataset(source)
    return ds.map_batches(
        extract, batch_format="pyarrow", batch_size=batch_size
    )


def explode_column(
    source: Any,
    list_col: str,
    *,
    keep_cols: List[str],
    pos_name: str = "pos",
    value_name: Optional[str] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``UNNEST … WITH ORDINALITY``: one output row per list
    element, carrying ``keep_cols``, a 1-based ``pos_name`` and the
    element value. NULL and empty lists produce no rows (the SQL
    convention). Pure per-batch reshape — flatten + vectorized repeat,
    no Python loop, no shuffle."""
    vname = value_name or f"{list_col}_item"

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = (
            pc.fill_null(pc.list_value_length(col), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(col)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        starts = np.cumsum(lens) - lens
        pos = (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(starts, lens)
            + 1
        )
        cols = {
            c: batch[c].take(pa.array(idx)) for c in keep_cols
        }
        cols[pos_name] = pa.array(pos, pa.int64())
        cols[vname] = flat
        return pa.table(cols)

    ds = _as_dataset(source, columns=[*keep_cols, list_col])
    return ds.map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size
    )


def top_n_plus_other(
    source: Any,
    group_col: str,
    key_col: str,
    value_col: str,
    *,
    n: int = 3,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """The reporting staple: per group, the top-``n`` keys by summed
    value PLUS one ``<other>`` row aggregating everything else — the
    bounded-size breakdown a dashboard wants regardless of key
    cardinality. Ties at the cut break by key ASC (deterministic, the
    SQL ROW_NUMBER convention). Emits ``(group, key_out, value_sum,
    n_keys)`` with ``value_sum`` ROUND 6; groups with ≤ n keys emit no
    other-row. NULL groups/keys drop (SQL GROUP BY over non-null
    breakdowns).

    Scale shape: ONE (group, key)-bounded combiner groupby (raw rows
    never shuffle), then a bucketed per-group partial sort handles all
    groups vectorized."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, key_col, value_col])
        m = pc.and_(
            pc.is_valid(t[group_col]), pc.is_valid(t[key_col])
        )
        t = t.filter(m)
        g = t.group_by([group_col, key_col]).aggregate(
            [(value_col, "sum"), (value_col, "count")]
        )
        return g.rename_columns([group_col, key_col, "__s", "__c"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([group_col, key_col], sort=False)[["__s", "__c"]]
            .sum()
            .reset_index()
        )
        # top-n per group: sort by (group, -sum, key), take first n
        agg = agg.sort_values(
            [group_col, "__s", key_col], ascending=[True, False, True],
            kind="mergesort",
        )
        rank = agg.groupby(group_col, sort=False).cumcount()
        top = agg[rank < n].copy()
        rest = agg[rank >= n]
        top_rows = pd.DataFrame(
            {
                group_col: top[group_col].to_numpy(),
                "key_out": top[key_col].astype(str).to_numpy(),
                "value_sum": np.round(top["__s"].to_numpy(np.float64), 6),
                "n_keys": np.ones(len(top), np.int64),
            }
        )
        if len(rest):
            oth = rest.groupby(group_col, sort=False).agg(
                value_sum=("__s", "sum"), n_keys=(key_col, "size")
            ).reset_index()
            other_rows = pd.DataFrame(
                {
                    group_col: oth[group_col].to_numpy(),
                    "key_out": np.full(len(oth), "<other>", object),
                    "value_sum": np.round(
                        oth["value_sum"].to_numpy(np.float64), 6
                    ),
                    "n_keys": oth["n_keys"].to_numpy(np.int64),
                }
            )
            top_rows = pd.concat([top_rows, other_rows], ignore_index=True)
        return top_rows

    ds = _as_dataset(source, columns=[group_col, key_col, value_col])
    parts = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        parts, [group_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def period_distinct(
    source: Any,
    ts_col: str,
    key_col: str,
    *,
    unit: str = "day",
    batch_size: int = 64 * 1024,
) -> Dataset:
    """EXACT distinct keys per calendar period — the DAU/WAU/MAU
    family: per ``date_trunc(unit, ts)``, COUNT(DISTINCT key). NULL
    timestamps and NULL keys drop (SQL COUNT(DISTINCT) semantics).

    Scale shape: each batch pre-distincts its (period, key) pairs (the
    combiner — exchange is per-batch-distinct pairs, bounded by
    periods × active keys, never raw events), ONE groupby dedupes
    pairs globally, and a second periods-bounded count closes it. For
    cardinalities beyond the pair shuffle use the HLL sibling
    (:func:`grouped_approx_distinct` keyed on the floored period)."""

    def pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch[ts_col]), pc.is_valid(batch[key_col]))
        )
        ts = batch[ts_col].cast(pa.timestamp("us"))
        win = pc.cast(
            pc.floor_temporal(ts, unit=unit), pa.timestamp("us")
        ).cast(pa.int64())
        t = pa.table({"__w": win, "__k": batch[key_col]})
        return t.group_by(["__w", "__k"]).aggregate([])

    ds = _as_dataset(source, columns=[ts_col, key_col])
    dedup = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["__w", "__k"])
        .count()
    )

    def per_period(batch: pa.Table) -> pa.Table:
        t = pa.table({"__w": batch["__w"]})
        g = t.group_by(["__w"]).aggregate([([], "count_all")])
        return g.rename_columns(["__w", "n"])

    from ray.data.aggregate import Sum

    out = (
        dedup.map_batches(per_period, batch_format="pyarrow")
        .groupby("__w")
        .aggregate(Sum("n", alias_name="n_distinct"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "period_start": pa.array(
                    batch["__w"].to_numpy(zero_copy_only=False).astype(
                        "datetime64[us]"
                    )
                ),
                "n_distinct": pc.cast(batch["n_distinct"], pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def rolling_period_distinct(
    source: Any,
    ts_col: str,
    key_col: str,
    *,
    window_periods: int = 7,
    unit: str = "day",
    batch_size: int = 64 * 1024,
) -> Dataset:
    """EXACT rolling-window distinct keys — the WAU/MAU-as-of-each-day
    metric: for every period `d` PRESENT in the data, the number of
    distinct keys active in ``[d − (window_periods−1), d]``. Day units
    use exact epoch arithmetic; calendar units follow
    ``pc.floor_temporal``.

    Scale shape: the :func:`period_distinct` pair combiner first
    (per-batch distinct (period, key) — raw events never fan out),
    then each DISTINCT pair replicates to its ≤ ``window_periods``
    covering windows and one groupby dedupes (pair × window bounded —
    the classic exact sliding-distinct trade; beyond it, per-day HLL
    registers merge across the window instead). Windows with no
    activity on their anchor day are not emitted (anchor = a period
    present in the data, the SQL join-on-present-days convention)."""
    if unit != "day":
        raise ValueError(
            "rolling_period_distinct supports unit='day' (exact epoch "
            "arithmetic); calendar months need the HLL-merge tier"
        )
    day_us = np.int64(86_400_000_000)

    def pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch[ts_col]), pc.is_valid(batch[key_col]))
        )
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # numpy // floors toward -inf, so pre-epoch (negative)
        # timestamps bucket like DuckDB time_bucket (pc.divide
        # truncates toward zero and put them one window too high)
        day = pa.array((ts // day_us) * day_us, pa.int64())
        t = pa.table({"__d": day, "__k": batch[key_col]})
        return t.group_by(["__d", "__k"]).aggregate([])

    ds = _as_dataset(source, columns=[ts_col, key_col])
    pair_ds = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["__d", "__k"])
        .count()
    )

    # anchor days = periods present (small; collected once)
    anchor_days = set()
    for b in pair_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        anchor_days.update(b["__d"].to_numpy(zero_copy_only=False).tolist())
    anchors = np.array(sorted(anchor_days), np.int64)
    import ray as _ray

    anchors_ref = _ray.put(anchors)

    def fan_out(batch: pa.Table) -> pa.Table:
        anc = _ray.get(anchors_ref)
        d = batch["__d"].to_numpy(zero_copy_only=False)
        k = batch["__k"]
        # each (day, key) pair covers anchor windows w with
        # w - (window-1) <= d <= w  ->  anchors in [d, d + window - 1]
        lo = np.searchsorted(anc, d, "left")
        hi = np.searchsorted(anc, d + (window_periods - 1) * day_us, "right")
        reps = (hi - lo).astype(np.int64)
        idx = np.repeat(np.arange(len(d), dtype=np.int64), reps)
        # windows for row i: anc[lo[i] : hi[i]] — vectorized ragged
        # ranges (repeat base + within-segment arange), no Python loop
        base = np.repeat(lo, reps)
        seg0 = np.repeat(np.cumsum(reps) - reps, reps)
        offs = base + (np.arange(len(base), dtype=np.int64) - seg0)
        return pa.table(
            {
                "__w": pa.array(anc[offs], pa.int64()),
                "__k": k.take(pa.array(idx, pa.int64())),
            }
        )

    from ray.data.aggregate import Sum

    win_pairs = (
        pair_ds.map_batches(fan_out, batch_format="pyarrow")
        .groupby(["__w", "__k"])
        .count()
    )

    def per_window(batch: pa.Table) -> pa.Table:
        g = pa.table({"__w": batch["__w"]}).group_by(["__w"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["__w", "n"])

    out = (
        win_pairs.map_batches(per_window, batch_format="pyarrow")
        .groupby("__w")
        .aggregate(Sum("n", alias_name="n_distinct"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "period_start": pa.array(
                    batch["__w"].to_numpy(zero_copy_only=False).astype(
                        "datetime64[us]"
                    )
                ),
                "n_distinct": pc.cast(batch["n_distinct"], pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def period_over_period(
    source: Any,
    ts_col: str,
    value_col: str,
    *,
    unit: str = "day",
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """Period-over-period growth report — per calendar period
    (``date_trunc`` semantics, calendar-aware): ``value_sum`` (ROUND
    6), the previous period's sum, absolute change and ``pct_change``
    = (cur − prev)/prev (ROUND 6; NULL for the first period or when
    the previous sum is 0). Gap periods are NOT densified — "previous"
    means the previous period PRESENT, the SQL ``LAG`` convention
    (compose :func:`spine_fill` first for calendar-dense change).

    Scale shape: the :func:`calendar_aggregate` combiner (in-batch
    pyarrow group_by on the floored period — exchange is periods ×
    batches), then the LAG layer runs on the period-bounded result on
    the driver."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[ts_col]))
        ts = batch[ts_col].cast(pa.timestamp("us"))
        win = pc.cast(
            pc.floor_temporal(ts, unit=unit), pa.timestamp("us")
        ).cast(pa.int64())
        t = batch.select([value_col]).append_column("__w", win)
        g = t.group_by(["__w"]).aggregate([(value_col, "sum")])
        return g.rename_columns(["__w", "v_sum"])

    from ray.data.aggregate import Sum

    ds = _as_dataset(source, columns=[ts_col, value_col])
    merged = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__w")
        .aggregate(Sum("v_sum", alias_name="v"))
        .to_pandas()  # period-bounded
        .sort_values("__w")
        .reset_index(drop=True)
    )
    cur = merged["v"].to_numpy(np.float64)
    prev = np.empty_like(cur)
    prev[0] = np.nan
    prev[1:] = cur[:-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        pct = np.where(
            ~np.isnan(prev) & (prev != 0),
            np.round((cur - prev) / prev, 6),
            np.nan,
        )
    return pd.DataFrame(
        {
            "period_start": merged["__w"].to_numpy().astype("datetime64[us]"),
            "value_sum": np.round(cur, 6),
            "prev_sum": np.round(prev, 6),
            "abs_change": np.round(cur - prev, 6),
            "pct_change": pct,
        }
    )


def calendar_aggregate(
    source: Any,
    ts_col: str,
    value_col: str,
    *,
    key_cols: Optional[List[str]] = None,
    unit: str = "month",
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Calendar-unit aggregation — the ``date_trunc`` family that
    epoch-arithmetic tumbling windows can't express (months/quarters/
    years vary in length; weeks align to Monday): per
    (``date_trunc(unit, ts)``, keys) emit ``n_events``, ``value_sum``
    and ``value_avg`` (floats rounded to 6). Same combiner shape as
    :func:`windowed_aggregate` — in-batch pyarrow ``group_by`` flooring
    with ``pc.floor_temporal`` (calendar-aware, Monday weeks = the SQL
    convention), then a small global groupby; exchange bounded by
    periods × keys × batches. NULL timestamps drop; NULL values count
    toward ``n_events`` only."""
    key_cols = list(key_cols or [])

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[ts_col]))
        ts = batch[ts_col].cast(pa.timestamp("us"))
        win = pc.cast(
            pc.floor_temporal(ts, unit=unit), pa.timestamp("us")
        ).cast(pa.int64())
        t = batch.select(key_cols + [value_col]).append_column("__w", win)
        g = t.group_by(["__w"] + key_cols).aggregate(
            [
                ("__w", "count"),
                (value_col, "sum"),
                (value_col, "count"),
            ]
        )
        return g.rename_columns(
            ["__w"] + key_cols + ["n", "v_sum", "v_cnt"]
        )

    ds = _as_dataset(source, columns=[ts_col, value_col] + key_cols)
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )

    from ray.data.aggregate import Sum

    out = part.groupby(["__w"] + key_cols).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("v_sum", alias_name="__vs"),
        Sum("v_cnt", alias_name="__vc"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        period = pa.array(
            batch["__w"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
        )
        vs = batch["__vs"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        vc = batch["__vc"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = np.where(vc > 0, np.round(vs / vc, 6), np.nan)
            vsum = np.where(vc > 0, np.round(vs, 6), np.nan)
        cols = {"period": period}
        for c in key_cols:
            cols[c] = batch[c]
        cols["n_events"] = pc.cast(batch["n_events"], pa.int64())
        cols["value_sum"] = pa.array(vsum, pa.float64())
        cols["value_avg"] = pa.array(avg, pa.float64())
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


_SPINE_FREQ = {
    "minute": "min",
    "hour": "h",
    "day": "D",
    "week": "W-MON",
    "month": "MS",
    "quarter": "QS",
    "year": "YS",
}


def spine_fill(
    source: Any,
    ts_col: str,
    value_col: str,
    *,
    key_cols: Optional[List[str]] = None,
    unit: str = "day",
    batch_size: int = 64 * 1024,
    max_cells: int = 10_000_000,
) -> pd.DataFrame:
    """Calendar spine with gap filling — :func:`calendar_aggregate`
    densified so every (key, period) cell of the full grid exists:
    missing periods get ``n_events = 0`` and NULL ``value_sum`` /
    ``value_avg`` (the SQL ``generate_series`` spine LEFT JOIN
    convention; the downstream use is drift-over-time and
    :func:`forward_fill`-able series). The spine spans the GLOBAL
    ``[min period, max period]`` range; keys are the observed distinct
    key tuples.

    Scale shape: all row-bounded work happens in the calendar
    aggregate's combiner; the fill operates on its (periods × keys)-
    bounded result, which is collected — the same small-result
    convention as ``top_k_rows``. Returns a pandas DataFrame sorted by
    (period, keys)."""
    key_cols = list(key_cols or [])
    agg = calendar_aggregate(
        source, ts_col, value_col, key_cols=key_cols, unit=unit,
        batch_size=batch_size,
    ).to_pandas()
    if len(agg) == 0:
        return agg
    freq = _SPINE_FREQ[unit]
    periods = pd.date_range(
        agg["period"].min(), agg["period"].max(), freq=freq
    )
    if key_cols:
        kdf = (
            agg[key_cols].drop_duplicates()
            .sort_values(key_cols)
            .reset_index(drop=True)
        )
        n_cells = len(periods) * len(kdf)
        if n_cells > max_cells:
            raise ValueError(
                f"spine_fill grid is {len(periods)} periods × {len(kdf)} "
                f"key tuples = {n_cells} cells (cap {max_cells}); narrow "
                "the time range / coarsen the unit / reduce key "
                "cardinality, or raise max_cells explicitly"
            )
        # build the dense grid with repeat/tile (no Python tuple list —
        # ADVICE round 2), in the same (period, *keys) sorted order
        grid_df = pd.DataFrame({"period": np.repeat(periods.values, len(kdf))})
        for c in key_cols:
            grid_df[c] = np.tile(kdf[c].to_numpy(), len(periods))
        out = grid_df.merge(agg, on=["period", *key_cols], how="left")
    else:
        out = (
            agg.set_index("period")
            .reindex(periods.rename("period"))
            .reset_index()
        )
    out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
    return out.sort_values(["period", *key_cols]).reset_index(drop=True)


def forward_fill(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    filled_name: Optional[str] = None,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key ordered forward fill (LOCF): appends ``filled_name``
    (default ``{value_col}_filled``) = the last non-NULL value at or
    before each row in ``order_cols`` order — SQL
    ``LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY key ORDER BY …
    ROWS UNBOUNDED PRECEDING)``. Rows before a key's first non-NULL
    stay NULL. Same single-shuffle hash-bucket shape as
    :func:`running_window`; the fill itself is one vectorized
    last-valid-index propagation (``np.maximum.accumulate``) per
    bucket, reset at key boundaries."""
    import pandas as pd

    from .dedup import bucketed_groupby

    out_name = filled_name or f"{value_col}_filled"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col] + order_cols, kind="mergesort", na_position="last"
        )
        m = len(g)
        u = g[key_col].to_numpy()
        new_key = np.empty(m, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        valid = g[value_col].notna().to_numpy()
        idx = np.arange(m, dtype=np.int64)
        # last valid index at/before each row: a global running max of
        # valid indices, clamped to this key's segment — any index from
        # an earlier key is < seg_start, so the clamp alone prevents
        # cross-key leakage
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        gmax = np.maximum.accumulate(np.where(valid, idx, -1))
        last = np.where(gmax >= seg_start, gmax, -1)
        vals = g[value_col].to_numpy()
        out = g.copy()
        filled = pd.Series(vals[np.maximum(last, 0)], index=g.index)
        filled[last < 0] = None
        out[out_name] = filled
        return out

    ds = _as_dataset(source, columns=[key_col, *order_cols, value_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def unpivot(
    source: Any,
    id_cols: List[str],
    value_cols: List[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Wide→long reshape (melt / SQL UNPIVOT): each input row becomes
    ``len(value_cols)`` rows ``(id_cols…, variable, value)``. Value
    columns cast to float64 (the common supertype — SQL UNPIVOT
    likewise unifies the value column's type). NULL values are KEPT
    (DuckDB ``UNPIVOT … INCLUDE NULLS`` / the UNION ALL formulation).

    Embarrassingly parallel — a pure per-batch ``map_batches`` with no
    shuffle; the ×``len(value_cols)`` row inflation happens inside the
    streaming pass, never materialized."""

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            parts.append(
                pa.table(
                    {
                        **{ic: batch[ic] for ic in id_cols},
                        var_name: pa.array(
                            np.full(batch.num_rows, vc), pa.string()
                        ),
                        value_name: pc.cast(batch[vc], pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    ds = _as_dataset(source, columns=[*id_cols, *value_cols])
    return ds.map_batches(
        melt, batch_format="pyarrow", batch_size=batch_size
    )


def anti_join_broadcast(
    source: Any,
    blocklist: Any,
    *,
    key_col: str,
    block_key: Optional[str] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Blocklist filter (NOT IN / anti-semi-join): keep source rows
    whose key does NOT appear in the blocklist. The blocklist is
    collected once, sorted, broadcast via ONE ``ray.put``, and each
    batch probes it with ``np.searchsorted`` — the big side never
    shuffles (the documented small-side assumption: opt-out lists,
    banned domains, leaked-benchmark ids are tiny next to the corpus;
    for a blocklist too big to broadcast, use :func:`hash_join`
    machinery with an anti flag per bucket instead).

    SQL ``NOT IN`` nuance handled the pragmatic way: NULL source keys
    are KEPT (they match nothing), and NULL blocklist entries are
    ignored — i.e. ``anti join`` / ``NOT EXISTS`` semantics, not the
    three-valued ``NOT IN`` footgun.
    """
    bk = block_key or key_col
    bl = _as_dataset(blocklist, columns=[bk]).to_pandas()
    # an empty Ray dataset drops its schema → defend the column access
    col = bl[bk] if bk in bl.columns else pd.Series([], dtype=object)
    keys = np.sort(col.dropna().unique())
    keys_ref = ray.put(keys)

    def keep(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        v = batch[key_col].to_numpy(zero_copy_only=False)
        valid = ~pd.isna(v)
        hit = np.zeros(len(v), bool)
        if valid.any() and len(ks):
            idx = np.searchsorted(ks, v[valid])
            idx[idx >= len(ks)] = 0
            hit[valid] = ks[idx] == v[valid]
        return batch.filter(pa.array(~hit, pa.bool_()))

    ds = _as_dataset(source, columns=None)
    return ds.map_batches(keep, batch_format="pyarrow", batch_size=batch_size)


def semi_join_broadcast(
    source: Any,
    keyset: Any,
    *,
    key_col: str,
    set_key: Optional[str] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """EXISTS / semi-join filter: keep source rows whose key DOES
    appear in the (small) key set — the mirror of
    :func:`anti_join_broadcast` with the same scale shape: the set is
    collected once, sorted, broadcast via ONE ``ray.put``, and each
    batch probes it with ``np.searchsorted``; the corpus never
    shuffles. NULL source keys are dropped (they match nothing —
    EXISTS semantics) and NULL set entries are ignored. Source rows
    are never duplicated regardless of set-side duplicates, which is
    what distinguishes a semi-join from an inner join."""
    sk = set_key or key_col
    kd = _as_dataset(keyset, columns=[sk]).to_pandas()
    col = kd[sk] if sk in kd.columns else pd.Series([], dtype=object)
    keys = np.sort(col.dropna().unique())
    keys_ref = ray.put(keys)

    def keep(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        v = batch[key_col].to_numpy(zero_copy_only=False)
        valid = ~pd.isna(v)
        hit = np.zeros(len(v), bool)
        if valid.any() and len(ks):
            idx = np.searchsorted(ks, v[valid])
            idx[idx >= len(ks)] = 0
            hit[valid] = ks[idx] == v[valid]
        return batch.filter(pa.array(hit, pa.bool_()))

    ds = _as_dataset(source, columns=None)
    return ds.map_batches(keep, batch_format="pyarrow", batch_size=batch_size)


def grouped_string_agg(
    source: Any,
    key_cols: List[str],
    value_col: str,
    *,
    order_cols: List[str],
    sep: str = ",",
    out_col: str = "agg",
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``string_agg(value, sep ORDER BY …)`` per group: one row per
    key with the group's non-NULL values stringified and joined in
    ``order_cols`` order (NULL order values sort last, the SQL ``ASC
    NULLS LAST`` default). Groups whose values are all NULL emit a NULL
    aggregate, as SQL does. ``order_cols`` must totally order each
    group's rows (include a tiebreak) or the concatenation is
    arrival-dependent.

    Scale shape: ONE hash-bucket shuffle co-locates each group, then
    ONE vectorized pass per bucket — sort, rebuild ``list<string>``
    offsets over the non-NULL values, and a single ``pc.binary_join``
    kernel concatenates every group at C speed (no per-group Python;
    the same reassembly trick as paragraph dedup). Documented
    assumption: one group's concatenation fits a worker's heap."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            key_cols + order_cols, kind="mergesort", na_position="last"
        )
        n = len(g)
        if n == 0:
            cols = {c: g[c] for c in key_cols}
            cols[out_col] = pd.Series([], dtype=object)
            return pd.DataFrame(cols)
        new_grp = np.zeros(n, bool)
        new_grp[0] = True
        for c in key_cols:
            k = g[c].to_numpy()
            isna = pd.isna(k)
            with np.errstate(invalid="ignore"):
                neq = k[1:] != k[:-1]
            # NULL keys group together (NaN != NaN would split them)
            both_na = isna[1:] & isna[:-1]
            new_grp[1:] |= np.asarray(neq, bool) & ~both_na
            new_grp[1:] |= isna[1:] != isna[:-1]
        grp_id = np.cumsum(new_grp) - 1
        n_grps = int(grp_id[-1]) + 1

        vals = g[value_col]
        nn = vals.notna().to_numpy()
        strs = vals[nn].astype(str).to_numpy()
        counts = np.bincount(grp_id[nn], minlength=n_grps)
        offsets = np.zeros(n_grps + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(strs, pa.string())
        )
        joined = pc.binary_join(lst, sep).to_pandas()
        joined[counts == 0] = None

        first = np.flatnonzero(new_grp)
        out = {c: g[c].to_numpy()[first] for c in key_cols}
        out[out_col] = joined
        return pd.DataFrame(out)

    cols = list(dict.fromkeys([*key_cols, *order_cols, value_col]))
    ds = _as_dataset(source, columns=cols)
    return bucketed_groupby(
        ds, key_cols, per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def pivot_counts(
    source: Any,
    key_col: str,
    cat_col: str,
    categories: List[str],
    *,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Pivoted categorical counts: one row per key with a ``n_<cat>``
    int64 column per listed category (e.g. per-user event-type
    breakdown). Categories outside the list are ignored; the column
    set is FIXED up front so the schema is stable and the combiner
    stays one vectorized pass.

    Scale shape: each batch one-hot-sums per key (pyarrow
    ``group_by`` over boolean casts — the combiner), the global
    groupby then merges ≤ #keys × #batches partial rows with plain
    Sums. No pivot stage after the shuffle — the wide layout exists
    from the first pass."""
    from ray.data.aggregate import Sum

    names = [f"n_{c}" for c in categories]

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch[cat_col]
        cols = {key_col: batch[key_col]}
        for c, nm in zip(categories, names):
            cols[nm] = pc.cast(
                pc.fill_null(pc.equal(cat, c), False), pa.int64()
            )
        t = pa.table(cols)
        g = t.group_by(key_col).aggregate([(nm, "sum") for nm in names])
        return g.rename_columns([key_col] + names)

    ds = _as_dataset(source, columns=[key_col, cat_col])
    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby(key_col)
        .aggregate(*[Sum(nm, alias_name=nm) for nm in names])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        for nm in names:
            cols[nm] = pc.cast(batch[nm], pa.int64())
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_approx_distinct(
    source: Any,
    group_col: str,
    value_col: str,
    *,
    p: int = 12,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Approximate COUNT(DISTINCT value) PER GROUP via mergeable
    HyperLogLog partials — the "distinct users per event type over a
    trillion rows" shape where exact per-group distinct would shuffle
    every (group, value) pair.

    Each batch builds one HLL register blob per group it sees (a batch
    contributes ≤ #groups blobs of 2^p bytes, never per-row data); the
    global groupby merges register blobs with elementwise max. Exchange
    volume is #groups × #batches × 4 KiB at p=12 — independent of row
    count. ~1.6 % standard error at p=12; raise ``p`` for tighter.

    Output: ``group, approx_distinct (int64)``.
    """
    import pandas as pd

    from ..functions.sketches import HyperLogLog, hash64

    def partials(batch: pa.Table) -> pa.Table:
        vals = batch[value_col]
        valid = pc.is_valid(vals)
        t = batch.filter(valid)
        if t.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], batch[group_col].type),
                 "__hll": pa.array([], pa.binary())}
            )
        h = hash64(t[value_col].to_numpy(zero_copy_only=False))
        groups, blobs = [], []
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False), "h": h,
        })
        for g, sub in df.groupby("g", sort=False):
            hll = HyperLogLog(p)
            hll.add_hashes(sub["h"].to_numpy())
            groups.append(g)
            blobs.append(hll.registers.tobytes())
        return pa.table(
            {group_col: pa.array(groups),
             "__hll": pa.array(blobs, pa.binary())}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, np.uint8)
        for b in g["__hll"]:
            regs = np.maximum(regs, np.frombuffer(b, np.uint8))
        est = HyperLogLog(p, regs).estimate()
        return pd.DataFrame(
            {group_col: [g[group_col].iloc[0]],
             "approx_distinct": [np.int64(round(est))]}
        )

    ds = _as_dataset(source, columns=[group_col, value_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return part.groupby(group_col).map_groups(merge, batch_format="pandas")


def broadcast_join(
    left: Any,
    right: Any,
    *,
    on: str,
    right_on: Optional[str] = None,
    right_cols: Optional[List[str]] = None,
    how: str = "inner",
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Broadcast hash join: enrich a huge left stream with a SMALL
    right table (dimension enrichment — events × customers). The right
    side is collected once, shipped once via ``ray.put``, and probed
    inside every ``map_batches`` call with vectorized
    ``searchsorted`` — no shuffle of the big side, the canonical
    small-side pattern the brief names. ``how``: ``inner`` drops
    unmatched left rows, ``left`` null-fills.

    NULL join keys never match (SQL semantics). The right side must be
    unique on its key (duplicate keys raise — fan-out joins need the
    shuffle path, which `bucketed_groupby` composes if ever needed).
    """
    rkey = right_on or on
    r_ds = _as_dataset(right, columns=None)
    r_tbl = pa.concat_tables(
        r_ds.iter_batches(batch_size=65536, batch_format="pyarrow"),
        promote_options="default",
    )
    rc = right_cols or [c for c in r_tbl.column_names if c != rkey]
    keys = r_tbl[rkey].to_numpy(zero_copy_only=False)
    valid = ~pd.isna(keys)
    keys = keys[valid].astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError("broadcast_join right side has duplicate keys")
    payload = {
        c: r_tbl[c].to_numpy(zero_copy_only=False)[valid][order] for c in rc
    }
    side_ref = ray.put((keys, payload))

    def probe(batch: pa.Table) -> pa.Table:
        k_sorted, pay = ray.get(side_ref)
        lk = batch[on]
        lk_np = lk.to_numpy(zero_copy_only=False)
        lk_valid = pc.is_valid(lk).to_numpy(zero_copy_only=False)
        safe = np.where(lk_valid, lk_np, 0).astype(np.int64)
        pos = np.searchsorted(k_sorted, safe)
        pos_c = np.minimum(pos, max(len(k_sorted) - 1, 0))
        hit = (
            lk_valid
            & (len(k_sorted) > 0)
            & (k_sorted[pos_c] == safe)
        )
        if how == "inner":
            batch = batch.filter(pa.array(hit, pa.bool_()))
            pos_c = pos_c[hit]
            hit = np.ones(len(pos_c), bool)
        cols = {c: batch[c] for c in batch.column_names}
        for c, arr in pay.items():
            vals = arr[pos_c]
            cols[c] = pa.array(
                np.where(hit, vals, None) if how == "left" else vals
            )
        return pa.table(cols)

    l_ds = _as_dataset(left, columns=None)
    return l_ds.map_batches(
        probe, batch_format="pyarrow", batch_size=batch_size
    )


def grouped_quantiles(
    source: Any,
    group_col: str,
    value_col: str,
    *,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    delta: int = 200,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Approximate per-group quantiles via mergeable t-digest partials
    (p50/p95/p99 latency per endpoint over a trillion events): each
    batch emits one digest blob per group it sees; the groupby merges
    blobs and evaluates the quantiles. Exchange volume is #groups ×
    #batches × O(delta) centroids — row-count-independent.

    Deterministic: t-digest merge is order-sensitive, so blobs are
    merged in canonical (byte-sorted) order regardless of shuffle
    arrival order. NULL values are ignored (SQL aggregate semantics).
    """
    import pandas as pd

    from ..functions.sketches import TDigest

    qcols = [f"p{int(q * 100)}" for q in quantiles]

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], batch[group_col].type),
                 "__td": pa.array([], pa.binary())}
            )
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "v": t[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
        })
        groups, blobs = [], []
        for g, sub in df.groupby("g", sort=False):
            td = TDigest(delta)
            td.add(sub["v"].to_numpy())
            groups.append(g)
            blobs.append(td.to_bytes())
        return pa.table(
            {group_col: pa.array(groups), "__td": pa.array(blobs, pa.binary())}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        td = None
        for b in sorted(g["__td"]):  # canonical order → deterministic
            d = TDigest.from_bytes(b)
            td = d if td is None else td.merge(d)
        row = {group_col: [g[group_col].iloc[0]]}
        for q, c in zip(quantiles, qcols):
            row[c] = [td.quantile(q)]
        return pd.DataFrame(row)

    ds = _as_dataset(source, columns=[group_col, value_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    return part.groupby(group_col).map_groups(merge, batch_format="pandas")


def hopping_window_aggregate(
    source: Any,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int = 3600,
    hop_seconds: int = 900,
    key_cols: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Hopping (sliding) window stats: every ``hop_seconds`` a window
    of length ``window_seconds`` closes; events belong to
    ``window/hop`` overlapping windows. Output:
    ``[*key_cols,] window_start, n_events, value_sum`` (int64 sums
    over the events table's float values are kept as float64).
    ``key_cols`` makes the windows per-key (e.g. per user).

    Implementation: each batch REPLICATES its rows into their covering
    windows via vectorized repeat (the inflation factor window/hop is
    explicit and bounded), pre-aggregates per (key, window) in-batch,
    then a small global groupby merges partials — same two-level shape
    as the tumbling tier, exchange bounded by #(keys × windows) ×
    #batches.
    """
    if window_seconds % hop_seconds:
        raise ValueError("window_seconds must be a multiple of hop_seconds")
    keys = list(key_cols or [])
    k = window_seconds // hop_seconds
    hop_us = np.int64(hop_seconds) * 1_000_000

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[ts_col]))
        ts = (
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # latest window containing ts starts at floor(ts/hop)*hop;
        # the k covering windows step back by hop each
        last = (ts // hop_us) * hop_us
        wins = last[:, None] - (np.arange(k, dtype=np.int64) * hop_us)[None, :]
        flat_w = wins.reshape(-1)
        flat_v = np.repeat(v, k)
        cols = {"__w": pa.array(flat_w, pa.int64()),
                "v": pa.array(flat_v, pa.float64())}
        if keys:
            # key columns replicate by row-index take (works for any
            # key dtype, no numpy round-trip)
            idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), k))
            for kc in keys:
                cols[kc] = batch[kc].take(idx)
        t = pa.table(cols)
        g = t.group_by(keys + ["__w"]).aggregate(
            [("v", "count"), ("v", "sum")]
        )
        return g.rename_columns(keys + ["__w", "n", "v_sum"])

    ds = _as_dataset(source, columns=keys + [ts_col, value_col])
    part = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size
    )
    from ray.data.aggregate import Sum

    out = part.groupby(keys + ["__w"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("v_sum", alias_name="value_sum"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        win = pa.array(
            batch["__w"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        )
        cols = {kc: batch[kc] for kc in keys}
        cols.update(
            {
                "window_start": win,
                "n_events": pc.cast(batch["n_events"], pa.int64()),
                "value_sum": batch["value_sum"],
            }
        )
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def _quantile_cont(
    vals: np.ndarray, starts: np.ndarray, counts: np.ndarray, q: float
) -> np.ndarray:
    """Vectorized per-segment continuous quantile over sorted ``vals``
    partitioned into segments (``starts``/``counts``), using DuckDB's
    ``quantile_cont`` interpolation ``(crn-rn)*lo + (rn-frn)*hi`` —
    verified bit-exact against DuckDB (not numpy's ``(1-f)*a+f*b``,
    which differs in the last ulp)."""
    rn = (counts - 1) * q
    frn = np.floor(rn).astype(np.int64)
    crn = np.ceil(rn).astype(np.int64)
    a = vals[starts + frn]
    b = vals[starts + crn]
    return np.where(crn == frn, a, (crn - rn) * a + (rn - frn) * b)


def grouped_exact_quantiles(
    source: Any,
    group_col: str,
    value_col: str,
    *,
    quantiles: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.95),
    interpolation: str = "cont",
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """EXACT per-group quantiles, bit-exact vs DuckDB: one shuffle
    co-locates each group via ``bucketed_groupby``, then ONE
    vectorized sort + segmented gather per bucket handles all its
    groups (no per-group Python calls). ``interpolation="cont"``
    (default) is ``quantile_cont`` linear interpolation;
    ``"disc"`` is ``quantile_disc`` — the actual element at 1-based
    index ``max(ceil(q·n), 1)``, no interpolation (PERCENTILE_DISC).

    This is the exact tier; :func:`grouped_quantiles` (mergeable
    t-digest partials) is the scale tier. Exact quantiles require a
    group's values co-resident, so use this when per-group cardinality
    fits a worker (the documented partitioning assumption); at 10^12
    rows with huge groups, use the t-digest tier.

    NULL values are ignored (SQL aggregate semantics); a group whose
    values are all NULL yields NULL quantiles. NULL group keys drop
    (unlike SQL GROUP BY — documented divergence)."""
    if interpolation not in ("cont", "disc"):
        raise ValueError("interpolation must be 'cont' or 'disc'")
    qcols = [f"p{int(q * 100)}" for q in quantiles]

    def _quantile_disc(vals, starts, counts, q):
        # DuckDB quantile_disc: sorted 1-based index max(ceil(q·n), 1)
        idx = np.maximum(np.ceil(q * counts), 1.0).astype(np.int64) - 1
        out = vals[starts + np.minimum(idx, counts - 1)]
        return np.where(counts > 0, out, np.nan)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        all_groups = g[group_col].dropna().drop_duplicates()
        gv = g.dropna(subset=[value_col]).sort_values(
            [group_col, value_col], kind="mergesort"
        )
        keys = gv[group_col].to_numpy()
        vals = gv[value_col].to_numpy(np.float64)
        if len(keys):
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            counts = np.diff(np.r_[starts, len(keys)])
            row = {group_col: keys[starts]}
            qfn = (
                _quantile_disc if interpolation == "disc"
                else _quantile_cont
            )
            for q, name in zip(quantiles, qcols):
                row[name] = qfn(vals, starts, counts, q)
            out = pd.DataFrame(row)
        else:
            out = pd.DataFrame({group_col: [], **{c: [] for c in qcols}})
        missing = all_groups[~all_groups.isin(out[group_col])]
        if len(missing):
            pad = pd.DataFrame({group_col: missing.to_numpy()})
            for c in qcols:
                pad[c] = np.nan
            out = pd.concat([out, pad], ignore_index=True)
        return out

    ds = _as_dataset(source, columns=[group_col, value_col])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[group_col])),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return bucketed_groupby(
        ds, [group_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def iqr_outliers(
    source: Any,
    group_col: str,
    value_col: str,
    id_cols: List[str],
    *,
    k: float = 1.5,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Tukey-fence outlier rows per group: flag rows whose value falls
    outside ``[q1 − k·IQR, q3 + k·IQR]`` of their group.

    Two streaming passes: (1) :func:`grouped_exact_quantiles` reduces
    to one tiny row per group (collected to the driver — #groups ≪
    rows is the documented assumption); (2) the fences travel to every
    ``map_batches`` task inside the closure (one-shot broadcast, no
    join shuffle) and each batch flags rows with two vectorized
    compares. Fences are computed as ``q1 - k*(q3-q1)`` in float64 —
    the same expression an SQL oracle evaluates, so boundary
    comparisons agree bit-exactly. NULL values never flag."""
    qds = grouped_exact_quantiles(
        source, group_col, value_col,
        quantiles=(0.25, 0.75), num_buckets=num_buckets,
        batch_size=batch_size,
    )
    fences: dict = {}
    for r in qds.take_all():
        q1, q3 = r["p25"], r["p75"]
        if q1 is None or q3 is None or np.isnan(q1) or np.isnan(q3):
            continue
        fences[r[group_col]] = (q1 - k * (q3 - q1), q3 + k * (q3 - q1))

    groups = np.array(sorted(fences), dtype=object)
    lo = np.array([fences[g][0] for g in groups])
    hi = np.array([fences[g][1] for g in groups])

    def flag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or len(groups) == 0:
            t = batch.slice(0, 0)
            return t.append_column("fence_lo", pa.array([], pa.float64())) \
                    .append_column("fence_hi", pa.array([], pa.float64()))
        gv = batch[group_col].to_numpy(zero_copy_only=False)
        valid_g = batch[group_col].is_valid().to_numpy(zero_copy_only=False)
        gv = np.where(valid_g, gv, groups[0])  # nulls can't enter searchsorted
        idx = np.searchsorted(groups, gv)
        idx_c = np.clip(idx, 0, len(groups) - 1)
        known = valid_g & (groups[idx_c] == gv)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        valid = batch[value_col].is_valid().to_numpy(zero_copy_only=False)
        out = known & valid & ((v < lo[idx_c]) | (v > hi[idx_c]))
        t = batch.filter(pa.array(out))
        lo_col = lo[np.searchsorted(groups, t[group_col].to_numpy(zero_copy_only=False))] if t.num_rows else np.array([])
        hi_col = hi[np.searchsorted(groups, t[group_col].to_numpy(zero_copy_only=False))] if t.num_rows else np.array([])
        return t.append_column("fence_lo", pa.array(lo_col, pa.float64())) \
                .append_column("fence_hi", pa.array(hi_col, pa.float64()))

    ds = _as_dataset(source, columns=id_cols + [group_col, value_col])
    return ds.map_batches(flag, batch_format="pyarrow", batch_size=batch_size)


def reconcile_tables(
    fact_source: Any,
    header_source: Any,
    *,
    fact_key: str,
    header_key: str,
    fact_value_expr: str,
    header_value_col: str,
    tolerance: float = 0.01,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Cross-table aggregate reconciliation — the consistency check a
    validation engine needs BETWEEN tables: per-key SUM of a fact-table
    measure (a DSL expression, e.g.
    ``l_extendedprice * (1 - l_discount) * (1 + l_tax)``) compared
    against a header table's stored value (e.g. ``o_totalprice``),
    with orphans surfaced on both sides. No single-table rule can
    catch a fact/header drift; the reference has no cross-table checks
    at all (its referential check is key-existence only).

    Scale shape: the fact side pre-aggregates per batch (pandas
    groupby-sum combiner — exchange is distinct-keys-per-batch partial
    sums, never raw rows), ONE bucketed groupby finalizes per-key sums,
    and ONE :func:`hash_join` (full outer) aligns them with the header.

    Values are emitted in FIXED-POINT integer micro-units
    (``round(x · 10⁶)`` as int64): a 6-decimal ROUND of a ~1e5
    magnitude double lands 1 ulp apart between engines
    (``pc.round`` vs SQL ``ROUND``), so rounded DOUBLES are not safe
    under an exact value-hash compare — integers are. The tolerance
    compare happens in integer micros too, so a verdict can never
    flip on float accumulation-order noise.

    Returns a Dataset of ``(key, fact_sum_micros, expected_micros,
    diff_micros, status)`` with status ∈ ``matched | mismatched |
    missing_fact | missing_header`` — ``missing_fact`` = header key
    with no fact rows (or whose measures are all NULL),
    ``missing_header`` = fact rows whose key has no header row. NULL
    fact measures are ignored inside SUM (SQL semantics); NULL keys on
    either side drop (they can never reconcile).
    """
    from ..functions.expr import compile_predicate, referenced_columns

    ev = compile_predicate(fact_value_expr)
    fact_cols = sorted({fact_key, *referenced_columns(fact_value_expr)})

    def fact_partials(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[fact_key]))
        vals = ev(t)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = pc.cast(vals, pa.float64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"k": t[fact_key].to_numpy(zero_copy_only=False), "v": v}
        )
        agg = df.groupby("k", sort=True)["v"].sum(min_count=1).reset_index()
        return pa.table(
            {
                fact_key: pa.array(agg["k"].to_numpy()),
                "__s": pa.array(agg["v"].to_numpy(np.float64), pa.float64()),
            }
        )

    fact = _as_dataset(fact_source, columns=fact_cols).map_batches(
        fact_partials, batch_format="pyarrow", batch_size=batch_size
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(fact_key, sort=True)["__s"]
            .sum(min_count=1)
            .reset_index()
        )
        return out.rename(columns={"__s": "fact_sum"})

    fact_sums = bucketed_groupby(
        fact, [fact_key], finalize, num_buckets=num_buckets
    )

    header = _as_dataset(
        header_source, columns=[header_key, header_value_col]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b[header_key])),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    joined = hash_join(
        fact_sums,
        header,
        left_key=fact_key,
        right_key=header_key,
        left_cols=[fact_key, "fact_sum"],
        right_cols=[header_value_col],
        num_buckets=num_buckets,
        how="full",
    )

    tol_micros = int(round(float(tolerance) * 1_000_000))

    def to_micros(col) -> "pa.Array":
        f = pc.cast(col, pa.float64())
        nul = pc.or_(pc.is_null(f), pc.fill_null(pc.is_nan(f), False))
        m = pc.cast(pc.round(pc.multiply(f, 1e6), ndigits=0), pa.int64())
        return pc.if_else(nul, pa.scalar(None, pa.int64()), m)

    def status(batch: pa.Table) -> pa.Table:
        # a key whose every measure is NULL sums to NaN in the pandas
        # combiner; SQL SUM gives NULL — to_micros maps NaN → null so
        # both report missing_fact identically
        s = to_micros(batch["fact_sum"])
        e = to_micros(batch[header_value_col])
        d = pc.abs(pc.subtract(s, e))
        matched = pc.fill_null(pc.less_equal(d, tol_micros), False)
        st = pc.if_else(
            pc.is_null(s),
            pa.scalar("missing_fact"),
            pc.if_else(
                pc.is_null(e),
                pa.scalar("missing_header"),
                pc.if_else(
                    matched, pa.scalar("matched"), pa.scalar("mismatched")
                ),
            ),
        )
        return pa.table(
            {
                "key": batch[fact_key],
                "fact_sum_micros": s,
                "expected_micros": e,
                "diff_micros": d,
                "status": st,
            }
        )

    return joined.map_batches(
        status, batch_format="pyarrow", batch_size=batch_size
    )


def funnel_steps(
    source: Any,
    key_col: str,
    ts_col: str,
    event_col: str,
    steps: List[str],
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Ordered-funnel analysis: how many keys (users) performed the
    ``steps`` events in strict timestamp order — step *i* counts a key
    iff some ``steps[i]`` event happens STRICTLY after the key's chosen
    ``steps[i-1]`` event. Greedy earliest-valid choice per step (the
    standard funnel semantics: taking the earliest valid occurrence is
    optimal for completion).

    Scale shape: a per-batch combiner keeps only rows whose event is IN
    the funnel (exchange = relevant events, never the whole log); keys
    hash-bucket via ``bucketed_groupby`` so each key's events co-locate
    and every bucket resolves ALL its keys in ``len(steps)`` vectorized
    groupby-min sweeps; only (bucket × step) partial counts reach the
    driver. NULL keys/timestamps drop.

    Returns a small DataFrame ``(step_idx 1-based, step, n_keys)``.
    """
    from .dedup import _as_dataset, bucketed_groupby

    step_set = list(steps)

    def relevant(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col, event_col])
        m = pc.and_(
            pc.is_valid(t[key_col]),
            pc.and_(
                pc.is_valid(t[ts_col]),
                pc.is_in(
                    t[event_col],
                    value_set=pa.array(step_set, pa.string()),
                ),
            ),
        )
        return t.filter(m)

    ds = _as_dataset(source, columns=[key_col, ts_col, event_col])
    rel = ds.map_batches(
        relevant, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        prev: "pd.Series | None" = None  # key -> ts of previous step
        for i, s in enumerate(step_set):
            m = g[g[event_col] == s]
            if prev is not None:
                pv = m[key_col].map(prev)
                m = m[pv.notna() & (m[ts_col] > pv)]
            cur = m.groupby(key_col)[ts_col].min()
            counts.append(len(cur))
            prev = cur
            if not len(cur):
                counts.extend([0] * (len(step_set) - i - 1))
                break
        return pd.DataFrame(
            {
                "step_idx": np.arange(1, len(step_set) + 1, dtype=np.int64),
                "n_keys": np.asarray(counts, np.int64),
            }
        )

    parts = bucketed_groupby(
        rel, [key_col], per_bucket, num_buckets=num_buckets
    ).to_pandas()
    agg = parts.groupby("step_idx", sort=True)["n_keys"].sum().reset_index()
    agg["step"] = [step_set[i - 1] for i in agg["step_idx"]]
    return agg[["step_idx", "step", "n_keys"]].astype(
        {"step_idx": np.int64, "n_keys": np.int64}
    )


def cohort_retention(
    source: Any,
    key_col: str,
    ts_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Weekly cohort-retention matrix: keys cohort by the Monday-aligned
    week of their FIRST event; each later week they are active counts
    into ``(cohort_week, week_offset)``. The classic retention triangle
    over an event log.

    Scale shape: a per-batch combiner reduces rows to DISTINCT
    ``(key, week)`` pairs plus a per-key min-week partial (exchange is
    distinct key-weeks, never raw events); ONE bucketed groupby on the
    key then derives every key's cohort and offsets locally and emits
    ``(cohort_week, week_offset, partial count)`` rows; a tiny global
    groupby sums them. NULL keys/timestamps drop.

    Returns a Dataset of ``(cohort_week date, week_offset int,
    n_active_keys int)`` — ``week_offset`` 0 is the cohort week itself.
    """
    from .dedup import _as_dataset, bucketed_groupby

    def week_of(ts: np.ndarray) -> np.ndarray:
        d = ts.astype("datetime64[D]").astype(np.int64)
        return d - ((d + 3) % 7)  # Monday-aligned (epoch day 0 = Thu)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col])
        t = t.filter(
            pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col]))
        )
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = week_of(t[ts_col].to_numpy(zero_copy_only=False))
        pair = np.unique(np.stack([k, w], axis=1), axis=0)
        return pa.table(
            {
                key_col: pa.array(pair[:, 0], pa.int64()),
                "week": pa.array(pair[:, 1], pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[key_col, ts_col])
    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, "week"])
        cohort = g.groupby(key_col)["week"].transform("min")
        off = ((g["week"] - cohort) // 7).astype(np.int64)
        out = (
            pd.DataFrame({"cw": cohort, "off": off})
            .groupby(["cw", "off"], sort=True)
            .size()
            .reset_index(name="n")
        )
        return out

    parts = bucketed_groupby(
        pairs, [key_col], per_bucket, num_buckets=num_buckets
    )

    agg = parts.groupby(["cw", "off"]).sum("n")

    def present(batch: pa.Table) -> pa.Table:
        cw = batch["cw"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        return pa.table(
            {
                "cohort_week": pa.array(cw),
                "week_offset": batch["off"],
                "n_active_keys": pc.cast(batch["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(present, batch_format="pyarrow")


def event_transitions(
    source: Any,
    key_col: str,
    ts_col: str,
    event_col: str,
    *,
    tiebreak_col: Optional[str] = None,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Markov transition counts over an event log: for every key, order
    its events by ``(ts, tiebreak)`` and count each consecutive
    ``(from_event, to_event)`` pair — SQL ``LEAD(event) OVER (PARTITION
    BY key ORDER BY ts, tiebreak)`` then ``GROUP BY pair``. The
    sequence-mining primitive behind session-flow and anomaly models.

    Scale shape: ONE key-bucketed shuffle co-locates each key's events
    (exchange carries (key, ts, tiebreak, event) — event is a
    low-cardinality dictionary-encoded column); each bucket resolves
    ALL its keys in one lexsort + shifted-compare sweep and emits
    per-bucket (from, to, count) partials; a tiny global groupby sums
    them. NULL keys/timestamps drop; a key's last event has no
    successor (contributes nothing).

    Returns a Dataset of ``(from_event, to_event, n_transitions)``.
    """
    cols = [key_col, ts_col, event_col] + (
        [tiebreak_col] if tiebreak_col else []
    )

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        return t.filter(
            pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col]))
        )

    ds = _as_dataset(source, columns=cols).map_batches(
        clean, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])
        g = g.sort_values(order, kind="mergesort")
        same = g[key_col].to_numpy()[:-1] == g[key_col].to_numpy()[1:]
        ev = g[event_col].to_numpy()
        out = (
            pd.DataFrame(
                {"from_event": ev[:-1][same], "to_event": ev[1:][same]}
            )
            .groupby(["from_event", "to_event"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out

    parts = bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )
    agg = parts.groupby(["from_event", "to_event"]).sum("n")

    def present(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_event": batch["from_event"],
                "to_event": batch["to_event"],
                "n_transitions": pc.cast(batch["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(present, batch_format="pyarrow")


def cdc_apply(
    snapshot: Any,
    changes: Any,
    *,
    key_col: str,
    snap_val_col: str,
    seq_cols: List[str],
    op_col: str,
    val_col: str,
    snap_key_col: Optional[str] = None,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """CDC merge/upsert: apply a change log onto a snapshot — per key
    the LATEST change (max ``seq_cols``, lexicographic) wins; op ``U``
    upserts the key with the change's ``val_col`` (insert if absent),
    op ``D`` deletes it; keys without changes keep their snapshot
    value. The ``MERGE INTO`` / Delta `apply_changes` shape.

    Scale shape: a per-batch combiner reduces the change log to its
    per-batch latest row per key (exchange is batch-distinct keys,
    never raw changes); snapshot rows and change partials UNION into
    ONE key-bucketed shuffle, so reduce + full-outer merge + apply all
    happen in a single exchange. NULL change keys drop; snapshot keys
    are assumed unique (document upstream dedup otherwise);
    ``snap_key_col`` names the snapshot's key when it differs from the
    change log's (output uses ``key_col``).

    Returns a Dataset of ``(key_col, val_col)`` survivors.
    """
    NEG = -np.float64(np.inf)
    skey = snap_key_col or key_col

    def snap_rows(batch: pa.Table) -> pa.Table:
        t = batch.select([skey, snap_val_col])
        t = t.filter(pc.is_valid(t[skey]))
        n = t.num_rows
        return pa.table(
            {
                key_col: pc.cast(t[skey], pa.int64()),
                "__val": pc.cast(t[snap_val_col], pa.float64()),
                "__op": pa.nulls(n, pa.string()),
                "__side": pa.array(np.zeros(n, np.int8)),
                **{
                    f"__seq{i}": pa.array(np.full(n, NEG))
                    for i in range(len(seq_cols))
                },
            }
        )

    def change_rows(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, op_col, val_col, *seq_cols])
        t = t.filter(pc.is_valid(t[key_col]))
        df = pd.DataFrame(
            {
                key_col: t[key_col].to_numpy(zero_copy_only=False),
                "__op": t[op_col].to_numpy(zero_copy_only=False),
                "__val": pc.cast(t[val_col], pa.float64()).to_numpy(
                    zero_copy_only=False
                ),
                **{
                    f"__seq{i}": pc.cast(
                        t[c], pa.float64()
                    ).to_numpy(zero_copy_only=False)
                    for i, c in enumerate(seq_cols)
                },
            }
        )
        seq = [f"__seq{i}" for i in range(len(seq_cols))]
        last = df.sort_values(
            [key_col, *seq], kind="mergesort"
        ).drop_duplicates(key_col, keep="last")
        n = len(last)
        return pa.table(
            {
                key_col: pa.array(
                    last[key_col].to_numpy(np.int64), pa.int64()
                ),
                "__val": pa.array(last["__val"].to_numpy(np.float64)),
                "__op": pa.array(last["__op"].astype(object), pa.string()),
                "__side": pa.array(np.ones(n, np.int8)),
                **{
                    s: pa.array(last[s].to_numpy(np.float64))
                    for s in seq
                },
            }
        )

    snap_ds = _as_dataset(snapshot, columns=[skey, snap_val_col])
    ch_ds = _as_dataset(changes, columns=[key_col, op_col, val_col, *seq_cols])
    seq = [f"__seq{i}" for i in range(len(seq_cols))]
    col_order = [key_col, "__val", "__op", "__side", *seq]

    def reorder(batch: pa.Table) -> pa.Table:
        return batch.select(col_order)

    unioned = (
        snap_ds.map_batches(
            snap_rows, batch_format="pyarrow", batch_size=batch_size
        )
        .map_batches(reorder, batch_format="pyarrow")
        .union(
            ch_ds.map_batches(
                change_rows, batch_format="pyarrow", batch_size=batch_size
            ).map_batches(reorder, batch_format="pyarrow")
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ch = g[g["__side"] == 1]
        if len(ch):
            ch = ch.sort_values(
                [key_col, *seq], kind="mergesort"
            ).drop_duplicates(key_col, keep="last")
        sn = g[g["__side"] == 0][[key_col, "__val"]]
        m = sn.merge(
            ch[[key_col, "__op", "__val"]],
            on=key_col,
            how="outer",
            suffixes=("_s", "_c"),
        )
        op = m["__op"].to_numpy(object)
        keep = ~(op == "D")
        m = m[keep]
        upsert = m["__op"].to_numpy(object) == "U"
        val = np.where(
            upsert,
            m["__val_c"].to_numpy(np.float64),
            m["__val_s"].to_numpy(np.float64),
        )
        return pd.DataFrame({key_col: m[key_col].to_numpy(np.int64),
                             "val": val})

    return bucketed_groupby(
        unioned, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def grouped_ewma(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    alpha: float = 0.3,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key exponentially-weighted moving average, final value per
    key: rows ordered by ``order_cols``, ``y_i = α·x_i + (1−α)·y_{i−1}``
    seeded with ``y_1 = x_1`` (pandas ``ewm(adjust=False)``). Evaluated
    through the CLOSED FORM — row ``i`` of an ``n``-row key weighs
    ``α(1−α)^{n−i}`` (``(1−α)^{n−1}`` for the first row) — so the
    engine and a SQL window oracle share pow/sum semantics instead of
    a sequential recursion; weights underflow identically for very
    long series. NULL keys/order values drop; NULL x propagates NaN
    (SQL parity: the CASE sum returns NULL if any term is NULL).

    Scale shape: ONE key-bucketed shuffle of (key, order, x); each
    bucket lexsorts once and computes every key's weights in one
    vectorized pass (segment boundaries → per-row rank/count, no
    per-key Python). Output ``(key, n, ewma)`` — ewma rounded to 6.
    """
    cols = [key_col, *order_cols, value_col]

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        m = pc.is_valid(t[key_col])
        for c in order_cols:
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    ds = _as_dataset(source, columns=cols).map_batches(
        clean, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        k = g[key_col].to_numpy()
        x = g[value_col].to_numpy(np.float64)
        n = len(g)
        new = np.concatenate([[True], k[1:] != k[:-1]])
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        rank = np.arange(n) - starts[seg]          # 0-based in key
        cnt = counts[seg]
        w = np.where(
            rank == 0,
            np.power(1.0 - alpha, cnt - 1.0),
            alpha * np.power(1.0 - alpha, cnt - 1.0 - rank),
        )
        contrib = w * x
        ew = np.add.reduceat(contrib, starts)
        return pd.DataFrame(
            {
                key_col: k[starts],
                "n": counts.astype(np.int64),
                "ewma": np.round(ew, 6),
            }
        )

    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def exact_global_quantiles(
    source: Any,
    value_col: str,
    qs: List[float],
    *,
    batch_size: int = 64 * 1024,
) -> List[float]:
    """EXACT global ``quantile_cont`` cut points for ``value_col`` —
    the shared reduce behind :func:`winsorize` and
    :func:`bucket_by_quantile`. One streaming pass builds per-batch
    ``(value, count)`` partials (pyarrow ``group_by`` combiner), a
    small global groupby merges them, and the driver interpolates
    ``(crn-rn)·lo + (rn-frn)·hi`` over the run-length-expanded
    multiset — bit-exact vs DuckDB's ``quantile_cont``. NULLs drop.

    Driver memory is DISTINCT-bounded, not row-bounded: for scores
    rounded to 6 decimals over a bounded range (the convention every
    scoring op here follows) the distinct space is ≤ range × 10⁶
    values regardless of corpus size. For genuinely unbounded float
    columns use the t-digest tier (``stages/stats.py``) instead."""
    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select([value_col])
        t = t.filter(pc.is_valid(t[value_col]))
        return t.group_by([value_col]).aggregate([([], "count_all")])

    ds_vals = (
        _as_dataset(source, columns=[value_col])
        .map_batches(partials, batch_format="pyarrow",
                     batch_size=batch_size)
        .groupby(value_col)
        .sum("count_all")
        .to_pandas()
    )
    vals = ds_vals[value_col].to_numpy(np.float64)
    cnts = ds_vals["sum(count_all)"].to_numpy(np.int64)
    order = np.argsort(vals, kind="mergesort")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return [float("nan")] * len(qs)

    def q_at(q: float) -> float:
        # quantile_cont over the expanded multiset, via run lengths
        rn = (total - 1) * q
        frn, crn = int(np.floor(rn)), int(np.ceil(rn))
        lo = vals[np.searchsorted(cum, frn + 1)]
        hi = vals[np.searchsorted(cum, crn + 1)]
        return float(lo if crn == frn else (crn - rn) * lo + (rn - frn) * hi)

    return [q_at(float(q)) for q in qs]


def bucket_by_quantile(
    source: Any,
    value_col: str,
    *,
    qs: Optional[List[float]] = None,
    labels: Optional[List[str]] = None,
    id_cols: Optional[List[str]] = None,
    group_col: Optional[str] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Label every row by which global-quantile band its value falls
    in — the CCNet head/middle/tail perplexity-bucketing shape. Two
    passes: :func:`exact_global_quantiles` computes the cut points,
    then ONE streaming pass assigns ``labels[i]`` where
    ``value <= cuts[i]`` (first match; last label catches the rest) —
    the cuts are driver scalars closed over, nothing broadcasts. NULL
    values get a NULL bucket and never enter the cut computation.
    ``source`` is consumed twice — a LAZY upstream (e.g. an unscored
    corpus piped through an LM scorer) re-executes for each pass;
    when the upstream is expensive, write/materialize the scored
    table first and bucket that.
    Defaults: tertiles ``head``/``middle``/``tail`` (CCNet buckets by
    LM score, where "head" = best third). Output: ``id_cols`` +
    ``value_col`` + ``bucket``.

    With ``group_col`` the bands are PER GROUP — CCNet's actual
    design (perplexity tertiles per LANGUAGE, so each language keeps
    its own head third): cuts come from
    :func:`grouped_exact_quantiles` (one bucketed shuffle; #groups ×
    len(qs) driver scalars), broadcast once as a sorted lookup, and
    the assign pass stays streaming. NULL group keys bucket NULL."""
    qs = [1.0 / 3.0, 2.0 / 3.0] if qs is None else list(qs)
    labels = (
        ["head", "middle", "tail"] if labels is None else list(labels)
    )
    if len(labels) != len(qs) + 1:
        raise ValueError("need exactly len(qs)+1 labels")
    if sorted(qs) != list(qs):
        raise ValueError("qs must be ascending")
    id_cols = list(id_cols or [])
    if group_col is not None:
        return _bucket_by_quantile_grouped(
            source, value_col, group_col, qs, labels, id_cols, batch_size
        )
    cuts = exact_global_quantiles(
        source, value_col, qs, batch_size=batch_size
    )

    def assign(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        lab = np.full(len(x), labels[-1], dtype=object)
        for cut, name in zip(reversed(cuts), reversed(labels[:-1])):
            lab[x <= cut] = name
        lab[np.isnan(x)] = None
        return pa.table(
            {
                **{c: batch[c] for c in id_cols},
                value_col: batch[value_col],
                "bucket": pa.array(lab, pa.string()),
            }
        )

    return _as_dataset(source, columns=[*id_cols, value_col]).map_batches(
        assign, batch_format="pyarrow", batch_size=batch_size
    )


def _bucket_by_quantile_grouped(
    source: Any,
    value_col: str,
    group_col: str,
    qs: List[float],
    labels: List[str],
    id_cols: List[str],
    batch_size: int,
) -> Dataset:
    """Per-group band assignment: the group→cuts table (#groups ×
    len(qs), driver-bounded) broadcasts once as sorted arrays; each
    batch resolves its rows' groups via ``searchsorted`` and compares
    against that group's cut row. Rows whose value is NULL, whose
    group is NULL, or whose group produced no cuts (all-NULL values)
    bucket NULL."""
    qcols = [f"p{int(q * 100)}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError("qs round to duplicate percent names; spread them")
    cut_tbl = grouped_exact_quantiles(
        source, group_col, value_col,
        quantiles=tuple(qs), batch_size=batch_size,
    ).to_pandas()
    # stringified keys for the sorted lookup (injective for the
    # string/int group keys this supports)
    groups = cut_tbl[group_col].astype(str).to_numpy(dtype=object)
    order = np.argsort(groups)
    groups = groups[order]
    cut_m = cut_tbl[qcols].to_numpy(np.float64)[order]  # (G, len(qs))
    ref = ray.put((groups, cut_m))

    def assign(batch: pa.Table) -> pa.Table:
        g_sorted, cm = ray.get(ref)
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        g_valid = pc.is_valid(gcol).to_numpy(zero_copy_only=False)
        g = pc.cast(gcol, pa.string()).to_pandas().fillna("").to_numpy(
            dtype=object
        )
        pos = np.searchsorted(g_sorted, g)
        pos = np.minimum(pos, max(len(g_sorted) - 1, 0))
        known = (
            g_valid & (len(g_sorted) > 0)
            & (g_sorted[pos] == g)
        )
        lab = np.full(len(x), None, dtype=object)
        if len(g_sorted):
            cuts_rows = cm[pos]  # (n, len(qs)); junk where ~known
            band = (x[:, None] > cuts_rows).sum(axis=1)
            ok = known & ~np.isnan(x)
            lab[ok] = np.array(labels, dtype=object)[band[ok]]
        return pa.table(
            {
                **{c: batch[c] for c in id_cols},
                group_col: batch[group_col],
                value_col: batch[value_col],
                "bucket": pa.array(lab, pa.string()),
            }
        )

    cols = [*id_cols, group_col, value_col]
    return _as_dataset(source, columns=cols).map_batches(
        assign, batch_format="pyarrow", batch_size=batch_size
    )


def winsorize(
    source: Any,
    value_col: str,
    *,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    id_cols: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Winsorize (clip) a numeric column at its EXACT global
    ``lower_q``/``upper_q`` quantiles (``quantile_cont``
    interpolation): two passes — a distinct-bounded exact-quantile
    reduce (per-batch ``(value, count)`` partials, one tiny
    driver-side interpolation over the merged distincts), then a
    streaming vectorized clip with the two cutoffs closed over (no
    broadcast join; the cutoffs are scalars). NULL values pass
    through NULL. Adds ``{value_col}_wins`` (rounded 6) beside
    ``id_cols``.
    """
    id_cols = list(id_cols or [])
    lo_cut, hi_cut = exact_global_quantiles(
        source, value_col, [lower_q, upper_q], batch_size=batch_size
    )

    def clip(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        w = np.round(np.clip(x, lo_cut, hi_cut), 6)
        return pa.table(
            {
                **{c: batch[c] for c in id_cols},
                f"{value_col}_wins": pa.array(w),
            }
        )

    return _as_dataset(source, columns=[*id_cols, value_col]).map_batches(
        clip, batch_format="pyarrow", batch_size=batch_size
    )


def interval_coverage(
    source: Any,
    key_col: str,
    start_col: str,
    end_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key interval-union coverage: merge each key's (possibly
    overlapping) ``[start, end)`` intervals and report the UNION's
    total covered microseconds plus the number of disjoint islands —
    the uptime/gaps-and-islands aggregate. A row's contribution is
    ``max(0, end − max(start, prev_running_max_end))``, which sums to
    the union length under a (start, end) sort regardless of tie
    order; degenerate/negative intervals contribute 0 but still open
    an island when they start past the running max (SQL CASE parity).
    NULL keys/starts/ends drop.

    Scale shape: ONE key-bucketed shuffle of (key, start, end); each
    bucket lexsorts once and computes running maxes for ALL its keys
    via one Cython grouped cummax (segment resets without any per-key
    Python). Output ``(key, covered_us, n_islands)``.
    """
    cols = [key_col, start_col, end_col]

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        m = pc.is_valid(t[key_col])
        for c in (start_col, end_col):
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    ds = _as_dataset(source, columns=cols).map_batches(
        clean, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, start_col, end_col],
                          kind="mergesort")
        k = g[key_col].to_numpy()
        s = g[start_col].to_numpy("datetime64[us]").astype(np.int64)
        e = g[end_col].to_numpy("datetime64[us]").astype(np.int64)
        n = len(g)
        new = np.concatenate([[True], k[1:] != k[:-1]])
        seg = np.cumsum(new) - 1
        # segment-reset running max (Cython grouped cummax — the
        # offset-shift accumulate trick overflows int64 when
        # #segments × timestamp span gets large)
        cm = (
            pd.Series(e).groupby(seg).cummax().to_numpy(np.int64)
        )
        prev_cm = np.empty(n, np.int64)
        prev_cm[1:] = cm[:-1]
        island = new | (s > prev_cm)
        lower = np.where(new, s, np.maximum(s, prev_cm))
        contrib = np.maximum(0, e - lower)
        starts = np.flatnonzero(new)
        covered = np.add.reduceat(contrib, starts)
        islands = np.add.reduceat(island.astype(np.int64), starts)
        return pd.DataFrame(
            {
                key_col: k[starts],
                "covered_us": covered.astype(np.int64),
                "n_islands": islands.astype(np.int64),
            }
        )

    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def time_weighted_avg(
    source: Any,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key time-weighted average under step (last-observation)
    interpolation: each observation holds its value until the key's
    next one, so ``twavg = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_n − t₁)`` — the
    sensor/price aggregation a plain AVG gets wrong under irregular
    sampling. Keys with < 2 distinct timestamps (zero total span)
    yield NULL. NULL keys/ts/values drop; duplicate timestamps
    contribute zero-width intervals (deterministic under a (ts, value)
    sort both here and in the SQL LEAD oracle).

    Scale shape: ONE key-bucketed shuffle of (key, ts, value); each
    bucket lexsorts once, computes shifted-difference durations for
    ALL its keys, and reduces with two ``np.add.reduceat`` sweeps.
    Output ``(key, n_points, twavg)`` — twavg rounded to 6.
    """
    cols = [key_col, ts_col, value_col]

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        m = pc.is_valid(t[key_col])
        for c in (ts_col, value_col):
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    ds = _as_dataset(source, columns=cols).map_batches(
        clean, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, value_col],
                          kind="mergesort")
        k = g[key_col].to_numpy()
        t = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        v = g[value_col].to_numpy(np.float64)
        n = len(g)
        new = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        # duration each row's value holds (0 for each key's last row)
        dur = np.zeros(n, np.float64)
        dur[:-1] = (t[1:] - t[:-1]).astype(np.float64)
        last = starts + counts - 1
        dur[last] = 0.0
        wsum = np.add.reduceat(v * dur, starts)
        span = (t[last] - t[starts]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            tw = wsum / span
        return pd.DataFrame(
            {
                key_col: k[starts],
                "n_points": counts.astype(np.int64),
                "twavg": np.where(span > 0, np.round(tw, 6), np.nan),
            }
        )

    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def association_rules(
    source: Any,
    key_col: str,
    item_col: str,
    *,
    min_pair_count: int = 1,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Market-basket pair statistics (Apriori level 2): treating each
    key's DISTINCT items as one basket, emit every unordered item pair
    with ``n_ab`` (baskets holding both), ``n_a``/``n_b`` (baskets
    holding each), ``support = n_ab/N``, ``conf_a_b = n_ab/n_a``,
    ``conf_b_a``, and ``lift = n_ab·N/(n_a·n_b)`` — N = baskets with
    ≥1 item. ``min_pair_count`` prunes the tail before it reaches the
    driver.

    Scale shape: per-batch DISTINCT (key, item) combiner (exchange is
    basket-distinct pairs, never raw events); ONE key-bucketed shuffle
    co-locates baskets and the shared sorted-sweep kernel emits each
    basket's item pairs; pair/item counts reduce through groupbys
    whose cardinality is item-vocabulary-bounded (pairs ≤ |items|²/2,
    independent of row count). Driver holds only the final pair
    table. NULL keys/items drop.

    Returns a pandas DataFrame sorted by (item_a, item_b); floats
    rounded to 6.
    """
    from .dedup import bucketed_count, bucketed_groupby

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, item_col])
        t = t.filter(
            pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[item_col]))
        )
        return t.group_by([key_col, item_col]).aggregate([])

    ki = _as_dataset(source, columns=[key_col, item_col]).map_batches(
        distinct_pairs, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, item_col]).sort_values(
            [key_col, item_col], kind="mergesort"
        )
        k = g[key_col].to_numpy()
        it = g[item_col].to_numpy()
        n = len(g)
        parts = []
        j = 1
        while True:
            if j >= n:
                break
            same = k[:-j] == k[j:]
            if not same.any():
                break
            idx = np.nonzero(same)[0]
            parts.append(
                pd.DataFrame(
                    {"item_a": it[idx], "item_b": it[idx + j]}
                )
            )
            j += 1
        pair = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"item_a": [], "item_b": []})
        )
        pc_ = (
            pair.groupby(["item_a", "item_b"], sort=False)
            .size()
            .reset_index(name="n_ab")
        )
        ic = (
            pd.DataFrame({"item": it})
            .groupby("item", sort=False)
            .size()
            .reset_index(name="n_i")
        )
        nk = pd.DataFrame(
            {"n_keys": [int((np.concatenate([[True],
                k[1:] != k[:-1]])).sum())]}
        )
        pc_["kind"], ic["kind"], nk["kind"] = "pair", "item", "keys"
        return pd.concat([pc_, ic, nk], ignore_index=True)

    parts = bucketed_groupby(
        ki, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    ).to_pandas()

    n_keys = int(parts.loc[parts.kind == "keys", "n_keys"].sum())
    items = (
        parts[parts.kind == "item"]
        .groupby("item")["n_i"]
        .sum()
        .astype(np.int64)
    )
    pairs = (
        parts[parts.kind == "pair"]
        .groupby(["item_a", "item_b"])["n_ab"]
        .sum()
        .astype(np.int64)
        .reset_index()
    )
    pairs = pairs[pairs.n_ab >= min_pair_count]
    na = pairs.item_a.map(items).to_numpy(np.int64)
    nb = pairs.item_b.map(items).to_numpy(np.int64)
    nab = pairs.n_ab.to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "item_a": pairs.item_a.to_numpy(),
            "item_b": pairs.item_b.to_numpy(),
            "n_ab": nab,
            "n_a": na,
            "n_b": nb,
            "support": np.round(nab / n_keys, 6),
            "conf_a_b": np.round(nab / na, 6),
            "conf_b_a": np.round(nab / nb, 6),
            "lift": np.round(
                nab.astype(np.float64) * n_keys / (na * nb), 6
            ),
        }
    )
    return out.sort_values(["item_a", "item_b"]).reset_index(drop=True)


def throttle_dedup(
    source: Any,
    key_cols: List[str],
    ts_col: str,
    *,
    window_seconds: float,
    id_col: Optional[str] = None,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Event-stream debounce: drop a row when the SAME key produced
    another event within ``window_seconds`` BEFORE it (LAG semantics —
    each row compares to its immediate predecessor, kept or not; a
    burst longer than the window therefore keeps one row per window-
    gap break, the standard retry/duplicate-webhook suppressor).
    First row of each key always survives. Ordering ties break on
    ``id_col`` (pass one for determinism). NULL keys/ts drop.

    Scale shape: ONE key-bucketed shuffle of (keys, ts, id); each
    bucket lexsorts once and computes every key's predecessor gaps in
    one shifted-difference pass. Returns the surviving rows' key/ts/id
    columns.
    """
    cols = [*key_cols, ts_col] + ([id_col] if id_col else [])

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        m = pc.is_valid(t[ts_col])
        for c in key_cols:
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    ds = _as_dataset(source, columns=cols).map_batches(
        clean, batch_format="pyarrow", batch_size=batch_size
    )
    win_us = int(round(window_seconds * 1_000_000))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [*key_cols, ts_col] + ([id_col] if id_col else [])
        g = g.sort_values(order, kind="mergesort")
        t = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        same = np.ones(len(g), bool)
        same[0] = False
        for c in key_cols:
            k = g[c].to_numpy()
            same[1:] &= k[1:] == k[:-1]
        gap = np.empty(len(g), np.int64)
        gap[0] = win_us + 1
        gap[1:] = t[1:] - t[:-1]
        keep = ~same | (gap > win_us)
        return g[keep]

    return bucketed_groupby(
        ds, list(key_cols), per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def grouped_cusum(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key CUSUM change-detection statistics: center each key's
    ordered series on ITS OWN mean, cumulative-sum the residuals, and
    report the maximum positive and negative excursions plus their
    spread — a sustained level shift shows up as a large ``cusum_range``
    while white noise stays near zero (the classic Page/CUSUM chart
    summary). NULL keys/order values drop; NULL x propagates (SQL
    window-sum parity).

    Scale shape: ONE key-bucketed shuffle; each bucket lexsorts once
    and computes all keys' centered cumsums in one vectorized pass
    (segment offsets subtracted, ``i·mean`` in closed form — no
    per-key Python). Output ``(key, n, cusum_max, cusum_min,
    cusum_range)`` rounded to 6.
    """
    cols = [key_col, *order_cols, value_col]

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        m = pc.is_valid(t[key_col])
        for c in order_cols:
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    ds = _as_dataset(source, columns=cols).map_batches(
        clean, batch_format="pyarrow", batch_size=batch_size
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        k = g[key_col].to_numpy()
        x = g[value_col].to_numpy(np.float64)
        n = len(g)
        new = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        seg = np.cumsum(new) - 1
        # TRUE per-segment sequential cumsum (Cython grouped cumsum;
        # a global-cumsum difference OR a separately-summed mean
        # re-associates float adds and drifts off the SQL oracle at
        # the 6th decimal — DuckDB's partition AVG is not the
        # sequential sum). The mean never appears: work with
        # dev·n = n·cs − rank·total, where total is the running sum's
        # OWN final value (LAST_VALUE(cs) in the oracle), and divide
        # by n once at the end — every input is bit-identical.
        cs_seg = pd.Series(x).groupby(seg).cumsum().to_numpy()
        last = starts + counts - 1
        total = cs_seg[last]
        rank = np.arange(n) - starts[seg] + 1
        nn = counts.astype(np.float64)
        s = nn[seg] * cs_seg - rank * total[seg]
        # segment-wise max/min via reduceat, then the single division
        cmax = np.maximum.reduceat(s, starts) / nn
        cmin = np.minimum.reduceat(s, starts) / nn
        return pd.DataFrame(
            {
                key_col: k[starts],
                "n": counts.astype(np.int64),
                "cusum_max": np.round(cmax, 6),
                "cusum_min": np.round(cmin, 6),
                "cusum_range": np.round(cmax - cmin, 6),
            }
        )

    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def scd2_build(
    source: Any,
    key_col: str,
    attr_cols: List[str],
    order_cols: List[str],
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Slowly-Changing-Dimension Type 2 history build: collapse a
    change log into versioned dimension rows. Per key (ordered by
    ``order_cols``), a new version opens whenever ANY ``attr_cols``
    value IS DISTINCT FROM the previous row's (NULL-safe; the first
    row always opens). Output: ``key, *attr_cols, valid_from`` (the
    opening row's first order column), ``valid_to`` (the next
    version's ``valid_from``, NULL on the key's current version) and
    ``is_current``. No-op changes (same attributes re-asserted) are
    absorbed into the open version — the standard SCD2 semantics.

    Scale shape: ONE hash-bucket shuffle co-locates each key
    (:func:`bucketed_groupby`), then ONE vectorized pandas/numpy pass
    per bucket handles all its keys (sort + shifted NULL-safe compare
    + per-key shift for ``valid_to``); no per-key Python. The change
    log streams; the output is bounded by the number of REAL changes,
    not log rows. ``order_cols`` must totally order each key's rows
    (include a tiebreak id) — ties make version boundaries
    arrival-dependent. Reference analogue: none (the reference
    validates rows, src/data_validator/validator.py); this is the
    warehouse-side sibling of :func:`cdc_apply`.
    """
    ds = _as_dataset(source, columns=[key_col, *attr_cols, *order_cols])

    def drop_null_key(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[key_col]))

    ds = ds.map_batches(
        drop_null_key, batch_format="pyarrow", batch_size=batch_size
    )
    ts_col = order_cols[0]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        k = g[key_col].to_numpy()
        n = len(g)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        changed = new_key.copy()
        for c in attr_cols:
            v = g[c].to_numpy()
            nullmask = pd.isna(g[c]).to_numpy()
            with np.errstate(invalid="ignore"):
                same = v[1:] == v[:-1]
            # IS NOT DISTINCT FROM: NULL equals NULL, NULL != value
            same = (same & ~nullmask[1:] & ~nullmask[:-1]) | (
                nullmask[1:] & nullmask[:-1]
            )
            changed[1:] |= ~same
        v = g[changed]
        vk = v[key_col].to_numpy()
        vt = v[ts_col].to_numpy()
        last = np.concatenate([vk[1:] != vk[:-1], [True]])
        valid_to = np.empty_like(vt)
        valid_to[:-1] = vt[1:]
        out = pd.DataFrame(
            {
                key_col: vk,
                **{c: v[c].to_numpy() for c in attr_cols},
                "valid_from": vt,
            }
        )
        out["valid_to"] = valid_to
        out.loc[last, "valid_to"] = pd.NaT if np.issubdtype(
            vt.dtype, np.datetime64
        ) else None
        out["is_current"] = last
        return out

    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def interpolate_missing(
    source: Any,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    tiebreak_cols: Optional[List[str]] = None,
    out_name: Optional[str] = None,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key ordered LINEAR interpolation of missing values (W40) —
    the time-series gap-repair sibling of :func:`forward_fill`: each
    NULL gets ``pv + (nv − pv) · (t − pt)/(nt − pt)`` from its nearest
    non-NULL neighbours within the key, where ``t`` is the order axis
    (timestamps use exact int64 microseconds, so the ratio is the
    double division of exactly-representable integers — bit-identical
    to a SQL ``epoch_us`` oracle). Strict interior interpolation:
    rows before a key's first or after its last non-NULL stay NULL
    (no extrapolation — LOCF covers the trailing-edge use case).
    Interpolated values round to 6 (the float-hash convention);
    original non-NULL values pass through untouched.

    Scale shape: the single ``bucketed_groupby`` hash shuffle every
    per-key window op here shares; per bucket ONE mergesort plus two
    ``np.maximum.accumulate`` passes (forward for the previous valid
    index, reversed for the next) — no Python loops.

    SQL equivalent: ``LAST_VALUE(v IGNORE NULLS) OVER (… ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` + the FOLLOWING mirror.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    name = out_name or f"{value_col}_interp"
    ties = list(tiebreak_cols or [])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col, order_col, *ties], kind="mergesort", na_position="last"
        )
        m = len(g)
        u = g[key_col].to_numpy()
        new_key = np.empty(m, bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        idx = np.arange(m, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        starts = np.flatnonzero(new_key)
        seg_id = np.cumsum(new_key) - 1
        seg_end = np.append(starts[1:] - 1, m - 1)[seg_id]  # inclusive

        vals = g[value_col].to_numpy(np.float64, na_value=np.nan)
        valid = ~np.isnan(vals)
        gmax = np.maximum.accumulate(np.where(valid, idx, -1))
        prev = np.where(gmax >= seg_start, gmax, -1)
        rmin = (m - 1) - np.flip(
            np.maximum.accumulate(np.flip(np.where(valid, m - 1 - idx, -1)))
        )
        nxt = np.where((rmin <= seg_end) & (rmin < m), rmin, -1)

        t = g[order_col].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            t = t.astype("datetime64[us]").view(np.int64)
        t = t.astype(np.float64)

        can = (~valid) & (prev >= 0) & (nxt >= 0)
        out_vals = vals.copy()
        p, nx = np.maximum(prev, 0), np.maximum(nxt, 0)
        gap = t[nx] - t[p]
        # zero time gap (tied order values) → take the previous value
        # (documented; the SQL oracle mirrors with CASE WHEN nt = pt)
        ratio = np.where(can & (gap > 0), (t - t[p]) / np.where(gap > 0, gap, 1.0), 0.0)
        interp = vals[p] + (vals[nx] - vals[p]) * ratio
        out_vals[can] = np.round(interp[can], 6)

        out = g.copy()
        filled = pd.Series(out_vals, index=g.index)
        filled[np.isnan(out_vals)] = None
        out[name] = filled
        return out

    ds = _as_dataset(
        source, columns=sorted({key_col, order_col, value_col, *ties})
    )
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def incremental_aggregate(
    base: Any,
    changes: Any,
    *,
    key_col: str,
    group_col: str,
    val_col: str,
    op_col: str,
    seq_cols: List[str],
    change_group_col: Optional[str] = None,
    change_val_col: Optional[str] = None,
    base_agg: Optional["pa.Table"] = None,
    scale: float = 100.0,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> "pa.Table":
    """Incremental maintenance of a materialized GROUP-BY aggregate
    under a CDC change log — the streaming-warehouse pattern: instead
    of re-scanning the whole base table after every change batch, only
    the CHANGED keys' old rows are retracted and their new state
    applied, then merged into the stored aggregate.

    Inputs: ``base`` (one row per ``key_col``), ``changes`` (rows of
    ``key, seq…, op, group, val``; latest per key wins by ``seq_cols``;
    ``op='D'`` deletes the key, anything else upserts group+value —
    :func:`cdc_apply` semantics), and optionally ``base_agg`` — the
    previously stored aggregate ``(group, sum_scaled, cnt)``. When
    ``base_agg`` is None it is computed here in one streaming pass
    (the bootstrap run); pass the previous output back in on the next
    batch for the true incremental path.

    Exactness: values aggregate as ``int64(round(val·scale))``
    fixed-point units (default cents), so retract/apply arithmetic is
    EXACT and association-free — float retraction would drift after
    enough batches (the reconcile operator's micro-unit convention).

    Scale shape: (1) distinct changed keys distill via per-batch
    ``pc.unique`` partials (driver holds the changed-KEY set only —
    a CDC batch is small relative to the base by definition; document
    envelope); (2) the base streams ONE vectorized membership filter
    (``pc.is_in`` against the broadcast key set) so only changed keys'
    old rows leave the scan; (3) old + change rows meet in ONE
    key-bucketed shuffle where the latest change per key is picked and
    per-group retract/apply deltas emit; (4) the driver merges the
    group-bounded delta vector into ``base_agg``. Groups with cnt=0
    drop. Returns ``(group, sum_scaled, cnt)`` sorted by group.
    """
    import pandas as pd
    import ray as _ray

    from .dedup import _as_dataset, bucketed_groupby

    cg = change_group_col or group_col
    cv = change_val_col or val_col

    def to_units(arr) -> "pa.Array":
        return pc.cast(
            pc.round(pc.multiply(pc.cast(arr, pa.float64()), scale)),
            pa.int64(),
        )

    # ---- bootstrap aggregate (one streaming pass) when not provided
    if base_agg is None:
        def agg_partial(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "g": batch[group_col],
                    "u": to_units(batch[val_col]),
                }
            )
            g = t.group_by("g").aggregate([("u", "sum"), ([], "count_all")])
            return pa.table(
                {
                    "g": g["g"],
                    "s": pc.cast(g["u_sum"], pa.int64()),
                    "c": pc.cast(g["count_all"], pa.int64()),
                }
            )

        parts = (
            _as_dataset(base, columns=[group_col, val_col])
            .map_batches(agg_partial, batch_format="pyarrow",
                         batch_size=batch_size)
            .to_pandas()
        )
        merged = parts.groupby("g", sort=True)[["s", "c"]].sum().reset_index()
        base_agg = pa.table(
            {
                "g": pa.array(merged["g"]),
                "s": pa.array(merged["s"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(merged["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    # ---- 1. distinct changed keys (per-batch unique partials)
    ch_ds = _as_dataset(changes).materialize()

    def key_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"k": pc.unique(batch[key_col].combine_chunks()).drop_null()}
        )

    kparts = ch_ds.map_batches(
        key_partial, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    changed = pa.array(pd.unique(kparts["k"])) if len(kparts) else pa.array([])
    changed_ref = _ray.put(changed)

    # ---- 2. old rows of changed keys only (vectorized semi-join)
    def old_rows(batch: pa.Table) -> pa.Table:
        keys = _ray.get(changed_ref)
        m = pc.is_in(batch[key_col], value_set=keys)
        t = batch.filter(m)
        return pa.table(
            {
                "k": t[key_col],
                "g": pc.cast(t[group_col], pa.string()),
                "u": to_units(t[val_col]),
                "op": pa.nulls(t.num_rows, pa.string()),
                "__side": pa.array(
                    np.zeros(t.num_rows, np.int8), pa.int8()
                ),
                **{
                    f"__s{i}": pa.nulls(t.num_rows, pa.float64())
                    for i in range(len(seq_cols))
                },
            }
        )

    def ch_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch[key_col],
                "g": pc.cast(batch[cg], pa.string()),
                "u": to_units(batch[cv]),
                "op": pc.cast(batch[op_col], pa.string()),
                "__side": pa.array(
                    np.ones(batch.num_rows, np.int8), pa.int8()
                ),
                **{
                    f"__s{i}": pc.cast(batch[c], pa.float64())
                    for i, c in enumerate(seq_cols)
                },
            }
        )

    old_ds = _as_dataset(
        base, columns=sorted({key_col, group_col, val_col})
    ).map_batches(old_rows, batch_format="pyarrow", batch_size=batch_size)
    chg_ds = ch_ds.map_batches(
        ch_rows, batch_format="pyarrow", batch_size=batch_size
    )

    # ---- 3. one key-bucketed shuffle: retract old, apply latest new
    sseq = [f"__s{i}" for i in range(len(seq_cols))]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["__side"] == 0]
        ch = g[g["__side"] == 1].sort_values(
            ["k", *sseq], kind="mergesort"
        ).drop_duplicates("k", keep="last")
        # retract every changed key's old contribution; apply the
        # latest non-delete state — both as vectorized group sums
        retract = old[old["k"].isin(ch["k"])]
        apply_ = ch[ch["op"] != "D"]
        frames = []
        if len(retract):
            r = retract.groupby("g", sort=False)["u"].agg(["sum", "size"])
            frames.append(
                pd.DataFrame(
                    {"g": r.index, "s": -r["sum"].to_numpy(np.int64),
                     "c": -r["size"].to_numpy(np.int64)}
                )
            )
        if len(apply_):
            a = apply_.groupby("g", sort=False)["u"].agg(["sum", "size"])
            frames.append(
                pd.DataFrame(
                    {"g": a.index, "s": a["sum"].to_numpy(np.int64),
                     "c": a["size"].to_numpy(np.int64)}
                )
            )
        if not frames:
            return pd.DataFrame(
                {"g": pd.Series(dtype=object),
                 "s": pd.Series(dtype=np.int64),
                 "c": pd.Series(dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    delta = bucketed_groupby(
        old_ds.union(chg_ds), ["k"], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    ).to_pandas()

    # ---- 4. merge group-bounded deltas into the stored aggregate
    acc = base_agg.to_pandas().set_index("g")
    if len(delta):
        dsum = delta.groupby("g", sort=False)[["s", "c"]].sum()
        acc = acc.add(dsum, fill_value=0)
    acc = acc[acc["c"] > 0].sort_index().reset_index()
    return pa.table(
        {
            "g": pa.array(acc["g"].astype(str)),
            "s": pa.array(acc["s"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(acc["c"].to_numpy(np.int64), pa.int64()),
        }
    )


def late_arrival_stats(
    source: Any,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key event-time disorder profile — the streaming-health
    metric that sizes watermarks: in ARRIVAL order (``arrival_col``),
    how many events carry an event time (``ts_col``) older than the
    running event-time high-water mark, and by how much. An event is
    LATE iff ``ts < max(ts of earlier arrivals in its key)``;
    ``lateness = watermark − ts`` at arrival (exact int64
    microseconds for timestamps). A pipeline that replays or fans in
    from lagging shards shows up here before any windowed aggregate
    silently drops its rows.

    ONE key-bucketed shuffle (the running_window shape); per bucket a
    single mergesort + pandas grouped ``cummax`` (C-vectorized) —
    no Python loops. Returns one row per key:
    ``(key, n, n_late, max_lateness_us, frac_late)`` (frac ROUND 6).
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col, arrival_col], kind="mergesort", na_position="last"
        )
        isna = g[ts_col].isna().to_numpy()
        t = g[ts_col].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            t = t.astype("datetime64[us]").view(np.int64).astype(np.float64)
        else:
            t = t.astype(np.float64)
        t[isna] = np.nan
        keys = g[key_col].to_numpy()
        ser = pd.Series(t, index=g.index)
        # watermark skips NULL event times (SQL window MAX semantics):
        # cummax leaves NaN at NULL positions — forward-fill the
        # running max through them before shifting
        cm = ser.groupby(keys, sort=False).cummax()
        cm = cm.groupby(keys, sort=False).ffill()
        prev = cm.groupby(keys, sort=False).shift(1)
        lateness = (prev - ser).clip(lower=0).fillna(0.0)
        late = (ser < prev).fillna(False)
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "late": late.to_numpy(),
                "lateness": lateness.to_numpy(),
            }
        )
        agg = out.groupby(key_col, sort=False).agg(
            n=("late", "size"),
            n_late=("late", "sum"),
            max_lateness_us=("lateness", "max"),
        ).reset_index()
        agg["n"] = agg["n"].astype(np.int64)
        agg["n_late"] = agg["n_late"].astype(np.int64)
        agg["max_lateness_us"] = agg["max_lateness_us"].astype(np.int64)
        agg["frac_late"] = np.round(
            agg["n_late"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64),
            6,
        )
        return agg

    ds = _as_dataset(source, columns=[key_col, arrival_col, ts_col])
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def windowed_aggregate_with_lateness(
    source: Any,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int = 3600,
    allowed_lateness_seconds: int = 0,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Tumbling-window aggregate with ALLOWED-LATENESS semantics — the
    deterministic batch replay of a streaming window with a per-key
    watermark (Flink/Beam allowed lateness): in ARRIVAL order
    (``arrival_col``), each key's watermark is its running max event
    time; a row is LATE — excluded from its window's aggregate but
    counted — iff ``ts < watermark_before_it − allowed_lateness``.
    Output per window: ``window_start, n_ontime, value_sum (ROUND 6,
    NULL when no on-time non-NULL values), n_late``. Window origin is
    the Unix epoch (DuckDB ``time_bucket`` parity); NULL event times
    drop entirely (they neither advance nor consume the watermark).

    Scale shape: ONE key-bucketed shuffle (the :func:`late_arrival_stats`
    running-cummax pass) emits per-(bucket, window) partials; the
    global merge is a window-bounded groupby sum. Rows cross the wire
    once; the second exchange is windows × buckets partial rows.
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    w_us = np.int64(window_seconds) * 1_000_000
    late_us = np.int64(allowed_lateness_seconds) * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col, arrival_col], kind="mergesort", na_position="last"
        )
        t = g[ts_col].to_numpy()
        t = t.astype("datetime64[us]").view(np.int64)
        keys = g[key_col].to_numpy()
        ser = pd.Series(t.astype(np.float64), index=g.index)
        prev = (
            ser.groupby(keys, sort=False).cummax()
            .groupby(keys, sort=False).shift(1)
        )
        late = (ser < prev - float(late_us)).fillna(False).to_numpy()
        win = (t // w_us) * w_us
        vals = g[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        on = ~late
        v_on = np.where(on & ~np.isnan(vals), vals, 0.0)
        c_on = (on & ~np.isnan(vals)).astype(np.int64)
        out = pd.DataFrame(
            {
                "__w": win,
                "n_on": on.astype(np.int64),
                "v_sum": v_on,
                "v_cnt": c_on,
                "n_late": late.astype(np.int64),
            }
        )
        agg = out.groupby("__w", sort=False).sum().reset_index()
        return agg

    ds = _as_dataset(
        source, columns=[key_col, arrival_col, ts_col, value_col]
    )
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[ts_col])),
        batch_format="pyarrow", batch_size=batch_size,
    )
    partials = bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )

    from ray.data.aggregate import Sum

    merged = partials.groupby("__w").aggregate(
        Sum("n_on", alias_name="n_ontime"),
        Sum("v_sum", alias_name="__vs"),
        Sum("v_cnt", alias_name="__vc"),
        Sum("n_late", alias_name="n_late"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        win = pa.array(
            batch["__w"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        )
        vs = batch["__vs"].to_numpy(zero_copy_only=False).astype(np.float64)
        vc = batch["__vc"].to_numpy(zero_copy_only=False).astype(np.int64)
        vsum = np.where(vc > 0, np.round(vs, 6), np.nan)
        return pa.table(
            {
                "window_start": win,
                "n_ontime": pc.cast(batch["n_ontime"], pa.int64()),
                "value_sum": pa.array(vsum, pa.float64()),
                "n_late": pc.cast(batch["n_late"], pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_mad(
    source: Any,
    group_col: str,
    value_col: str,
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """EXACT per-group median absolute deviation — the robust spread
    statistic behind outlier fences that survive heavy tails (unlike
    IQR·1.5 under extreme skew): ``mad = median(|x − median(x)|)``
    with ``quantile_cont`` interpolation at both levels, bit-exact vs
    DuckDB ``mad()`` on DOUBLE. Emits ``(group, n, median, mad)``
    (value copies / exact midpoints — no rounding). NULL values drop;
    an all-NULL group yields NULL median/mad.

    ONE bucketed shuffle co-locates each group; per bucket TWO
    vectorized sorted-segment passes (the
    :func:`grouped_exact_quantiles` machinery: sort, segment medians
    via gather/interpolate, then the same over deviations). Same
    partitioning assumption: a group's values fit one worker."""
    import pandas as pd

    from .dedup import bucketed_groupby

    def _seg_median(vals, keys):
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        counts = np.diff(np.r_[starts, len(keys)])
        med = _quantile_cont(vals, starts, counts, 0.5)
        return starts, counts, med

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        all_groups = g[group_col].dropna().drop_duplicates()
        gv = g.dropna(subset=[value_col]).sort_values(
            [group_col, value_col], kind="mergesort"
        )
        if len(gv):
            keys = gv[group_col].to_numpy()
            vals = gv[value_col].to_numpy(np.float64)
            starts, counts, med = _seg_median(vals, keys)
            # deviations, re-sorted per group, second median
            dev = np.abs(vals - np.repeat(med, counts))
            order = np.lexsort((dev, keys))
            dev_sorted = dev[order]
            _, _, mad = _seg_median(dev_sorted, keys[order])
            out = pd.DataFrame(
                {
                    group_col: keys[starts],
                    "n": counts.astype(np.int64),
                    "median": med,
                    "mad": mad,
                }
            )
        else:
            out = pd.DataFrame(
                {group_col: [], "n": [], "median": [], "mad": []}
            )
        missing = all_groups[~all_groups.isin(out[group_col])]
        if len(missing):
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            group_col: missing,
                            "n": np.zeros(len(missing), np.int64),
                            "median": np.nan,
                            "mad": np.nan,
                        }
                    ),
                ],
                ignore_index=True,
            )
        out["n"] = out["n"].astype(np.int64)
        return out

    ds = _as_dataset(source, columns=[group_col, value_col])
    return bucketed_groupby(
        ds, [group_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def interarrival_stats(
    source: Any,
    key_col: str,
    ts_col: str,
    *,
    tiebreak_cols: Optional[List[str]] = None,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key inter-arrival (event-gap) profile — the time-series
    hygiene report behind session gap choices and freshness SLAs: for
    each key, the count of events and of consecutive gaps, the mean
    gap in seconds (ROUND 6) and the min/max gaps in EXACT integer
    microseconds. NULL event times drop; keys with one event have zero
    gaps and NULL gap stats.

    ONE key-bucketed shuffle, then one vectorized diff + segment sweep
    per bucket (no per-key Python)."""
    import pandas as pd

    from .dedup import bucketed_groupby

    tb = list(tiebreak_cols or [])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, *tb], kind="mergesort")
        n = len(g)
        keys = g[key_col].to_numpy()
        t = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        same_key = np.zeros(n, bool)
        if n > 1:
            same_key[1:] = keys[1:] == keys[:-1]
        gaps = np.empty(n, np.int64)
        gaps[0] = 0
        gaps[1:] = t[1:] - t[:-1]
        gdf = pd.DataFrame(
            {
                key_col: keys,
                "__gap": np.where(same_key, gaps, 0),
                "__has": same_key,
            }
        )
        agg = gdf.groupby(key_col, sort=False).agg(
            n_events=("__has", "size"),
            n_gaps=("__has", "sum"),
            gap_sum=("__gap", "sum"),
        ).reset_index()
        # min/max over gap rows only (exclude the key-boundary zeros)
        gp = gdf[gdf["__has"]]
        if len(gp):
            mm = gp.groupby(key_col, sort=False)["__gap"].agg(
                ["min", "max"]
            ).reset_index().rename(
                columns={"min": "min_gap_us", "max": "max_gap_us"}
            )
            agg = agg.merge(mm, on=key_col, how="left")
        else:
            agg["min_gap_us"] = np.nan
            agg["max_gap_us"] = np.nan
        n_gaps = agg["n_gaps"].to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_s = np.where(
                n_gaps > 0,
                np.round(
                    agg["gap_sum"].to_numpy(np.float64)
                    / np.maximum(n_gaps, 1) / 1e6, 6,
                ),
                np.nan,
            )
        out = agg[[key_col]].copy()
        out["n_events"] = agg["n_events"].astype(np.int64)
        out["n_gaps"] = n_gaps
        out["mean_gap_s"] = mean_s
        out["min_gap_us"] = agg["min_gap_us"].to_numpy(np.float64)
        out["max_gap_us"] = agg["max_gap_us"].to_numpy(np.float64)
        return out

    ds = _as_dataset(source, columns=[key_col, ts_col, *tb])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[ts_col])),
        batch_format="pyarrow", batch_size=batch_size,
    )
    return bucketed_groupby(
        ds, [key_col], per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def grouped_acf(
    source: Any,
    key_col: str,
    order_cols: List[str],
    value_col: str,
    *,
    max_lag: int = 3,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Per-key lag-k autocorrelation of ``value_col`` in ``order_cols``
    order, lags 1..``max_lag`` — the seasonality/persistence profile of
    per-entity time series. Columns: ``key_col, lag, acf`` (ROUND 6;
    NULL when a key has <2 lag pairs or zero variance — SQL ``CORR``
    conventions, pairwise-complete over rows where both the value and
    its lag are non-NULL).

    ONE bucketed shuffle co-locates each key; per bucket a single sort
    then, per lag, one shifted-compare sweep builds the (x, y) pair
    arrays for ALL keys at once (rows i and i−lag share a key iff the
    sorted key column matches at distance lag) and a vectorized
    groupby of moment sums (n, Σx, Σy, Σxy, Σx², Σy²) closes the
    Pearson formula — no per-key Python."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            key_col: pd.Series(dtype=g[key_col].dtype),
            "lag": pd.Series(dtype=np.int64),
            "acf": pd.Series(dtype=np.float64),
        }
        if len(g) == 0:
            return pd.DataFrame(out_cols)
        g = g.sort_values([key_col] + order_cols, kind="stable")
        keys = g[key_col].to_numpy()
        v = g[value_col].to_numpy(np.float64)
        valid = ~np.isnan(v)
        frames = []
        for lag in range(1, max_lag + 1):
            if len(g) <= lag:
                break
            same = keys[lag:] == keys[:-lag]
            ok = same & valid[lag:] & valid[:-lag]
            if not ok.any():
                continue
            idx = np.nonzero(ok)[0]
            frames.append(
                pd.DataFrame(
                    {
                        key_col: keys[idx + lag],
                        "lag": np.int64(lag),
                        "x": v[idx],
                        "y": v[idx + lag],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(out_cols)
        pairs = pd.concat(frames, ignore_index=True)
        pairs["xy"] = pairs.x * pairs.y
        pairs["xx"] = pairs.x * pairs.x
        pairs["yy"] = pairs.y * pairs.y
        agg = pairs.groupby([key_col, "lag"], sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"),
        ).reset_index()
        n = agg["n"].to_numpy(np.float64)
        sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
        sxy = agg["sxy"].to_numpy()
        sxx, syy = agg["sxx"].to_numpy(), agg["syy"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = sxy - sx * sy / n
            vx = sxx - sx * sx / n
            vy = syy - sy * sy / n
            acf = cov / np.sqrt(vx * vy)
        bad = (n < 2) | (vx <= 0) | (vy <= 0)
        acf = np.where(bad, np.nan, acf)
        return pd.DataFrame(
            {
                key_col: agg[key_col],
                "lag": agg["lag"].astype(np.int64),
                "acf": np.round(acf, 6),
            }
        )

    ds = _as_dataset(source, columns=[key_col, *order_cols, value_col])

    def drop_null_order(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch[key_col])
        for c in order_cols:
            keep = pc.and_(keep, pc.is_valid(batch[c]))
        return batch.filter(keep)

    return bucketed_groupby(
        ds.map_batches(
            drop_null_order, batch_format="pyarrow", batch_size=batch_size
        ),
        [key_col],
        per_bucket,
        num_buckets=num_buckets,
        batch_size=batch_size,
    )


def pareto_frontier(
    source: Any,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Skyline (Pareto frontier, maximizing both ``x_col`` and
    ``y_col``): rows not dominated by any other row (``b`` dominates
    ``a`` iff ``b.x ≥ a.x ∧ b.y ≥ a.y`` with at least one strict).
    Duplicate coordinate pairs on the frontier are all kept (neither
    dominates).

    Scale shape: the frontier of a union is the frontier of the union
    of per-part frontiers, so each batch first reduces to its local
    frontier (one vectorized sort + group-cummax sweep, typically a
    tiny survivor set) and only survivors are re-swept once in a final
    single-partition pass — the same partial-then-merge shape as
    ``top_k_rows``. NULL coordinates never enter the frontier."""

    def frontier(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[x_col, y_col])
        if len(df) == 0:
            return df
        g = df.sort_values([x_col, y_col], ascending=False, kind="stable")
        x = g[x_col].to_numpy()
        y = g[y_col].to_numpy()
        # max y within each equal-x run
        new_x = np.concatenate([[True], x[1:] != x[:-1]])
        grp = np.cumsum(new_x) - 1
        grp_max = np.full(grp[-1] + 1, -np.inf)
        np.maximum.at(grp_max, grp, y)
        # running max of y over STRICTLY greater x (previous runs)
        prev = np.concatenate(
            [[-np.inf], np.maximum.accumulate(grp_max)[:-1]]
        )
        keep = (y == grp_max[grp]) & (y > prev[grp])
        return g[keep]

    def batch_frontier(batch: pa.Table) -> pd.DataFrame:
        return frontier(batch.select([id_col, x_col, y_col]).to_pandas())

    ds = _as_dataset(source, columns=[id_col, x_col, y_col])
    partial = ds.map_batches(
        batch_frontier, batch_format="pyarrow", batch_size=batch_size
    )
    # survivors of per-batch frontiers are small — one final sweep
    return partial.repartition(1).map_batches(
        frontier, batch_format="pandas", batch_size=None
    )


def bloom_prefilter_join(
    left: Any,
    right: Any,
    *,
    left_key: str,
    right_key: str,
    left_cols: List[str],
    right_cols: List[str],
    how: str = "inner",
    num_buckets: int = 64,
    n_bits: int = 1 << 23,
    k: int = 5,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Shuffle hash join with a Bloom pre-filter on the big side — the
    classic exchange-volume optimization for a SELECTIVE join: when
    the right side matches only a fraction of left keys, most left
    rows would shuffle only to be dropped in the merge. Here the right
    keys fold into per-batch partial Bloom filters whose registers
    OR-reduce on the driver (the driver holds ``n_bits/8`` bytes,
    never a key set), the merged filter broadcasts once via
    ``ray.put``, and left batches drop non-members BEFORE the
    exchange. False positives only admit extra rows into the shuffle —
    the join itself stays exact (same output as :func:`hash_join`).

    ``how='anti'`` INVERTS the pruning (the incremental-dedup shape —
    "drop rows already present in the reference corpus"): a left row
    whose key misses the Bloom filter is DEFINITELY unmatched (Blooms
    have no false negatives) and streams straight to the output with
    NO shuffle; only Bloom-positive rows — the small candidate set —
    go through the exact anti join. NULL left keys are kept (the
    :func:`hash_join` anti convention). Output equals
    ``hash_join(how='anti')`` exactly, but the exchange is sized by
    the match rate, not the table.

    Outer modes are rejected (they must keep AND pad unmatched rows).
    Keys hash after casting the right key to the left key's type, the
    same convention as :func:`hash_join`.
    """
    import ray as _ray

    from ..functions.sketches import BloomFilter, hash64

    if how not in ("inner", "semi", "anti"):
        raise ValueError(
            "bloom_prefilter_join supports how='inner'/'semi'/'anti' only "
            "(outer modes must keep and pad unmatched left rows)"
        )
    l_extra = [c for c in left_cols if c != left_key]
    l_ds = _as_dataset(left, columns=[left_key] + l_extra)
    r_ds = _as_dataset(
        right,
        columns=[right_key] + [c for c in right_cols if c != right_key],
    )
    l_type = dict(
        zip(l_ds.schema().names, l_ds.schema().types)
    )[left_key]

    def partial_bloom(batch: pa.Table) -> pa.Table:
        col = batch[right_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(l_type).drop_null()
        bf = BloomFilter(n_bits, k)
        bf.add_hashes(hash64(col))
        return pa.table(
            {"bloom": pa.array([bf.bits.tobytes()], pa.large_binary())}
        )

    parts = r_ds.map_batches(
        partial_bloom, batch_format="pyarrow", batch_size=batch_size
    ).take_all()
    bits = np.zeros(n_bits // 8, np.uint8)
    for row in parts:
        bits |= np.frombuffer(row["bloom"], np.uint8)
    ref = _ray.put(BloomFilter(n_bits, k, bits))

    def member_mask(batch: pa.Table) -> np.ndarray:
        bf = _ray.get(ref)
        col = batch[left_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return bf.contains_hashes(hash64(col)) & pc.is_valid(col).to_numpy(
            zero_copy_only=False
        )

    if how == "anti":
        # definite keeps: bloom-miss or NULL key — no false negatives,
        # so they stream to the output without touching the shuffle
        def keep_misses(batch: pa.Table) -> pa.Table:
            return batch.select(left_cols).filter(pa.array(~member_mask(batch)))

        def keep_candidates(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(member_mask(batch)))

        misses = l_ds.map_batches(
            keep_misses, batch_format="pyarrow", batch_size=batch_size
        )
        candidates = l_ds.map_batches(
            keep_candidates, batch_format="pyarrow", batch_size=batch_size
        )
        verified = hash_join(
            candidates,
            r_ds,
            left_key=left_key,
            right_key=right_key,
            left_cols=left_cols,
            right_cols=right_cols,
            num_buckets=num_buckets,
            how="anti",
        ).map_batches(
            # normalize to arrow blocks: union of pandas-block
            # (map_groups) and arrow-block datasets crashes the batcher
            lambda b: b.select(left_cols),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        return misses.union(verified)

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(member_mask(batch)))

    filtered = l_ds.map_batches(
        prefilter, batch_format="pyarrow", batch_size=batch_size
    )
    return hash_join(
        filtered,
        r_ds,
        left_key=left_key,
        right_key=right_key,
        left_cols=left_cols,
        right_cols=right_cols,
        num_buckets=num_buckets,
        how=how,
    )


def ohlc_resample(
    source: Any,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int = 3600,
    tiebreak_cols: Optional[List[str]] = None,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Time-series resampling to OHLC bars per (key, window):
    ``key, window_start, open, high, low, close, n_events`` — the
    downsampling step of a metrics/financial pipeline. Windows floor
    to the epoch (DuckDB ``time_bucket`` parity); NULL timestamps and
    NULL keys drop; ``open``/``close`` are the FIRST/LAST ROW's value
    in (ts, *tiebreak) order (may be NULL — SQL ``FIRST_VALUE``
    passes raw row values), ``high``/``low`` skip NULLs (SQL
    MIN/MAX). open/high/low/close are exact value COPIES (no float
    arithmetic), so oracle comparison needs no rounding.

    One bucketed shuffle on the key; per bucket ONE vectorized sort +
    pandas groupby head/tail/min/max handles all its (key, window)
    groups."""
    tiebreak_cols = list(tiebreak_cols or [])
    w_us = np.int64(window_seconds) * 1_000_000

    def windowed(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(batch[ts_col]), pc.is_valid(batch[key_col])
        )
        batch = batch.filter(keep)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        # floor (not truncate) so pre-epoch timestamps keep DuckDB
        # time_bucket parity — numpy // floors toward -inf
        ts_np = ts.to_numpy(zero_copy_only=False)
        win = pa.array((ts_np // w_us) * w_us, pa.int64())
        return pa.table(
            {
                key_col: batch[key_col],
                "__w": win,
                "__ts": ts,
                value_col: batch[value_col],
                **{c: batch[c] for c in tiebreak_cols},
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col, "__w", "__ts"] + tiebreak_cols, kind="stable"
        )
        grp = g.groupby([key_col, "__w"], sort=False)[value_col]
        out = grp.agg(
            open="first", high="max", low="min", close="last",
            n_events="size",
        ).reset_index()
        # pandas first/last skip NaN — SQL FIRST_VALUE/LAST_VALUE do
        # NOT; take the raw edge rows instead
        heads = g.drop_duplicates([key_col, "__w"], keep="first")
        tails = g.drop_duplicates([key_col, "__w"], keep="last")
        out["open"] = heads[value_col].to_numpy()
        out["close"] = tails[value_col].to_numpy()
        out["window_start"] = out["__w"].astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[
            [key_col, "window_start", "open", "high", "low", "close",
             "n_events"]
        ]

    ds = _as_dataset(
        source, columns=[key_col, ts_col, value_col] + tiebreak_cols
    )
    return bucketed_groupby(
        ds.map_batches(
            windowed, batch_format="pyarrow", batch_size=batch_size
        ),
        [key_col],
        per_bucket,
        num_buckets=num_buckets,
        batch_size=batch_size,
    )


def grouping_sets_aggregate(
    source: Any,
    key_cols: List[str],
    value_col: str,
    sets: List[List[str]],
    *,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """SQL ``GROUP BY GROUPING SETS ((…), (…), …)`` — arbitrary
    grouping sets in ONE pass (the general form of ROLLUP/CUBE, which
    delegate to the same engine). Output rows carry ``grouping_id``,
    the SQL bitmask ``GROUPING(k1)·2^(n-1) + … + GROUPING(kn)`` over
    ``key_cols`` order (bit set ⇔ key rolled up in that set), the key
    columns (NULL where rolled up), ``n_rows`` and ``value_sum``. Each
    set must use only ``key_cols``; duplicates rejected (SQL would
    emit duplicate result rows — opt in by listing the union
    explicitly)."""
    L = len(key_cols)
    pos = {c: i for i, c in enumerate(key_cols)}
    seen = set()
    tagged = []
    for s in sets:
        extra = [c for c in s if c not in pos]
        if extra:
            raise ValueError(f"grouping set uses non-key columns: {extra}")
        mask = 0
        for c in key_cols:
            if c not in s:
                mask |= 1 << (L - 1 - pos[c])
        if mask in seen:
            raise ValueError(f"duplicate grouping set: {s}")
        seen.add(mask)
        # keep key_cols order inside each set (stable output layout)
        tagged.append((mask, [c for c in key_cols if c in s]))
    return _grouping_sets_aggregate(
        source, key_cols, value_col, tagged, "grouping_id",
        num_buckets, batch_size,
    )


def pivot_sums(
    source: Any,
    key_col: str,
    cat_col: str,
    categories: List[str],
    value_col: str,
    *,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Pivoted per-category SUMs: one row per key with a
    ``sum_<cat>`` column per listed category plus ``n_<cat>`` counts —
    the aggregate sibling of :func:`pivot_counts` (same fixed-layout
    combiner shape: each batch one-hot-sums per key, the global
    groupby merges #keys × #batches partials; no post-shuffle pivot
    stage). NULL values contribute to neither sum nor count (SQL
    ``SUM(value) FILTER (WHERE cat = c)``); a key with no non-NULL
    values in a category reads sum 0 here (int64-exact for integer
    inputs, else float64 — wrap the oracle in COALESCE)."""
    from ray.data.aggregate import Sum

    cats = list(categories)

    def partial(batch: pa.Table) -> pa.Table:
        val = pc.cast(batch[value_col], pa.float64())
        valid = pc.is_valid(val)
        cols = {key_col: batch[key_col]}
        for i, c in enumerate(cats):
            m = pc.and_(pc.equal(batch[cat_col], c), valid)
            m = pc.fill_null(m, False)
            cols[f"s{i}"] = pc.if_else(m, val, pa.scalar(0.0))
            cols[f"c{i}"] = pc.cast(m, pa.int64())
        t = pa.table(cols)
        agg = t.group_by(key_col).aggregate(
            [(f"s{i}", "sum") for i in range(len(cats))]
            + [(f"c{i}", "sum") for i in range(len(cats))]
        )
        return agg.rename_columns(
            [key_col]
            + [f"s{i}" for i in range(len(cats))]
            + [f"c{i}" for i in range(len(cats))]
        )

    ds = _as_dataset(source, columns=[key_col, cat_col, value_col])
    part = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    out = part.groupby(key_col).aggregate(
        *(
            [Sum(f"s{i}", alias_name=f"s{i}") for i in range(len(cats))]
            + [Sum(f"c{i}", alias_name=f"c{i}") for i in range(len(cats))]
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        for i, c in enumerate(cats):
            cols[f"sum_{c}"] = pc.round(
                pc.cast(batch[f"s{i}"], pa.float64()), 6
            )
            cols[f"n_{c}"] = pc.cast(batch[f"c{i}"], pa.int64())
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")
