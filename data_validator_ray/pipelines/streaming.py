"""Micro-batch streaming validation — the reference's generated
Databricks structured-streaming script (`databricks_utils.py:424-450`)
re-expressed as a checkpointed foreachBatch loop over Ray Datasets.

The reference's streaming surface is: for each micro-batch, (1) skip it
if empty, (2) ``validate_table`` and print the summary, (3)
``apply_filters`` and append the clean rows to ``{table}_validated``,
with Spark's ``checkpointLocation`` guaranteeing each batch is
processed exactly once across restarts. This module reproduces that
loop:

* each *batch source* is anything :meth:`RayDataValidator.load_data`
  accepts (a Parquet path, a Dataset, a DataFrame) — the micro-batch
  model assumes a batch is bounded, so per-batch validation may scan
  it twice (verdicts, then the filter pass), exactly like the
  reference's ``foreachBatch`` body;
* clean rows land under ``{out_root}/{table}_validated/batch={id}/``
  (one directory per micro-batch = resumable, append-shaped output);
* a JSON checkpoint (atomic tmp+rename, the :class:`~..state.
  PipelineState` convention) records each completed batch's summary
  row; a killed run resumes SKIPPING completed batches and replays
  their checkpointed summaries, so the returned frame is identical to
  an uninterrupted run. A batch's stale partial output directory is
  wiped before rewrite (kill-mid-write safety — the
  :class:`~.runner.TransformRunner` convention).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import pandas as pd
import pyarrow.parquet as pq

__all__ = ["validate_microbatches"]

_REC_COLS = ["batch_id", "n_rows", "n_clean", "passed_rules", "failed_rules"]


def _dir_row_count(d: Path) -> int:
    """Footer-only row count of every Parquet file under ``d``."""
    return sum(
        pq.ParquetFile(str(f)).metadata.num_rows
        for f in sorted(d.rglob("*.parquet"))
    )


def _commit_added_rows(table: Path, version: int) -> int:
    """Rows added by one Delta commit (stats numRecords when present,
    else the file footer — metadata-only either way)."""
    import json as _json
    from urllib.parse import unquote

    total = 0
    log = table / "_delta_log" / f"{version:020d}.json"
    for line in log.read_text().splitlines():
        if '"add"' not in line:
            continue
        action = _json.loads(line)
        a = action.get("add")
        if not a:
            continue
        st = a.get("stats")
        if isinstance(st, str):
            st = _json.loads(st)
        if st and "numRecords" in st:
            total += int(st["numRecords"])
        else:
            total += pq.ParquetFile(
                str(table / unquote(a["path"]))
            ).metadata.num_rows
    return total


def validate_microbatches(
    validator: Any,
    table_name: str,
    batch_sources: Sequence[Any],
    out_root: "str | Path",
    *,
    resume: bool = True,
    max_batches: Optional[int] = None,
    metrics_history: Optional[Any] = None,
    sink_format: str = "parquet",
) -> pd.DataFrame:
    """Run the reference's streaming-validation loop over an ordered
    sequence of micro-batch sources.

    Per batch: empty batches are skipped without validation (the
    reference's ``if batch_df.count() > 0`` guard — their summary row
    is all zeros); otherwise the batch is validated (per-batch rule
    verdicts), filtered (fused keep-mask pass), and its clean rows are
    written to ``{out_root}/{table_name}_validated/batch={id}/``.

    ``max_batches`` stops after N newly-processed batches (the
    kill-the-run test hook). ``metrics_history`` (a
    :class:`~..state.metrics_history.MetricsHistory`) receives one run
    per batch (``run_id="batch-{id}"``) with per-rule success rates —
    the streaming metrics sink.

    ``sink_format="delta"`` appends clean rows to ONE Delta table
    (``{out_root}/{table_name}_validated_delta``) instead of per-batch
    Parquet dirs, carrying the protocol's ``txn`` action
    (``appId=stream-{table_name}``, ``version=batch_id``) in each
    commit — on restart, a batch whose txn version is already in the
    log is NOT re-appended even if the JSON checkpoint write was lost
    mid-crash (true exactly-once, the Spark-streaming-to-Delta
    contract), its summary is recomputed and re-checkpointed.

    Returns one row per *completed* batch:
    ``(batch_id, n_rows, n_clean, passed_rules, failed_rules)``,
    ordered by batch_id. All counts are int64.
    """
    out = Path(out_root)
    out.mkdir(parents=True, exist_ok=True)
    ckpt = out / "_streaming_checkpoint.json"
    done: Dict[str, Dict[str, int]] = {}
    if resume and ckpt.exists():
        done = json.loads(ckpt.read_text())

    val_root = out / f"{table_name}_validated"
    rows: List[Dict[str, int]] = []
    processed = 0
    for bid, src in enumerate(batch_sources):
        key = str(bid)
        if key in done:
            rows.append(done[key])
            continue
        if max_batches is not None and processed >= max_batches:
            break
        ds = validator.load_data(src)
        n_rows = ds.count()
        if n_rows == 0:
            rec = dict.fromkeys(_REC_COLS, 0)
            rec["batch_id"] = bid
        else:
            summary = validator.validate_table(src, table_name)
            if sink_format == "delta":
                from ..sources.delta import (
                    delta_txn_version,
                    write_delta,
                )

                tdir = out / f"{table_name}_validated_delta"
                app = f"stream-{table_name}"
                done_v = (
                    delta_txn_version(tdir, app)
                    if (tdir / "_delta_log").is_dir()
                    else None
                )
                if done_v is not None and done_v >= bid:
                    # crash landed between the Delta commit and the
                    # checkpoint write: the txn proves the append
                    # happened — recover n_clean from that commit's
                    # metadata, never re-append. Match the txn action
                    # by PARSED appId+version (a raw substring probe
                    # would prefix-match version 10 for bid=1).
                    ver = None
                    for c in sorted((tdir / "_delta_log").glob("*.json")):
                        for line in c.read_text().splitlines():
                            if '"txn"' not in line:
                                continue
                            t = json.loads(line).get("txn") or {}
                            if (
                                t.get("appId") == app
                                and int(t.get("version", -1)) == bid
                            ):
                                ver = int(c.name[:-5])
                                break
                        if ver is not None:
                            break
                    if ver is None:
                        raise RuntimeError(
                            f"streaming resume: txn ({app}, {bid}) is "
                            "recorded in the Delta log state but its "
                            "commit file is gone (log cleaned?); "
                            "cannot recover the batch's row count"
                        )
                else:
                    ver = write_delta(
                        validator.apply_filters(src, table_name),
                        tdir,
                        mode="append",
                        txn=(app, bid),
                    )
                n_clean = _commit_added_rows(tdir, ver)
            else:
                bdir = val_root / f"batch={bid}"
                if bdir.exists():  # kill-mid-write leftovers
                    shutil.rmtree(bdir)
                validator.apply_filters(src, table_name).write_parquet(
                    str(bdir)
                )
                n_clean = _dir_row_count(bdir)
            rec = {
                "batch_id": bid,
                "n_rows": int(n_rows),
                "n_clean": n_clean,
                "passed_rules": int(summary.passed_rules),
                "failed_rules": int(summary.failed_rules),
            }
            if metrics_history is not None:
                metrics_history.append(
                    f"batch-{bid}",
                    {
                        f"{r.rule_name}.success_rate": float(r.success_rate)
                        for r in summary.results
                    },
                )
        done[key] = rec
        tmp = ckpt.with_suffix(".tmp")
        tmp.write_text(json.dumps(done))
        os.replace(tmp, ckpt)  # atomic: a kill never tears the state
        rows.append(rec)
        processed += 1

    frame = pd.DataFrame(rows, columns=_REC_COLS)
    return (
        frame.astype("int64")
        .sort_values("batch_id")
        .reset_index(drop=True)
    )
