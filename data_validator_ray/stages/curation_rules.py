"""Curation checks exposed as validation rules (registry extension).

The curation tier (pipelines/curation.py) is also reachable through the
reference-style YAML rule surface — a user writes ``rule_type: pii`` or
``rule_type: repetition`` in a table config exactly like
``completeness``, and the kernel runs inside the same fused
``map_batches`` pass (one read for the whole rule suite). This is the
extension seam the registry exists for (SURVEY.md §2.6 C1/C2): these
two kernels are written as a third-party would write them — no
validator changes, just ``@register_check``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ValidationRule
from .registry import CheckKernel, register_check


@register_check("pii")
class PiiKernel(CheckKernel):
    """Failing row: the column contains ANY PII-shaped span (email /
    phone / IPv4 by default — ``parameters.patterns`` overrides with a
    list of RE2 strings). NULL never fails. Filter mode keeps only
    PII-free rows (the redaction pipeline ``curation.pii_redact`` is
    the transform-side alternative that scrubs instead of dropping).
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        pats = rule.parameters.get("patterns")
        if pats is None:
            from ..pipelines.curation import PII_PATTERNS

            pats = [p for _, p, _ in PII_PATTERNS]
        if not pats:
            raise ValueError("PII rule requires at least one pattern")
        self.patterns = list(pats)

    def _hit(self, batch: pa.Table):
        col = batch[self.column]
        hit = None
        for pat in self.patterns:
            m = pc.match_substring_regex(col, pat)
            hit = m if hit is None else pc.or_(hit, m)
        return hit

    def mask_failing(self, batch: pa.Table):
        return pc.fill_null(self._hit(batch), False)

    def mask_keep(self, batch: pa.Table):
        # filter mode drops NULLs (reference F3 asymmetry convention)
        return pc.fill_null(pc.invert(self._hit(batch)), False)


@register_check("repetition")
class RepetitionKernel(CheckKernel):
    """Gopher-style repetition gate as a rule. Failing row: the doc
    violates any enabled integer-threshold comparison over the
    :func:`pipelines.curation.gopher_stats` counters:

    - ``min_tokens`` (default 5): ``n_tokens < min_tokens`` fails
    - ``max_top_2gram_x`` (default 5, i.e. ≤ 20 %):
      ``top_2gram_count * X > n_2grams`` fails
    - ``max_symbol_x`` (default 10, i.e. ≤ 10 %):
      ``n_symbol_chars * X > total_token_chars`` fails
    - ``min_mean_token_len`` / ``max_mean_token_len`` (default 2 / 12):
      ``total_token_chars`` outside ``[min·n, max·n]`` fails

    NULL/empty text fails via ``min_tokens`` (0 tokens). All
    comparisons are pure int64 arithmetic → bit-exact vs a SQL oracle.
    Filter mode keeps passing docs (``curation.gopher_filter``
    equivalent, fused with the rest of the rule suite).
    """

    def __init__(self, rule: ValidationRule):
        super().__init__(rule)
        self.column = self._require_column()
        p = rule.parameters
        self.min_tokens = int(p.get("min_tokens", 5))
        self.max_top_2gram_x = int(p.get("max_top_2gram_x", 5))
        self.max_symbol_x = int(p.get("max_symbol_x", 10))
        self.min_mean_len = int(p.get("min_mean_token_len", 2))
        self.max_mean_len = int(p.get("max_mean_token_len", 12))

    def _passing(self, batch: pa.Table) -> np.ndarray:
        from ..pipelines.curation import _gopher_columns, _token_frame

        ex, n = _token_frame(batch[self.column])
        g = _gopher_columns(batch, ex, n, self.column)
        nt = g["n_tokens"].to_numpy(zero_copy_only=False)
        n2 = g["n_2grams"].to_numpy(zero_copy_only=False)
        top = g["top_2gram_count"].to_numpy(zero_copy_only=False)
        chars = g["total_token_chars"].to_numpy(zero_copy_only=False)
        sym = g["n_symbol_chars"].to_numpy(zero_copy_only=False)
        return (
            (nt >= self.min_tokens)
            & (top * self.max_top_2gram_x <= n2)
            & (sym * self.max_symbol_x <= chars)
            & (self.min_mean_len * nt <= chars)
            & (chars <= self.max_mean_len * nt)
        )

    def mask_failing(self, batch: pa.Table):
        return pa.chunked_array([pa.array(~self._passing(batch), pa.bool_())])

    def mask_keep(self, batch: pa.Table):
        return pa.chunked_array([pa.array(self._passing(batch), pa.bool_())])
