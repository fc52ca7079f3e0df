"""Check-kernel registry — the rebuild's extension seam.

The reference extends by subclassing a ``ValidationEngine`` ABC
(``engines/__init__.py:42-107``). In a Ray-Data-first design the engine
is fixed (Ray) and the extension point is the *check kernel*: a class
registered per ``rule_type`` that knows how to

* compute a mergeable per-batch **partial** (vectorized, Arrow in),
* **combine** partials associatively into (total, failed, extras),
* emit a per-row **failing mask** (violation rows / quarantine), and
* emit a per-row **keep mask** (rule-as-filter mode, reference
  ``apply_filter`` semantics).

All built-in rule types (SURVEY.md §2.2, §2.6 C7) register here, so a
user-defined check plugs in exactly like ``completeness`` does.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Type

import pyarrow as pa

from ..config import ValidationRule

_REGISTRY: Dict[str, Type["CheckKernel"]] = {}


def register_check(rule_type: str):
    """Class decorator: ``@register_check("completeness")``."""

    def deco(cls: Type["CheckKernel"]) -> Type["CheckKernel"]:
        _REGISTRY[rule_type] = cls
        cls.rule_type = rule_type
        return cls

    return deco


def kernel_for(rule: ValidationRule) -> "CheckKernel":
    """Instantiate the kernel for a rule; raises for unknown types
    (caught by the validator into the reference's error-result path).
    A ``parameters.where`` DSL predicate wraps the kernel in
    :class:`ScopedKernel` so ANY rule type evaluates only over the
    matching row subset (SQL ``WHERE`` scoping — net-new vs the
    reference, whose rules always see the whole table)."""
    cls = _REGISTRY.get(rule.rule_type)
    if cls is None:
        raise ValueError(f"Unsupported rule type: {rule.rule_type}")
    kernel = cls(rule)
    where = rule.parameters.get("where") if rule.parameters else None
    if where:
        return ScopedKernel(kernel, str(where))
    return kernel


def registered_types() -> List[str]:
    return sorted(_REGISTRY)


class CheckKernel:
    """Base class for per-rule vectorized kernels.

    Lifecycle: constructed once per rule on the driver (argument
    validation happens here so bad rules error eagerly, matching the
    reference's per-rule error results), then shipped inside the fused
    ``map_batches`` closure. ``partial`` runs per Arrow batch on
    workers; ``combine`` runs on the driver over the (tiny) partials.
    """

    rule_type: str = "abstract"
    #: kernels that need a global shuffle (exact uniqueness) instead of
    #: the fused map pass
    needs_shuffle: bool = False
    #: kernels evaluated once per table (schema conformance, drift)
    table_level: bool = False
    #: kernels that need driver-side preparation (broadcast ref keys)
    def prepare(self, ctx: "Dict[str, Any]") -> None:  # noqa: D401
        """Hook for driver-side setup (e.g. broadcast a key set)."""

    def __init__(self, rule: ValidationRule):
        self.rule = rule

    # -- fused streaming pass ------------------------------------------------
    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        """Mergeable per-batch partial. Default: count failing mask."""
        mask = self.mask_failing(batch)
        import pyarrow.compute as pc

        failed = pc.sum(mask).as_py() or 0 if mask is not None else 0
        return {"total": batch.num_rows, "failed": int(failed)}

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Associative merge of partials → {'total', 'failed', ...extras}."""
        total = sum(p["total"] for p in partials)
        failed = sum(p["failed"] for p in partials)
        return {"total": total, "failed": failed}

    # -- per-row masks ---------------------------------------------------------
    def mask_failing(self, batch: pa.Table) -> Optional[pa.ChunkedArray]:
        """True where the row VIOLATES the rule (NULL handled per rule)."""
        return None

    def mask_keep(self, batch: pa.Table) -> Optional[pa.ChunkedArray]:
        """Filter-mode keep mask; ``None`` → rule filters nothing
        (reference fallback F5). NOTE the reference's asymmetry: filter
        mode drops NULL pattern/range rows that validation counts as
        passing (SURVEY.md §2.3) — preserved deliberately."""
        return None

    # -- table-level -----------------------------------------------------------
    def evaluate_table_level(self, ctx: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError

    def _require_column(self) -> str:
        if not self.rule.column:
            raise ValueError(
                f"{self.rule.rule_type.capitalize()} rule requires a column name"
            )
        return self.rule.column

class ScopedKernel(CheckKernel):
    """Wrapper giving ANY kernel SQL ``WHERE`` scoping: the inner rule
    sees only rows matching a ``parameters.where`` DSL predicate
    (compiled ONCE here on the driver, shipped inside the fused
    closure — SQL three-valued semantics, NULL predicate → row out of
    scope).

    Semantics per mode:

    * validation — ``total`` is the in-scope row count; the verdict is
      the inner rule's over that subset (``SELECT ... WHERE <expr>``).
    * violations — a row fails iff it is in scope AND the inner mask
      fails it (out-of-scope rows can never be violations).
    * filter mode — keep iff OUT of scope OR the inner keep-mask keeps
      it (the rule constrains only the rows it applies to).
    * table-level (schema) — scoping a whole-table check is
      meaningless; rejected eagerly into the error-result path.

    Scale shape: the predicate mask is one vectorized Arrow pass per
    batch before the inner kernel's pass — no extra read, no shuffle.
    The validator widens column pruning and the exact-uniqueness
    shuffle path via :attr:`where_columns` / :meth:`scope_batch`.
    """

    def __init__(self, inner: CheckKernel, where: str):
        super().__init__(inner.rule)
        from ..functions.expr import compile_predicate, referenced_columns

        # schema conformance has no per-batch pass to scope; every other
        # kernel (incl. table-level drift/quantile, whose VERDICT is
        # table-level but whose sketch partials run per batch) scopes fine
        if inner.rule_type == "schema":
            raise ValueError(
                "'where' is not supported for schema rules "
                "(no per-row evaluation to scope)"
            )
        self.inner = inner
        self.where = where
        self.rule_type = inner.rule_type
        self.needs_shuffle = inner.needs_shuffle
        self.table_level = inner.table_level
        self.column = getattr(inner, "column", None)
        self._evaluator = compile_predicate(where)
        self.where_columns = sorted(referenced_columns(where))

    def prepare(self, ctx: "Dict[str, Any]") -> None:
        self.inner.prepare(ctx)

    def _where_mask(self, batch: pa.Table) -> pa.ChunkedArray:
        from ..functions.expr import predicate_true_mask

        return predicate_true_mask(self._evaluator, batch)

    def scope_batch(self, batch: pa.Table) -> pa.Table:
        """The in-scope subset of a batch (used by the validator's
        uniqueness shuffle path as well as every mode here)."""
        return batch.filter(self._where_mask(batch))

    def partial(self, batch: pa.Table) -> Dict[str, Any]:
        return self.inner.partial(self.scope_batch(batch))

    def combine(self, partials: List[Dict[str, Any]]) -> Dict[str, Any]:
        return self.inner.combine(partials)

    def mask_failing(self, batch: pa.Table) -> Optional[pa.ChunkedArray]:
        import pyarrow.compute as pc

        m = self.inner.mask_failing(batch)
        if m is None:
            return None
        return pc.and_kleene(self._where_mask(batch), m)

    def mask_keep(self, batch: pa.Table) -> Optional[pa.ChunkedArray]:
        import pyarrow.compute as pc

        m = self.inner.mask_keep(batch)
        if m is None:
            return None
        return pc.or_kleene(pc.invert(self._where_mask(batch)), m)
