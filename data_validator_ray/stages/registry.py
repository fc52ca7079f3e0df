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
    (caught by the validator into the reference's error-result path)."""
    cls = _REGISTRY.get(rule.rule_type)
    if cls is None:
        raise ValueError(f"Unsupported rule type: {rule.rule_type}")
    return cls(rule)


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
