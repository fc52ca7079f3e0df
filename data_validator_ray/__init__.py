"""data_validator_ray — a Ray-Data-native schema + constraint validation
engine for web-scale Parquet tables.

Re-implements the validation semantics of ``infinit3labs/data_validator``
(rules, thresholds, verdicts, reports, filter mode, resumable state)
with an idiomatic Ray Data architecture: one fused streaming
``map_batches`` pass per table, mergeable sketch partials, shuffles only
where semantics demand (exact uniqueness), broadcast semi-joins for
referential checks, and partition-granular Parquet checkpoints.
"""

from .config import (
    DQXConfig,
    EngineConfig,
    PipelineConfig,
    TableConfig,
    ValidationConfig,
    ValidationRule,
)
from .results import ValidationResult, ValidationSummary
from .settings import load_config
from .stages.drift import read_baseline, write_baseline
from .state import PipelineState
from .validator import DataValidator, RayDataValidator

__version__ = "0.1.0"

__all__ = [
    "DataValidator",
    "RayDataValidator",
    "ValidationConfig",
    "ValidationRule",
    "TableConfig",
    "EngineConfig",
    "DQXConfig",
    "PipelineConfig",
    "ValidationResult",
    "ValidationSummary",
    "PipelineState",
    "load_config",
    "write_baseline",
    "read_baseline",
    "__version__",
]
