from parrsb_spark.plans.lineage import (
    LineageLog,
    checkpoint_state,
    format_phase_report,
    latest_checkpoint,
    phase_report,
)

__all__ = [
    "LineageLog",
    "checkpoint_state",
    "format_phase_report",
    "latest_checkpoint",
    "phase_report",
]
