from parrsb_spark.plans.lineage import LineageLog, checkpoint_state, latest_checkpoint

__all__ = ["LineageLog", "checkpoint_state", "latest_checkpoint"]
