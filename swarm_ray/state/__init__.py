from .checkpoint import PartitionPlan, plan_partitions, is_done, commit_partition, pending_partitions

__all__ = ["PartitionPlan", "plan_partitions", "is_done", "commit_partition", "pending_partitions"]
