from .flagship import build_routed, run_job, run_partition

__all__ = ["build_routed", "run_job", "run_partition"]
