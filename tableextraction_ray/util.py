"""Shared cluster-sizing helpers (one definition for the pool-math rules
that used to be copy-pasted across stages)."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """CPU count of the running cluster, resolved at pipeline-BUILD time
    (``default`` when Ray is not yet initialised). All pool minima derived
    from this must leave >= 2 CPUs for non-actor tasks or the pipeline
    livelocks (see ExtractConfig.resolved_pools)."""
    import ray

    return (
        int(ray.cluster_resources().get("CPU", default))
        if ray.is_initialized()
        else default
    )
