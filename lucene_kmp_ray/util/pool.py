"""Shared actor-pool sizing."""

from __future__ import annotations


def pool_size(requested=None) -> int:
    """Actor-pool size that leaves CPU headroom for upstream reads and the
    downstream shuffle: an actor pool equal to the whole cluster starves
    its own input (deadlocks outright at num_cpus == concurrency)."""
    if requested is not None:
        return requested
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    return max(1, min(cpus - 2, 8))
