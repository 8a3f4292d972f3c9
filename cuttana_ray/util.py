"""Small shared utilities."""

from __future__ import annotations


def pool_size(cap: int = 8) -> int:
    """Actor-pool concurrency that leaves CPU headroom for the read/shuffle
    stages around it: half the cluster CPUs, at least 1, at most ``cap``.

    A pool that reserves every CPU starves its upstream/downstream operators
    and can stall the streaming executor indefinitely (observed with
    concurrency=4 on a 4-CPU test cluster).
    """
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) if \
            ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus // 2))
