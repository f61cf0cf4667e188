"""Memory usage reporting (MemoryGetUsage analog, memusage.c:7-26).

The reference queries PETSc/kernel RSS per rank; here we report both host
RSS and per-device HBM statistics from the JAX client.
"""

from __future__ import annotations

import resource
from typing import Dict

import jax


def host_rss_bytes() -> int:
    """Resident set size of this process (the per-rank number the FE
    sampler prints, sampler.c:119-131)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device HBM stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {k: int(v) for k, v in stats.items()
                           if isinstance(v, (int, float))}
    return out


def format_memory_report() -> str:
    lines = [f"host rss: {host_rss_bytes() / 2**20:.1f} MiB"]
    for dev, stats in device_memory_stats().items():
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        lines.append(f"{dev}: {used / 2**20:.1f} MiB in use"
                     + (f" / {limit / 2**20:.1f} MiB" if limit else ""))
    return "\n".join(lines)
