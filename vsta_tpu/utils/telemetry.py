"""Device/host telemetry (TPU analog of the reference's pynvml/psutil
probes, project/train.py:22-31, 310-330)."""

from __future__ import annotations

from typing import Dict, Optional

import jax


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats from the JAX runtime (bytes + percent)."""
    out: Dict[str, float] = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if not stats:
            continue
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        out[f"device{i}_mem_used_mb"] = used / (1024 * 1024)
        if limit:
            out[f"device{i}_mem_percent"] = 100.0 * used / limit
    return out


def host_stats() -> Dict[str, float]:
    try:
        import psutil

        return {
            "cpu_percent": psutil.cpu_percent(interval=None),
            "ram_percent": psutil.virtual_memory().percent,
        }
    except Exception:
        return {}


def max_device_memory_percent() -> Optional[float]:
    stats = device_memory_stats()
    pcts = [v for k, v in stats.items() if k.endswith("mem_percent")]
    return max(pcts) if pcts else None
