#!/usr/bin/env python
"""Characterize the host<->TPU tunnel link: RTT, single-stream H2D/D2H
bandwidth, and aggregate H2D bandwidth vs number of concurrent streams.

Motivation (VERDICT round 4, task 1): the input-included pipeline sits at
the single-stream H2D ceiling (~80 MB/s, 31 f/s at 2.6 MB/frame). If the
tunnel multiplexes concurrent transfers onto more aggregate bandwidth,
issuing device_put from several threads raises the pipeline ceiling
without touching the model.
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _best(fn, repeat=5):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)

    # force-arrival reducer: scalar fetch depends on every element
    reduce = jax.jit(lambda x: jnp.sum(jnp.max(x.reshape(-1, 4096), axis=0)))

    # RTT: round-trip of a FRESH tiny computation each time (a resident
    # array's value is host-cached after the first fetch)
    one = jax.device_put(jnp.float32(1.0), dev)
    bump = jax.jit(lambda x: x + 1.0)
    float(reduce(jax.device_put(np.zeros(4096, np.uint8), dev)))  # warm
    float(bump(one))
    t = _best(lambda: float(bump(one)), repeat=20)
    print(json.dumps({"rtt_ms": round(t * 1e3, 2)}), flush=True)

    # single-stream H2D bandwidth (size slope cancels fixed cost)
    def h2d_time(size, nbuf=4):
        xs = [np.full((size,), i, np.uint8) for i in range(nbuf)]
        float(reduce(jax.device_put(xs[0], dev)))  # shape warm-up
        return _best(
            lambda: [float(reduce(jax.device_put(x, dev))) for x in xs],
            repeat=3) / nbuf

    s1, s2 = 4 * 2**20, 64 * 2**20
    t1, t2 = h2d_time(s1), h2d_time(s2)
    bw = (s2 - s1) / (t2 - t1)
    fixed = t1 - s1 / bw
    print(json.dumps({"h2d_single_mb_per_s": round(bw / 2**20, 1),
                      "h2d_fixed_ms": round(fixed * 1e3, 2)}), flush=True)

    # concurrent-stream aggregate H2D: K threads each put distinct 16 MB
    # buffers, one force-fetch at the end (sum of per-chunk reductions)
    size = 16 * 2**20
    for k in (1, 2, 4, 8):
        bufs = [np.full((size,), i + 1, np.uint8) for i in range(k * 3)]
        pool = ThreadPoolExecutor(k)

        def put_all():
            devs = list(pool.map(lambda x: jax.device_put(x, dev), bufs))
            # force all arrivals; each reduce result fetched
            return [float(reduce(d)) for d in devs]

        put_all()  # warm
        t = _best(put_all, repeat=3)
        agg = len(bufs) * size / t
        print(json.dumps({"streams": k,
                          "h2d_aggregate_mb_per_s": round(agg / 2**20, 1)}),
              flush=True)
        pool.shutdown()

    # D2H: fresh device values each fetch (bump the array so no host cache)
    for size in (4 * 2**20, 64 * 2**20):
        xd = jax.device_put(np.zeros((size,), np.uint8), dev)
        bump8 = jax.jit(lambda x: x + np.uint8(1))
        xd = bump8(xd)
        np.asarray(xd)

        def fetch():
            nonlocal xd
            xd = bump8(xd)
            return np.asarray(xd)

        t = _best(fetch, repeat=4)
        print(json.dumps({"d2h_size_mb": size // 2**20,
                          "d2h_ms": round(t * 1e3, 2),
                          "d2h_mb_per_s": round(size / t / 2**20, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
