"""Probe the tunneled TPU's device->host fetch behavior.

Questions this answers (round-5 host-consume work):
  1. What is a single small-blob fetch round trip (latency floor)?
  2. Do CONCURRENT fetches from multiple threads overlap on the tunnel,
     or serialize? (Decides whether more fetch workers help.)
  3. How does the cost scale with blob size (latency- vs bandwidth-bound)?
  4. Does copy_to_host_async make a later read ~free, and how much head
     start does it need?

Method note: preparing a fresh (uncached) device array requires a dispatch
but NOT a block_until_ready — blocking is itself a ~30 ms round trip that
would pollute every number. Arrays are prepared in a batch, readiness is
awaited once, then fetch patterns are timed in isolation.
"""
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def report(label, ts):
    ts = sorted(ts)
    print(f"{label:55s} med {ts[len(ts)//2]:8.2f} ms  min {ts[0]:8.2f}  max {ts[-1]:8.2f}")
    return ts[len(ts) // 2]


def main():
    print("backend:", jax.default_backend())
    sizes = {
        "4KB": 1024,
        "64KB": 16 * 1024,
        "256KB": 64 * 1024,
        "1MB": 256 * 1024,
        "4MB": 1024 * 1024,
    }
    bases = {k: jax.device_put(jnp.arange(v, dtype=jnp.float32)) for k, v in sizes.items()}
    for d in bases.values():
        jax.block_until_ready(d)

    @jax.jit
    def bump(x, c):
        return x + c

    def make_fresh(k, n):
        """n NEW device arrays (distinct contents -> no fetch cache), all
        ready before return; the single block here is outside all timing."""
        arrs = [bump(bases[k], float(i + 1)) for i in range(n)]
        jax.block_until_ready(arrs)
        return arrs

    print("\n-- single fetch round trip by size (fresh ready array) --")
    for k in sizes:
        ts = []
        for _ in range(5):
            (a,) = make_fresh(k, 1)
            t0 = time.perf_counter()
            np.asarray(a)
            ts.append((time.perf_counter() - t0) * 1e3)
        report(f"fetch {k}", ts)

    print("\n-- N concurrent 64KB fetches from N threads (all ready) --")
    for n in (1, 2, 4, 8):
        pool = ThreadPoolExecutor(max_workers=n)
        ts = []
        for _ in range(5):
            arrs = make_fresh("64KB", n)
            t0 = time.perf_counter()
            futs = [pool.submit(np.asarray, a) for a in arrs]
            for f in futs:
                f.result()
            ts.append((time.perf_counter() - t0) * 1e3)
        report(f"{n} concurrent 64KB fetches (total)", ts)
        pool.shutdown()

    print("\n-- stacked vs separate: 4x64KB (stack dispatched, ready) --")
    ts = []
    for _ in range(5):
        arrs = make_fresh("64KB", 4)
        s = jnp.stack(arrs)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        np.asarray(s)
        ts.append((time.perf_counter() - t0) * 1e3)
    report("one fetch of a ready 4x64KB stack", ts)
    ts = []
    for _ in range(5):
        arrs = make_fresh("64KB", 4)
        t0 = time.perf_counter()
        for a in arrs:
            np.asarray(a)
        ts.append((time.perf_counter() - t0) * 1e3)
    report("4x64KB fetched serially (one thread)", ts)

    print("\n-- async copy head start: copy_to_host_async then read after X ms --")
    for k in ("64KB", "256KB"):
        for delay_ms in (0, 10, 20, 40, 80):
            reads = []
            for _ in range(5):
                (a,) = make_fresh(k, 1)
                a.copy_to_host_async()
                time.sleep(delay_ms / 1e3)
                t0 = time.perf_counter()
                np.asarray(a)
                reads.append((time.perf_counter() - t0) * 1e3)
            reads.sort()
            print(f"{k}: read after {delay_ms:3d} ms head start: med {reads[2]:8.2f} ms")

    print("\n-- concurrent async-copied fetches: start N copies, read all --")
    for n in (2, 4, 8):
        ts = []
        for _ in range(5):
            arrs = make_fresh("64KB", n)
            t0 = time.perf_counter()
            for a in arrs:
                a.copy_to_host_async()
            for a in arrs:
                np.asarray(a)
            ts.append((time.perf_counter() - t0) * 1e3)
        report(f"{n}x64KB: async-copy all then read all (one thread)", ts)

    print("\n-- sync primitives --")
    ts = []
    for _ in range(10):
        (a,) = make_fresh("4KB", 1)
        t0 = time.perf_counter()
        jax.block_until_ready(bump(a, 2.0))
        ts.append((time.perf_counter() - t0) * 1e3)
    report("dispatch + block_until_ready", ts)
    ts = []
    for _ in range(10):
        (a,) = make_fresh("4KB", 1)
        b = bump(a, 2.0)
        t0 = time.perf_counter()
        while not b.is_ready():
            time.sleep(0.0005)
        ts.append((time.perf_counter() - t0) * 1e3)
    report("dispatch + is_ready spin", ts)


if __name__ == "__main__":
    main()
