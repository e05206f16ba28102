"""Microbenchmark the tunnel's fetch behavior.

Questions:
 1. Does Array.copy_to_host_async exist / help on this backend?
 2. Fetch latency as a function of host-side delay after dispatch
    (does the fetch complete fast once device work has finished?)
 3. Cost of fetching K results at once vs one-by-one.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    @jax.jit
    def work(x, n):
        # ~match+pnp-sized computation: a few ms of MXU work.
        def body(c, _):
            c = jnp.tanh(c @ x)
            return c, None
        y, _ = jax.lax.scan(body, x, None, length=8)
        return jnp.sum(y) + n

    x = jax.device_put(np.random.rand(1024, 1024).astype(np.float32))
    # warm
    r = work(x, 0.0)
    print("has copy_to_host_async:", hasattr(r, "copy_to_host_async"))
    np.asarray(r)

    # devicework duration
    t0 = time.perf_counter()
    for i in range(5):
        r = work(x, float(i))
    r.block_until_ready()
    print(f"device work per call: {(time.perf_counter()-t0)/5*1000:.2f} ms")

    for use_async in (False, True):
        for delay_ms in (0, 5, 15, 30, 60):
            ts = []
            for i in range(10):
                r = work(x, float(i))
                if use_async:
                    try:
                        r.copy_to_host_async()
                    except AttributeError:
                        pass
                time.sleep(delay_ms / 1000)
                t0 = time.perf_counter()
                np.asarray(r)
                ts.append(time.perf_counter() - t0)
            print(
                f"async={int(use_async)} delay={delay_ms:3d}ms -> fetch wait "
                f"median {sorted(ts)[len(ts)//2]*1000:7.2f} ms  min {min(ts)*1000:7.2f}"
            )

    # chained dispatches then one fetch at the end
    for chain in (1, 4, 8):
        ts = []
        for i in range(10):
            r = work(x, float(i))
            for _ in range(chain - 1):
                r = work(x, r)
            t0 = time.perf_counter()
            np.asarray(r)
            ts.append(time.perf_counter() - t0)
        print(f"chain={chain}: final fetch median {sorted(ts)[len(ts)//2]*1000:7.2f} ms")

    # many small fetches vs stacked fetch
    rs = [work(x, float(i)) for i in range(8)]
    for r in rs:
        np.asarray(r)  # ensure done
    t0 = time.perf_counter()
    for r in rs:
        np.asarray(r)
    print(f"8 separate completed fetches: {(time.perf_counter()-t0)*1000:.2f} ms")


if __name__ == "__main__":
    main()
