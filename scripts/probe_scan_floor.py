"""Discriminate: per-scan-iteration overhead vs bad-layout compute cost.

Benches (all inside ONE jit, 50 reps):
  1. scan of a trivial (8,128) elementwise body
  2. scan of a planar-style mock BA matvec body (all (d,N) planes, N minor)
  3. same mock body unrolled (Python loop) instead of scan
  4. scan of the CURRENT bad-layout style: (O,2,6) einsum body
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 50


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    N = 16384
    K = 64
    key = jax.random.PRNGKey(0)
    Jc = jax.random.normal(key, (12, N), jnp.float32)
    Jp = jax.random.normal(key, (6, N), jnp.float32)
    w = jax.random.normal(key, (N,), jnp.float32)
    C_T = (
        (jax.random.randint(key, (N,), 0, K)[None, :] == jnp.arange(K)[:, None])
        .astype(jnp.float32)
    )  # (K,N) one-hot
    Vi = jax.random.normal(key, (3, 3, N // 16), jnp.float32) * 0.01
    O = 32768
    Jc_bad = jax.random.normal(key, (O, 2, 6), jnp.float32)
    x0 = jnp.zeros((K, 6), jnp.float32)

    def planar_matvec(x):
        # xg (6,N) = x^T @ C_T
        xg = jnp.einsum("kd,kn->dn", x, C_T)
        Jc_x0 = sum(Jc[i] * xg[i] for i in range(6))
        Jc_x1 = sum(Jc[6 + i] * xg[i] for i in range(6))
        a = jnp.stack([w * (Jp[j] * Jc_x0 + Jp[3 + j] * Jc_x1) for j in range(3)])
        b = a.reshape(3, N // 16, 16).sum(-1)  # (3,P)
        c = jnp.einsum("ijp,jp->ip", Vi, b)
        cb = jnp.repeat(c, 16, axis=-1)  # broadcast back (3,N) -- via reshape
        cb = jnp.broadcast_to(c[:, :, None], (3, N // 16, 16)).reshape(3, N)
        Jp_c0 = sum(Jp[j] * cb[j] for j in range(3))
        Jp_c1 = sum(Jp[3 + j] * cb[j] for j in range(3))
        d = jnp.stack([w * (Jc[i] * Jp_c0 + Jc[6 + i] * Jp_c1) for i in range(6)])
        y = jnp.einsum("dn,kn->kd", d, C_T)
        return x + 1e-6 * y

    def bench(name, fn, x0, reps=REPS):
        @jax.jit
        def run(x):
            return fn(x)

        out = run(x0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1000 / reps
        print(f"{name:40s}: {dt:8.4f} ms/rep", flush=True)

    def scanned(body, reps=REPS):
        def fn(x):
            def f(c, _):
                return body(c), None
            out, _ = jax.lax.scan(f, x, None, length=reps)
            return out
        return fn

    def unrolled(body, reps=REPS):
        def fn(x):
            for _ in range(reps):
                x = body(x)
            return x
        return fn

    tiny = jnp.ones((8, 128), jnp.float32)
    bench("scan tiny elementwise", scanned(lambda c: c * 1.0001 + 0.001), tiny)
    bench("scan planar mock matvec", scanned(planar_matvec), x0)
    bench("unrolled planar mock matvec", unrolled(planar_matvec), x0)

    def bad_body(c):
        u = jnp.einsum("oik,oil->okl", Jc_bad * c[0, 0, 0], Jc_bad)
        return c + 1e-9 * u[:1]

    bench("scan bad-layout einsum (O,2,6)", scanned(bad_body, 10), Jc_bad[:1], reps=10)


if __name__ == "__main__":
    main()
