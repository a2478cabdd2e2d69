"""Measure device sort/scan primitive costs (difference method, DCE-proofed).

Grounds the sort-engine cost model: two-operand sort cost per lane at several
sizes, associative-scan cost, and the cross-backend probe latency.
Run on the real chip: python scripts/profile_sort.py [lanes_log2 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "MC_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import metacherchant_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


probe_fn = jax.jit(lambda b: (b.ravel()[123] ^ b.ravel()[45]).astype(jnp.int32))


def probe(x):
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(probe_fn(x), cpu)))


def time_chain(step, x0, m_small=4, m_big=16):
    def chain(m):
        x = x0
        t0 = time.perf_counter()
        for i in range(m):
            x = step(x, i)
        v = probe(x[0] if isinstance(x, tuple) else x)
        return time.perf_counter() - t0, v

    chain(2)  # warm
    ts, _ = chain(m_small)
    tb, v = chain(m_big)
    per = (tb - ts) / (m_big - m_small)
    return per, v


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20, 21, 22, 23]
    rng = np.random.default_rng(0)

    # probe latency
    z = jnp.zeros((128,), jnp.int64)
    t0 = time.perf_counter()
    for _ in range(3):
        probe(z)
    log(f"probe latency ~{(time.perf_counter() - t0) / 3 * 1000:.1f} ms")

    for lg in sizes:
        n = 1 << lg
        keys = jnp.asarray(rng.integers(0, 1 << 62, size=n, dtype=np.int64))
        vals = jnp.asarray(rng.integers(0, 1000, size=n, dtype=np.int32))

        @jax.jit
        def sort2(state, i):
            k, v = state
            k2, v2 = jax.lax.sort((k ^ i, v), num_keys=1)
            return (k2, v2)

        per, _ = time_chain(lambda st, i: sort2(st, i), (keys, vals))
        log(f"two-op sort  2^{lg} ({n / 1e6:.1f}M lanes): "
            f"{per * 1000:7.1f} ms  ({per / n * 1e9:5.2f} ns/lane)")

        @jax.jit
        def sort1(k, i):
            return jax.lax.sort(k ^ i)

        per, _ = time_chain(lambda k, i: sort1(k, i), keys)
        log(f"one-op sort  2^{lg}: {per * 1000:7.1f} ms  "
            f"({per / n * 1e9:5.2f} ns/lane)")

        @jax.jit
        def segscan(state, i):
            k, v = state

            def seg_add(a, b):
                af, asum = a
                bf, bsum = b
                return af | bf, jnp.where(bf, bsum, asum + bsum)

            first = jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
            _, rs = jax.lax.associative_scan(
                seg_add, (first, (v + i).astype(jnp.int64)))
            return (k, rs.astype(jnp.int32))

        per, _ = time_chain(lambda st, i: segscan(st, i), (keys, vals))
        log(f"seg-scan     2^{lg}: {per * 1000:7.1f} ms  "
            f"({per / n * 1e9:5.2f} ns/lane)")
    print("{}")


if __name__ == "__main__":
    main()
