"""Probe: does a BARE (un-fused) lax.sort compile and run at 2^21..2^24 lanes
on this rig? The round-2 compile hangs were on large fused graphs
(sort + RLE + compaction in one jit); if a standalone sort is fine, the
counting engine can use sort-based merges in small jit units instead of
hand-rolled bitonic stages.

Usage: python scripts/profile_bare_sort.py [log2_lanes] [pairs]
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


def probe(x) -> int:
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(x.ravel()[123].astype(jnp.int32), cpu)))


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    pairs = len(sys.argv) > 2 and sys.argv[2] == "pairs"
    n = 1 << lg
    rng = np.random.default_rng(0)
    keys = [jnp.asarray(rng.integers(0, 1 << 62, size=n).astype(np.int64))
            for _ in range(2)]
    cnts = jnp.asarray(rng.integers(1, 100, size=n).astype(np.int32))

    if pairs:
        f = jax.jit(lambda k, c: jax.lax.sort((k, c), num_keys=1))
        t0 = time.perf_counter()
        out = f(keys[0], cnts)
        v = probe(out[0])
        log(f"sort2(2^{lg}) cold: {time.perf_counter() - t0:.2f}s (probe={v})")

        def chain(m):
            t0 = time.perf_counter()
            k, c = keys[0], cnts
            for _ in range(m):
                k, c = f(k, c)
            v = probe(k)
            dt = time.perf_counter() - t0
            log(f"  chain m={m}: {dt:.3f}s")
            return dt
    else:
        f = jax.jit(jax.lax.sort)
        t0 = time.perf_counter()
        out = f(keys[0])
        v = probe(out)
        log(f"sort(2^{lg}) cold: {time.perf_counter() - t0:.2f}s (probe={v})")

        def chain(m):
            t0 = time.perf_counter()
            k = keys[0]
            for i in range(m):
                k = f(k ^ keys[i % 2][0])  # cheap perturb, keeps sort live
            v = probe(k)
            dt = time.perf_counter() - t0
            log(f"  chain m={m}: {dt:.3f}s")
            return dt

    ts, tb = chain(4), chain(12)
    per = (tb - ts) / 8
    log(f"sort{'2' if pairs else ''}(2^{lg}): {per * 1000:.2f} ms/op "
        f"({n / per / 1e6:.0f} M lanes/s)")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
