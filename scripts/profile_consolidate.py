"""Compile+run timing of the StreamCounter consolidation kernel per geometry.

Usage: python scripts/profile_consolidate.py <store_log2> <buf_log2>
Prints phases immediately (no buffering) so progress is visible in a log.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MC_JAX_CACHE", "/root/repo/.jax_cache")

import numpy as np
import metacherchant_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.sortcount import _consolidate_kernel, fast_scalar
from metacherchant_tpu.ops.kmers import SENTINEL


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    store_log2, buf_log2 = int(sys.argv[1]), int(sys.argv[2])
    S, B = 1 << store_log2, 1 << buf_log2
    log(f"geometry store=2^{store_log2} buf=2^{buf_log2} "
        f"({(S + B) / 1e6:.1f}M lanes); device={jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    sk = jnp.full((S,), SENTINEL, jnp.int64)
    sc = jnp.zeros((S,), jnp.int32)
    buf = jnp.asarray(rng.integers(0, 1 << 40, size=B).astype(np.int64))
    off = jnp.int32(B)

    t0 = time.perf_counter()
    sk, sc, nd, ovf = _consolidate_kernel(sk, sc, buf, off)
    n = fast_scalar(nd)
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s, live={n}")

    for rep in range(3):
        buf2 = jnp.asarray(rng.integers(0, 1 << 40, size=B).astype(np.int64))
        t0 = time.perf_counter()
        sk, sc, nd, ovf = _consolidate_kernel(sk, sc, buf2, jnp.int32(B))
        n = fast_scalar(nd)
        dt = time.perf_counter() - t0
        log(f"steady call {rep}: {dt * 1000:.0f}ms, live={n} "
            f"-> {B / dt / 1e6:.0f} M keys/s")


if __name__ == "__main__":
    main()
