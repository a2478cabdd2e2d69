"""Measure StreamCounter end-to-end throughput on the real chip.

Usage: python scripts/profile_stream.py BUF_LOG2 STORE_LOG2 [BATCH [MSMALL MBIG]]
Difference method; the deferred-resolve readback is the completion barrier.
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
import jax.numpy as jnp
from metacherchant_tpu.ops.sortcount import StreamCounter

K, LEN = 31, 256


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    buf_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    store_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    m_small = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    m_big = int(sys.argv[5]) if len(sys.argv) > 5 else 48
    keys_per_step = batch * (LEN - K + 1)

    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=1_500_000).astype(np.int8)
    window = np.arange(LEN)
    batches = [
        jnp.asarray(g[rng.integers(0, g.size - LEN, size=batch)[:, None]
                      + window[None, :]].astype(np.int32))
        for _ in range(m_big)
    ]
    log(f"{m_big} batches ({keys_per_step} keys/step, buf 2^{buf_log2}, "
        f"store 2^{store_log2})")

    def run_chain(m):
        sc = StreamCounter(buffer_cap_log2=buf_log2, store_cap_log2=store_log2)
        t0 = time.perf_counter()
        for i in range(m):
            sc.add_codes(batches[i], K, None)
        sc._consolidate()
        sc._resolve()
        dt = time.perf_counter() - t0
        log(f"chain m={m}: {dt:.2f}s (live={sc._live}, "
            f"store_cap=2^{int(np.log2(sc.store_cap))})")
        return dt

    t0 = time.perf_counter()
    run_chain(2)
    log(f"warm (incl compile): {time.perf_counter() - t0:.1f}s")
    t_small = run_chain(m_small)
    t_big = run_chain(m_big)
    per = (t_big - t_small) / (m_big - m_small)
    rate = keys_per_step / per
    log(f"per-step {per * 1000:.1f} ms -> {rate / 1e6:.1f} M kmers/s")
    print("{}")


if __name__ == "__main__":
    main()
