"""On-chip measurement of the multi-batch fused append (MC_COUNT_ENGINE=chunk).

VERDICT r4 #2: ~8 ms of the 20.3 ms best-case per-step counting cost was
extract+append+dispatch while extraction compute alone is ~0.3 ms -- mostly
per-dispatch overhead at batch 8192. ChunkedStreamCounter fuses NB batches
per dispatch (ops/sortcount._append_multi_kernel); this script measures the
per-step saving at the primary bench geometry with device-staged chunks and
the same paired-difference estimator the primary phase uses.

Usage: timeout 1100 python scripts/profile_chunk_count.py
"""
import json
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

from metacherchant_tpu.ops.sortcount import (
    StreamCounter, _append_multi_kernel, fast_scalar)

K = 31
LEN = 256
BATCH = 8192
BUF = (1 << 24) - (1 << 21)
STORE = 1 << 21
GENOME = 1_500_000
# appended lanes per batch AFTER the r5 k-1 column trim == real windows;
# the round-5 recorded measurement predates the trim and used B*L lanes
# (its BENCH_NOTES rate was correctly normalized to real windows by hand)
KEYS_PER_BATCH = BATCH * (LEN - K + 1)
NB = BUF // KEYS_PER_BATCH          # fused batches per dispatch
M_SMALL = 2                          # chunks
M_BIG = 16                           # chunks


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=GENOME).astype(np.int8)
    window = np.arange(LEN)
    chunks = []
    for _ in range(M_BIG):
        c = np.stack([
            g[rng.integers(0, g.size - LEN, size=BATCH)[:, None]
              + window[None, :]].astype(np.int32)
            for _ in range(NB)])
        chunks.append(jnp.asarray(c))
    jax.block_until_ready(chunks[-1])
    log(f"{M_BIG} chunks of {NB}x{BATCH}x{LEN} staged on device "
        f"({NB * KEYS_PER_BATCH} keys/chunk)")

    probe_fn = jax.jit(
        lambda b: (b.ravel()[123] ^ b.ravel()[456]).astype(jnp.int32))

    def probe(x):
        cpu = jax.devices("cpu")[0]
        return int(np.asarray(jax.device_put(probe_fn(x), cpu)))

    def run_chain(m):
        sc = StreamCounter(buffer_cap=BUF, store_cap=STORE)
        t0 = time.perf_counter()
        for i in range(m):
            if sc._offset_host + NB * KEYS_PER_BATCH > sc.buffer_cap:
                sc._consolidate()
            sc.buf, sc.offset = _append_multi_kernel(
                sc.buf, sc.offset, chunks[i], K, None)
            sc._offset_host += NB * KEYS_PER_BATCH
        sc._consolidate()
        v = probe(sc.store_keys)
        dt = time.perf_counter() - t0
        log(f"chunk chain m={m}: {dt:.2f}s (probe={v}, live={sc._live})")
        return dt

    t_warm = run_chain(2)
    log(f"warm (incl compile): {t_warm:.1f}s")
    diffs = []
    for _ in range(3):
        t_small = run_chain(M_SMALL)
        t_big = run_chain(M_BIG)
        diffs.append(t_big - t_small)
        log(f"pair diff {diffs[-1]:.2f}s")
    diff = min(diffs)
    steps = (M_BIG - M_SMALL) * NB
    per_step = diff / steps
    rate = KEYS_PER_BATCH / per_step
    log(f"per-step {per_step * 1000:.2f}ms -> {rate / 1e6:.1f} M kmers/s")
    print(json.dumps({
        "metric": "kmer_count_throughput_chunk_engine",
        "value": round(rate, 1), "unit": "kmers/s/chip",
        "vs_baseline": round(rate / 4e7, 3),
        "per_step_ms": round(per_step * 1000, 2),
        "fused_batches_per_dispatch": NB}))


if __name__ == "__main__":
    main()
