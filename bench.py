"""Benchmark: k-mer counting throughput on the real TPU chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Measures the open-addressing counting engine (ops/hashtable.py fused
extract+dedup+insert; chosen for bench reliability on this rig -- the
sort-engine's larger fused graphs hit remote-compile instability) with the
difference method:
    T(M) = enqueue M dependent count steps + one tiny forced readback
for small and large M on fresh state; readback latency and compile time cancel
in the difference (this rig's tunneled device has broken block_until_ready and
minutes-scale direct readbacks; a cross-backend device_put of a scalar costs
~2-15s and is the only reliable completion signal).

vs_baseline is computed against EST_JAVA_RATE, an estimate of the reference's
multithreaded JVM counting throughput (striped hash map insert hot loop,
itmo:structures/map/Long2ShortHashMap.java addAndBound; ~40M canonical
k-mers/s on a 32-core host). The reference publishes no numbers (BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

# Persist compiled executables across runs: remote compiles on this rig cost
# minutes each; the cache eliminates them after the first round.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Real device: do NOT force cpu here (the session platform is the tunneled TPU).
import metacherchant_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import _count_insert_kernel, EMPTY

EST_JAVA_RATE = 4.0e7  # est. reference JVM k-mers/s (see module docstring)

K = 31
BATCH = 4096
LEN = 256
TABLE_LOG2 = 24    # 16M slots; ~4M distinct genome keys => low load
M_SMALL = 2
M_BIG = 42


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_probe_fn = jax.jit(lambda b: (b[123] ^ b[456]).astype(jnp.int32))


def _probe(x) -> int:
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(_probe_fn(x), cpu)))


def run_chain(batches, m: int) -> float:
    """Enqueue m dependent count-insert steps on a fresh table + readback."""
    tk = jnp.full((1 << TABLE_LOG2,), EMPTY, jnp.int64)
    tc = jnp.zeros((1 << TABLE_LOG2,), jnp.int32)
    t0 = time.perf_counter()
    for i in range(m):
        tk, tc, new, _ = _count_insert_kernel(tk, tc, batches[i], K, None)
    v = _probe(tk)  # forced completion of the whole chain
    dt = time.perf_counter() - t0
    log(f"chain m={m}: {dt:.1f}s (probe={v})")
    return dt


def main() -> None:
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=4_000_000).astype(np.int8)
    window = np.arange(LEN)
    batches = [
        jnp.asarray(genome[rng.integers(0, genome.size - LEN, size=BATCH)[:, None]
                           + window[None, :]].astype(np.int32))
        for _ in range(M_BIG)
    ]
    kmers_per_batch = BATCH * (LEN - K + 1)

    run_chain(batches, 1)  # compile warm
    log("compile warm")

    t_small = run_chain(batches, M_SMALL)
    t_big = run_chain(batches, M_BIG)
    per_step = max(t_big - t_small, 1e-9) / (M_BIG - M_SMALL)
    rate = kmers_per_batch / per_step
    log(f"per-step {per_step:.3f}s")

    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / EST_JAVA_RATE, 3),
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
