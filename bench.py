"""Benchmark: k-mer counting throughput on the real TPU chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Measurement methodology (this rig's tunneled device has broken
block_until_ready -- it returns before execution -- and a very expensive
device->host readback of ~30-100s fixed latency): we time
    T(M) = enqueue M dependent count-insert steps + one scalar readback
for a small and a large M on identically fresh tables. The readback latency
and compile time cancel in the difference, leaving pure per-step device time:
    per_step = (T(M2) - T(M1)) / (M2 - M1).

vs_baseline is computed against EST_JAVA_RATE, an estimate of the reference's
multithreaded JVM counting throughput (striped hash map insert hot loop,
itmo:structures/map/Long2ShortHashMap.java addAndBound; ~40M canonical
k-mers/s on a 32-core host). The reference publishes no numbers (BASELINE.md).
"""
import json
import sys
import time

import numpy as np

# Real device: do NOT force cpu here (the session platform is the tunneled TPU).
import metacherchant_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import _count_insert_kernel, EMPTY

EST_JAVA_RATE = 4.0e7  # est. reference JVM k-mers/s (see module docstring)

K = 31
BATCH = 4096
LEN = 256
TABLE_LOG2 = 24  # 16M slots; ~4M distinct keys => low load, no growth
M_SMALL = 2
M_BIG = 42


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Tiny-output probe in its OWN executable, fetched via a cross-backend
# device_put to the host CPU backend: the direct d2h readback path on this rig
# costs minutes even for 8 bytes, while the cross-backend copy of a small
# array completes in ~14s.
_probe_fn = jax.jit(lambda tk: (tk[123] ^ tk[456]).astype(jnp.int32))


def _probe(tk) -> int:
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(_probe_fn(tk), cpu)))


def run_chain(batches, m: int) -> float:
    """Enqueue m dependent steps on a fresh table + one tiny forced readback."""
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

    # warm the compile cache so both timed chains are compile-free
    tk = jnp.full((1 << TABLE_LOG2,), EMPTY, jnp.int64)
    tc = jnp.zeros((1 << TABLE_LOG2,), jnp.int32)
    tk, tc, new, _ = _count_insert_kernel(tk, tc, batches[0], K, None)
    _probe(tk)
    del tk, tc
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
