"""Benchmark: k-mer counting throughput on the real TPU chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

The reference publishes no performance numbers (BASELINE.md): vs_baseline is
computed against EST_JAVA_RATE, an estimate of the reference's multithreaded
JVM counting throughput (striped hash map insert path, ~40M canonical
k-mers/s on a 32-core host -- itmo:structures/map/Long2ShortHashMap.java
addAndBound hot loop). This anchors the ratio until a measured Java baseline
exists.

Environment notes: the session TPU is reached through a tunnel with slow
device->host readback (~0.4 MB/s measured) and slow remote compiles; the
bench therefore avoids ALL d2h transfers in the timed region and keeps one
compiled shape.
"""
import json
import sys
import time

import numpy as np

# Real device: do NOT force cpu here (the session platform is the tunneled TPU).
import metacherchant_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import DeviceHashTable

EST_JAVA_RATE = 4.0e7  # est. reference JVM k-mers/s (see module docstring)

K = 31
BATCH = 4096
LEN = 256
STEPS = 10
WARMUP = 3
TABLE_LOG2 = 24  # 16M slots; ~4M distinct keys => load 0.25, no growth


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    rng = np.random.default_rng(0)
    # synthetic metagenome: reads sampled from a 4Mbp genome => realistic
    # duplicate/distinct key mix for the insert path
    genome = rng.integers(0, 4, size=4_000_000).astype(np.int8)
    starts = rng.integers(0, genome.size - LEN, size=(STEPS + WARMUP, BATCH))
    window = np.arange(LEN)
    batches = [jnp.asarray(genome[s[:, None] + window[None, :]].astype(np.int32))
               for s in starts]
    kmers_per_batch = BATCH * (LEN - K + 1)

    table = DeviceHashTable(capacity_log2=TABLE_LOG2)
    t0 = time.perf_counter()
    for i in range(WARMUP):
        table.count_insert_codes(batches[i], K, None)
    jax.block_until_ready(table.tkeys)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + STEPS):
        table.count_insert_codes(batches[i], K, None)
    jax.block_until_ready(table.tkeys)
    dt = time.perf_counter() - t0
    rate = STEPS * kmers_per_batch / dt
    log(f"steady state: {dt:.3f}s for {STEPS} batches")

    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / EST_JAVA_RATE, 3),
    }))


if __name__ == "__main__":
    main()
