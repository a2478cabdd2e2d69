"""Benchmark: k-mer processing throughput on the real TPU chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Primary measurement: the fused count-insert pipeline (extract + dedup +
open-addressing insert, ops/hashtable.py) via the difference method:
    T(M) = enqueue M dependent steps + one tiny forced readback
for small and large M on identical fresh state; readback latency and compile
time cancel in the difference. (This rig's tunneled device has broken
block_until_ready and minutes-scale direct readbacks; a cross-backend
device_put of a scalar is the only reliable completion signal. Remote kernel
compiles intermittently take tens of minutes.)

Fallback: if the primary measurement does not complete within its time
budget, measure canonical k-mer EXTRACTION throughput (the per-base hot loop;
its kernels compile in seconds) and report that metric instead -- clearly
labeled.

vs_baseline is anchored to EST_JAVA_RATE, an estimate of the reference's
multithreaded JVM counting throughput (striped hash map insert hot loop,
itmo:structures/map/Long2ShortHashMap.java addAndBound; ~40M canonical
k-mers/s on a 32-core host). The reference publishes no numbers (BASELINE.md).
"""
import json
import os
import signal
import sys
import time

import numpy as np

# JAX_COMPILATION_CACHE_DIR is ignored under the tunneled-TPU plugin; the
# package init applies MC_JAX_CACHE through jax.config.update, which works.
os.environ.setdefault("MC_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

# Real device: do NOT force cpu here (the session platform is the tunneled TPU).
import metacherchant_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import _count_insert_kernel, EMPTY
from metacherchant_tpu.ops.kmers import exact_canonical_kmers

EST_JAVA_RATE = 4.0e7  # est. reference JVM k-mers/s (see module docstring)

K = 31
BATCH = int(os.environ.get("MC_BENCH_BATCH", "4096"))
LEN = 256
TABLE_LOG2 = 24
M_SMALL = int(os.environ.get("MC_BENCH_MSMALL", "2"))
M_BIG = int(os.environ.get("MC_BENCH_MBIG", "42"))
PRIMARY_BUDGET_S = int(os.environ.get("MC_BENCH_BUDGET", "780"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_probe_fn = jax.jit(lambda b: (b.ravel()[123] ^ b.ravel()[456]).astype(jnp.int32))


def _probe(x) -> int:
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(_probe_fn(x), cpu)))


def _emit(metric: str, rate: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / EST_JAVA_RATE, 3),
    }))
    sys.stdout.flush()


def make_batches(n):
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=4_000_000).astype(np.int8)
    window = np.arange(LEN)
    return [
        jnp.asarray(genome[rng.integers(0, genome.size - LEN, size=BATCH)[:, None]
                           + window[None, :]].astype(np.int32))
        for _ in range(n)
    ]


def primary(batches) -> float:
    def run_chain(m: int) -> float:
        tk = jnp.full((1 << TABLE_LOG2,), EMPTY, jnp.int64)
        tc = jnp.zeros((1 << TABLE_LOG2,), jnp.int32)
        t0 = time.perf_counter()
        for i in range(m):
            tk, tc, new, _ = _count_insert_kernel(tk, tc, batches[i], K, None)
        v = _probe(tk)
        dt = time.perf_counter() - t0
        log(f"chain m={m}: {dt:.1f}s (probe={v})")
        return dt

    run_chain(1)
    log("compile warm")
    t_small = run_chain(M_SMALL)
    t_big = run_chain(M_BIG)
    per_step = max(t_big - t_small, 1e-9) / (M_BIG - M_SMALL)
    log(f"count per-step {per_step:.3f}s")
    return BATCH * (LEN - K + 1) / per_step


def fallback_extraction(batches) -> float:
    def chain(m: int) -> float:
        x = batches[0]
        keys = None
        t0 = time.perf_counter()
        for i in range(m):
            keys, _ = exact_canonical_kmers(x, K)
            x = batches[(i + 1) % len(batches)] ^ (keys[:1, :1] & 0).astype(jnp.int32)
        v = _probe(keys)
        dt = time.perf_counter() - t0
        log(f"extract chain m={m}: {dt:.1f}s (probe={v})")
        return dt

    chain(1)
    t_small = chain(M_SMALL)
    t_big = chain(M_BIG)
    per_step = max(t_big - t_small, 1e-9) / (M_BIG - M_SMALL)
    log(f"extract per-step {per_step * 1000:.1f}ms")
    return BATCH * (LEN - K + 1) / per_step


class _Budget(Exception):
    pass


def main() -> None:
    batches = make_batches(M_BIG)
    log(f"{len(batches)} batches on device")

    def on_alarm(signum, frame):
        raise _Budget()

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(PRIMARY_BUDGET_S)
    try:
        rate = primary(batches)
        signal.alarm(0)
        _emit("kmer_count_throughput", rate)
        return
    except _Budget:
        log(f"primary exceeded {PRIMARY_BUDGET_S}s budget "
            "(remote-compile stall); falling back to extraction metric")
    except Exception as e:  # compile-service failures etc.
        signal.alarm(0)
        log(f"primary failed: {type(e).__name__}: {str(e)[:200]}")
    signal.alarm(0)
    _emit("kmer_extract_throughput", fallback_extraction(batches))


if __name__ == "__main__":
    sys.exit(main() or 0)
