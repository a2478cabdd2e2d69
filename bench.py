"""Benchmark: k-mer counting throughput on the real TPU chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Primary measurement: the DEFAULT counting engine (ops/sortcount.StreamCounter:
fused canonical extraction -> contiguous append -> sort-based gather-free RLE
consolidation) end-to-end via the difference method:
    T(m_big) - T(m_small) over identical fresh state, where each run ends
    with a final consolidation and one tiny cross-backend probe readback.
Compile time and probe latency cancel in the difference. Geometry (buffer
2^22 keys, store 2^21 distinct) is chosen for compile tractability on this
rig's remote-compile service (kernel compile cost grows superlinearly with
sort lane count; see BENCH_NOTES.md) -- the per-key steady-state cost is
within ~20% of the largest geometry.

Fallbacks, in order, if the primary exceeds its budget (cold compile without
a warm persistent cache):
  1. extract+dedup chain (1M-lane kernels, compiles in ~1 min)
  2. extraction-only chain
Both are DCE-proofed (full-tensor folds feed the carried state).

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
import metacherchant_tpu  # noqa: F401  (x64, cache config)
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.kmers import canonical_kmers, SENTINEL
from metacherchant_tpu.ops.hashtable import _batch_unique_impl
from metacherchant_tpu.ops.sortcount import StreamCounter

EST_JAVA_RATE = 4.0e7  # est. reference JVM k-mers/s (see module docstring)

K = 31
BATCH = int(os.environ.get("MC_BENCH_BATCH", "4096"))
LEN = 256
KEYS_PER_STEP = BATCH * (LEN - K + 1)
BUF_LOG2 = int(os.environ.get("MC_BENCH_BUF", "22"))
STORE_LOG2 = int(os.environ.get("MC_BENCH_STORE", "21"))
GENOME = int(os.environ.get("MC_BENCH_GENOME", "1500000"))
M_SMALL = int(os.environ.get("MC_BENCH_MSMALL", "16"))
M_BIG = int(os.environ.get("MC_BENCH_MBIG", "48"))
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
    genome = rng.integers(0, 4, size=GENOME).astype(np.int8)
    window = np.arange(LEN)
    return [
        jnp.asarray(genome[rng.integers(0, genome.size - LEN, size=BATCH)[:, None]
                           + window[None, :]].astype(np.int32))
        for _ in range(n)
    ]


def primary(batches) -> float:
    """End-to-end default engine: extract -> append -> consolidate."""
    def run_chain(m: int) -> float:
        sc = StreamCounter(buffer_cap_log2=BUF_LOG2, store_cap_log2=STORE_LOG2)
        t0 = time.perf_counter()
        for i in range(m):
            sc.add_codes(batches[i], K, None)
        sc._consolidate()
        v = _probe(sc.store_keys)
        dt = time.perf_counter() - t0
        log(f"count chain m={m}: {dt:.2f}s (probe={v}, live={sc._live})")
        return dt

    run_chain(2)
    log("compile warm")
    t_small = run_chain(M_SMALL)
    t_big = run_chain(M_BIG)
    diff = t_big - t_small
    if diff < max(0.05 * t_big, 0.2):
        # difference in the noise (steps too cheap vs fixed probe cost):
        # report the conservative absolute rate of the big chain instead
        log(f"difference {diff:.3f}s in noise; using absolute rate")
        return M_BIG * KEYS_PER_STEP / t_big
    per_step = diff / (M_BIG - M_SMALL)
    log(f"count per-step {per_step * 1000:.1f}ms")
    return KEYS_PER_STEP / per_step


def _fold(x, width=128):
    f = x.ravel().astype(jnp.int64)
    n = (f.shape[0] // width) * width
    return f[:n].reshape(-1, width).sum(axis=0) + f[n:].sum()


@jax.jit
def _step_dedup(carry, codes):
    keys, _ = canonical_kmers(codes, K, None)
    uk, uc = _batch_unique_impl(keys.ravel())
    return carry + _fold(uk) + _fold(uc)


@jax.jit
def _step_extract(carry, codes):
    keys, _ = canonical_kmers(codes, K, None)
    return carry + _fold(keys)


def fallback_chain(batches, step, name) -> float:
    def chain(m: int) -> float:
        carry = jnp.zeros((128,), jnp.int64)
        t0 = time.perf_counter()
        for i in range(m):
            carry = step(carry, batches[i])
        v = _probe(carry)
        dt = time.perf_counter() - t0
        log(f"{name} chain m={m}: {dt:.2f}s (probe={v})")
        return dt

    chain(1)
    t_small = chain(M_SMALL)
    t_big = chain(M_BIG)
    per_step = max(t_big - t_small, 1e-9) / (M_BIG - M_SMALL)
    log(f"{name} per-step {per_step * 1000:.1f}ms")
    return KEYS_PER_STEP / per_step


class _Budget(Exception):
    pass


def main() -> None:
    batches = make_batches(M_BIG)
    log(f"{len(batches)} batches on device "
        f"({KEYS_PER_STEP} keys/step, buf 2^{BUF_LOG2}, store 2^{STORE_LOG2})")

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
            "(cold remote compile); falling back to dedup-chain metric")
    except Exception as e:  # compile-service failures etc.
        signal.alarm(0)
        log(f"primary failed: {type(e).__name__}: {str(e)[:200]}")
    signal.alarm(0)

    signal.alarm(PRIMARY_BUDGET_S)
    try:
        rate = fallback_chain(batches, _step_dedup, "dedup")
        signal.alarm(0)
        _emit("kmer_dedup_throughput", rate)
        return
    except _Budget:
        log("dedup fallback exceeded budget; falling back to extraction")
    except Exception as e:
        signal.alarm(0)
        log(f"dedup fallback failed: {type(e).__name__}: {str(e)[:200]}")
    signal.alarm(0)
    _emit("kmer_extract_throughput", fallback_chain(batches, _step_extract,
                                                    "extract"))


if __name__ == "__main__":
    sys.exit(main() or 0)
