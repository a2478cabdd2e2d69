"""Benchmark: k-mer counting throughput on the real TPU chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Primary measurement: the DEFAULT counting engine (ops/sortcount.StreamCounter:
fused canonical extraction -> contiguous append -> sort-based gather-free RLE
consolidation) end-to-end via the difference method:
    T(m_big) - T(m_small) over identical fresh state, where each run ends
    with a final consolidation and one tiny cross-backend probe readback.
Compile time and probe latency cancel in the difference.

Orchestration: with no --phase argument this script is a thin stdlib-only
parent that runs each measurement phase as a KILLABLE SUBPROCESS under a hard
wall budget. This rig's remote compile service can hang indefinitely on large
fused sort graphs (BENCH_NOTES.md "rig pathologies" #3), and an in-process
SIGALRM cannot interrupt a native compile RPC -- a kill -9 from the parent
can. Phase ladder (first phase to emit a JSON line wins):
  1. primary, default geometry (buffer 2^22 keys, store 2^21 distinct)
  2. primary, small geometry (2^20/2^20: ~3x fewer sort lanes)
  3. primary, tiny geometry (2^19/2^19, batch 2048: 1M-lane sorts, the scale
     this rig's compile service demonstrably handles in ~2 min cold)
  4. extract+dedup chain (1M-lane kernels, compiles in ~2 min)
  5. extraction-only chain
All phases are DCE-proofed (full-tensor folds / final consolidation + a tiny
cross-backend probe feed the timed chain).

vs_baseline is anchored to EST_JAVA_RATE, an estimate of the reference's
multithreaded JVM counting throughput (striped hash map insert hot loop,
itmo:structures/map/Long2ShortHashMap.java addAndBound; ~40M canonical
k-mers/s on a 32-core host). The reference publishes no numbers (BASELINE.md).
"""
import json
import os
import subprocess
import sys
import time

EST_JAVA_RATE = 4.0e7  # est. reference JVM k-mers/s (see module docstring)

K = 31
LEN = 256
GENOME = int(os.environ.get("MC_BENCH_GENOME", "1500000"))
M_SMALL = int(os.environ.get("MC_BENCH_MSMALL", "16"))
M_BIG = int(os.environ.get("MC_BENCH_MBIG", "48"))

# geometry ladder: (batch, buf_log2, store_log2, genome_cap). Each batch
# appends batch*(LEN-K+1) keys, which must fit the append buffer.
GEOMETRY = {
    "default": (4096, 22, 21, None),    # 925696 keys/step, 6M-lane sorts
    "small":   (4096, 20, 20, 600000),  # 925696 keys/step, 2M-lane sorts
    "tiny":    (2048, 19, 19, 400000),  # 462848 keys/step, 1M-lane sorts --
                                        # the scale this rig's remote compile
                                        # service handles in ~2 min cold
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Parent orchestrator (stdlib only -- must NOT touch the TPU)
# ---------------------------------------------------------------------------

def parent() -> int:
    me = os.path.abspath(__file__)
    plan = [
        (["--phase", "primary"],
         int(os.environ.get("MC_BENCH_BUDGET", "300"))),
        (["--phase", "primary", "--geom", "small"], 480),
        (["--phase", "primary", "--geom", "tiny"], 420),
        (["--phase", "dedup"], 300),
        (["--phase", "extract"], 240),
    ]
    for extra, budget in plan:
        log(f"bench phase {' '.join(extra)} (budget {budget}s)")
        proc = subprocess.Popen([sys.executable, me] + extra,
                                stdout=subprocess.PIPE, stderr=sys.stderr,
                                text=True)
        try:
            out, _ = proc.communicate(timeout=budget)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            log("phase exceeded budget (hung remote compile?); killed")
            time.sleep(5)  # let the tunneled TPU client slot free up
            continue
        line = next((ln for ln in (out or "").splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            sys.stdout.flush()
            return 0
        log(f"phase failed (rc={proc.returncode})")
    print(json.dumps({"metric": "kmer_count_throughput", "value": 0.0,
                      "unit": "kmers/s/chip", "vs_baseline": 0.0,
                      "error": "all phases failed"}))
    return 0


# ---------------------------------------------------------------------------
# Measurement phases (one TPU client per process)
# ---------------------------------------------------------------------------

def _emit(metric: str, rate: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / EST_JAVA_RATE, 3),
    }))
    sys.stdout.flush()


def phase_main(which: str, geom: str) -> None:
    # JAX_COMPILATION_CACHE_DIR is ignored under the tunneled-TPU plugin; the
    # package init applies MC_JAX_CACHE through jax.config.update, which works.
    os.environ.setdefault(
        "MC_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    # Real device: do NOT force cpu (the session platform is the tunneled TPU).
    import numpy as np
    import metacherchant_tpu  # noqa: F401  (x64, cache config)
    import jax
    import jax.numpy as jnp
    from metacherchant_tpu.ops.kmers import canonical_kmers
    from metacherchant_tpu.ops.hashtable import _batch_unique_impl
    from metacherchant_tpu.ops.sortcount import StreamCounter

    g_batch, g_buf, g_store, g_cap = GEOMETRY[geom]
    batch = int(os.environ.get("MC_BENCH_BATCH", str(g_batch)))
    keys_per_step = batch * (LEN - K + 1)
    buf_log2 = int(os.environ.get("MC_BENCH_BUF", str(g_buf)))
    store_log2 = int(os.environ.get("MC_BENCH_STORE", str(g_store)))
    genome = GENOME if g_cap is None else min(GENOME, g_cap)

    probe_fn = jax.jit(
        lambda b: (b.ravel()[123] ^ b.ravel()[456]).astype(jnp.int32))

    def probe(x) -> int:
        cpu = jax.devices("cpu")[0]
        return int(np.asarray(jax.device_put(probe_fn(x), cpu)))

    def make_batches(n):
        rng = np.random.default_rng(0)
        g = rng.integers(0, 4, size=genome).astype(np.int8)
        window = np.arange(LEN)
        return [
            jnp.asarray(g[rng.integers(0, g.size - LEN, size=batch)[:, None]
                          + window[None, :]].astype(np.int32))
            for _ in range(n)
        ]

    batches = make_batches(M_BIG)
    log(f"{len(batches)} batches on device ({keys_per_step} keys/step, "
        f"buf 2^{buf_log2}, store 2^{store_log2})")

    if which == "primary":
        def run_chain(m: int) -> float:
            sc = StreamCounter(buffer_cap_log2=buf_log2,
                               store_cap_log2=store_log2)
            t0 = time.perf_counter()
            for i in range(m):
                sc.add_codes(batches[i], K, None)
            sc._consolidate()
            v = probe(sc.store_keys)
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
            _emit("kmer_count_throughput", M_BIG * keys_per_step / t_big)
            return
        per_step = diff / (M_BIG - M_SMALL)
        log(f"count per-step {per_step * 1000:.1f}ms")
        _emit("kmer_count_throughput", keys_per_step / per_step)
        return

    def _fold(x, width=128):
        f = x.ravel().astype(jnp.int64)
        n = (f.shape[0] // width) * width
        return f[:n].reshape(-1, width).sum(axis=0) + f[n:].sum()

    @jax.jit
    def step_dedup(carry, codes):
        keys, _ = canonical_kmers(codes, K, None)
        uk, uc = _batch_unique_impl(keys.ravel())
        return carry + _fold(uk) + _fold(uc)

    @jax.jit
    def step_extract(carry, codes):
        keys, _ = canonical_kmers(codes, K, None)
        return carry + _fold(keys)

    step = step_dedup if which == "dedup" else step_extract

    def chain(m: int) -> float:
        carry = jnp.zeros((128,), jnp.int64)
        t0 = time.perf_counter()
        for i in range(m):
            carry = step(carry, batches[i])
        v = probe(carry)
        dt = time.perf_counter() - t0
        log(f"{which} chain m={m}: {dt:.2f}s (probe={v})")
        return dt

    chain(1)
    t_small = chain(M_SMALL)
    t_big = chain(M_BIG)
    per_step = max(t_big - t_small, 1e-9) / (M_BIG - M_SMALL)
    log(f"{which} per-step {per_step * 1000:.1f}ms")
    _emit(f"kmer_{which}_throughput", keys_per_step / per_step)


def main() -> int:
    if "--phase" in sys.argv:
        which = sys.argv[sys.argv.index("--phase") + 1]
        geom = (sys.argv[sys.argv.index("--geom") + 1]
                if "--geom" in sys.argv else "default")
        phase_main(which, geom)
        return 0
    return parent()


if __name__ == "__main__":
    sys.exit(main())
