"""Profile the MergeCounter engine on the real chip (difference method).

Measures, with the persistent compile cache active:
  1. per-batch sorted-run kernel (1-op 2^20 sort)
  2. merge tree kernels (2^21, 2^22 1-op bitonic merges)
  3. consolidation kernel (2-op 2^23-lane merge + RLE + compaction)
  4. end-to-end MergeCounter chain rate
Run phases individually to bound compile risk:
  python scripts/profile_merge.py sort|tree|consolidate|chain
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
from metacherchant_tpu.ops.kmers import SENTINEL
from metacherchant_tpu.ops.mergecount import (
    MergeCounter, _sorted_run_kernel, _merge_runs_kernel,
    _consolidate_merge_kernel)
from metacherchant_tpu.ops.sortcount import fast_scalar

K, LEN, BATCH = 31, 256, 4096
RUN_CAP = 1 << 20


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(x) -> int:
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(x.ravel()[123].astype(jnp.int32), cpu)))


def make_batches(n, genome=1_500_000):
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=genome).astype(np.int8)
    w = np.arange(LEN)
    return [jnp.asarray(g[rng.integers(0, g.size - LEN, size=BATCH)[:, None]
                          + w[None, :]].astype(np.int32)) for _ in range(n)]


def timed(label, fn, m_small=4, m_big=16):
    def chain(m):
        t0 = time.perf_counter()
        v = fn(m)
        dt = time.perf_counter() - t0
        log(f"  {label} m={m}: {dt:.3f}s (probe={v})")
        return dt
    chain(1)
    log(f"  {label}: compile warm")
    ts, tb = chain(m_small), chain(m_big)
    per = (tb - ts) / (m_big - m_small)
    log(f"{label}: {per * 1000:.2f} ms/step")
    return per


def phase_sort():
    batches = make_batches(16)
    def fn(m):
        acc = None
        for i in range(m):
            acc = _sorted_run_kernel(batches[i % len(batches)], K, None, RUN_CAP)
        return probe(acc)
    per = timed("sorted_run(2^20)", fn)
    log(f"-> {BATCH * (LEN - K + 1) / per / 1e6:.1f} M keys/s in sort alone")


def phase_tree():
    rng = np.random.default_rng(1)
    r1 = [jnp.asarray(np.sort(rng.integers(0, 1 << 60, size=RUN_CAP)).astype(np.int64))
          for _ in range(4)]
    def fn_l1(m):
        acc = None
        for i in range(m):
            acc = _merge_runs_kernel(r1[i % 2], r1[2 + i % 2])
        return probe(acc)
    per1 = timed("merge(2^20+2^20)", fn_l1)
    m0 = _merge_runs_kernel(r1[0], r1[1])
    m1 = _merge_runs_kernel(r1[2], r1[3])
    def fn_l2(m):
        acc = None
        for i in range(m):
            acc = _merge_runs_kernel(m0, m1)
        return probe(acc)
    per2 = timed("merge(2^21+2^21)", fn_l2)
    log(f"-> tree cost per consolidation ~ {(2 * per1 + per2) * 1000:.2f} ms")


def phase_consolidate():
    rng = np.random.default_rng(2)
    store_cap = 1 << 22
    sk = np.full(store_cap, SENTINEL, np.int64)
    u = np.unique(rng.integers(0, 1 << 60, size=3 << 20).astype(np.int64))
    sk[: u.size] = u
    sc = np.zeros(store_cap, np.int32)
    sc[: u.size] = 1
    skj, scj = jnp.asarray(sk), jnp.asarray(sc)
    run = jnp.asarray(np.sort(rng.integers(0, 1 << 60, size=1 << 22).astype(np.int64)))
    def fn(m):
        k, c = skj, scj
        for _ in range(m):
            k, c, nd = _consolidate_merge_kernel(k, c, run)
            k, c = k[:store_cap], c[:store_cap]
        return probe(k)
    per = timed("consolidate(2^23)", fn, m_small=2, m_big=8)
    log(f"-> consolidation per 4 steps; amortized {per / 4 * 1000:.2f} ms/step")


def phase_chain():
    batches = make_batches(48)
    def fn(m):
        mc = MergeCounter(run_cap_log2=20, runs_per_merge=4, store_cap_log2=22)
        for i in range(m):
            mc.add_codes(batches[i], K, None)
        mc._consolidate()
        mc._resolve()
        return probe(mc.store_keys)
    def chain(m):
        t0 = time.perf_counter()
        v = fn(m)
        dt = time.perf_counter() - t0
        log(f"  chain m={m}: {dt:.2f}s (probe={v})")
        return dt
    chain(2)
    log("  compile warm")
    ts, tb = chain(16), chain(48)
    per = (tb - ts) / 32
    rate = BATCH * (LEN - K + 1) / per
    log(f"chain: {per * 1000:.1f} ms/step -> {rate / 1e6:.1f} M kmers/s/chip "
        f"(vs_baseline {rate / 4e7:.2f})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "chain"
    log(f"devices: {jax.devices()}")
    {"sort": phase_sort, "tree": phase_tree,
     "consolidate": phase_consolidate, "chain": phase_chain}[which]()
