"""On-chip sweep that SETTLES the device-BFS question (VERDICT r4 #1).

Runs host C++ FIFO, the legacy probe device engine, and the new dense
adjacency-bitmap engine (ops/bfs_dense.py) on IDENTICAL dispersed-seed
radius-capped workloads at three seed scales -- including the 500K-seed
regime the old routing threshold extrapolated to but never measured:

  A. 400K-kmer map,  4 096 seeds, radius 50   (the round-4 workload)
  B. 400K-kmer map, 65 536 seeds, radius 50   (intermediate)
  C. 2M-kmer map,  500 000 seeds, radius 50   (the claimed crossover regime)

For the dense engine, build (one-time per map, amortized across per-gene
runs) and traversal are timed separately; traversal uses the two-radius
difference to cancel dispatch+readback. Each workload prints one JSON line
to stdout the moment it's measured.

Usage: timeout 1200 python scripts/profile_dense_bfs.py [A|B|C ...]
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

from metacherchant_tpu.kmer_map import KmerMap
from metacherchant_tpu.algo.environment import bfs_fifo
from metacherchant_tpu.ops.sortcount import fast_scalar, to_host

K = 31
RADIUS = 50


def log(m):
    print(m, file=sys.stderr, flush=True)


def _np_window_codes(seq_codes, k):
    win = np.lib.stride_tricks.sliding_window_view(
        seq_codes.astype(np.int64), k)
    pw = (np.int64(1) << (2 * np.arange(k - 1, -1, -1, dtype=np.int64)))
    return win @ pw


def _np_canonical(fw, k):
    rc = np.zeros_like(fw)
    tmp = fw.copy()
    for _ in range(k):
        rc = (rc << 2) | (3 - (tmp & 3))
        tmp >>= 2
    return np.minimum(fw, rc)


def stage(G, n_seeds, seed=0):
    rng = np.random.default_rng(seed)
    gcodes = rng.integers(0, 4, size=G).astype(np.int64)
    fw = _np_window_codes(gcodes, K)
    canon = _np_canonical(fw, K)
    ukeys = np.unique(canon)
    kmap = KmerMap.from_pairs(ukeys, np.ones(ukeys.size, np.int64))
    seed_pos = rng.choice(G - K, size=n_seeds, replace=False)
    seeds = np.unique(fw[seed_pos])
    return kmap, seeds, ukeys.size


def run_host(kmap, seeds):
    t0 = time.perf_counter()
    res = bfs_fifo(seeds.tolist(), kmap, K, 1, 0, RADIUS, None)
    return time.perf_counter() - t0, int(res.visited.size)


def run_dense(kmap, seeds):
    from metacherchant_tpu.ops.bfs_dense import _graph_of, dense_bfs
    t0 = time.perf_counter()
    g = _graph_of(kmap, K)
    jax.block_until_ready(g.adj)
    fast_scalar(g.adj[123, 0])
    t_build_cold = time.perf_counter() - t0
    # warm build: all join/assemble kernels now cached -- this is the cost
    # every later map of the same shape class pays
    del kmap._dense_dbg
    t0 = time.perf_counter()
    g = _graph_of(kmap, K)
    fast_scalar(g.adj[123, 0])
    t_build = time.perf_counter() - t0
    log(f"  dense build: cold {t_build_cold:.1f}s warm {t_build:.3f}s")
    elig = g.eligible(1)
    seeds_dense, _ = g.seed_vector(seeds)
    sd = jnp.asarray(seeds_dense)

    def one(radius):
        t0 = time.perf_counter()
        visited, count, layers = dense_bfs(g.adj, elig, sd,
                                           jnp.int32(radius), 0)
        nn = fast_scalar(count)
        return time.perf_counter() - t0, nn

    t_first, nn = one(RADIUS)
    log(f"  dense first traversal (incl compile): {t_first:.1f}s n={nn}")
    t_half = min(one(RADIUS // 2)[0] for _ in range(2))
    runs = [one(RADIUS) for _ in range(2)]
    t_full = min(t for t, _ in runs)
    nn_half = one(RADIUS // 2)[1]
    return t_build, t_full, t_half, nn, nn_half


def run_probe(kmap, seeds, fcap_log2):
    from metacherchant_tpu.ops.bfs_device import device_bfs, SENTINEL
    from metacherchant_tpu.ops.hashtable import DeviceHashTable
    table = DeviceHashTable.from_kmer_map(kmap)
    scap = 1 << int(np.ceil(np.log2(seeds.size + 1)))
    seeds_pad = np.full(scap, SENTINEL, np.int64)
    seeds_pad[: seeds.size] = seeds
    sd = jnp.asarray(seeds_pad)
    visited_log2 = int(np.ceil(np.log2(2 * len(kmap) / 0.25 + 2)))

    def one(radius):
        t0 = time.perf_counter()
        vset, count, overflow = device_bfs(
            sd, table.tkeys, table.tcnts, 1, radius, K, 0,
            1 << fcap_log2, visited_log2)
        nn = fast_scalar(count)
        ov = fast_scalar(overflow.astype(jnp.int32))
        assert not ov, "probe BFS frontier overflow: raise fcap"
        return time.perf_counter() - t0, nn

    t_first, nn = one(RADIUS)
    log(f"  probe first traversal (incl compile): {t_first:.1f}s n={nn}")
    t_full = min(one(RADIUS)[0] for _ in range(2))
    return t_full, nn


def workload(tag, G, n_seeds, engines):
    log(f"== workload {tag}: G={G} seeds={n_seeds} radius={RADIUS}")
    t0 = time.perf_counter()
    kmap, seeds, n_keys = stage(G, n_seeds)
    log(f"  staged: map {n_keys} kmers, {seeds.size} seeds "
        f"({time.perf_counter() - t0:.1f}s)")
    out = {"workload": tag, "map_kmers": n_keys, "seeds": int(seeds.size),
           "radius": RADIUS}
    if "host" in engines:
        dt, nv = run_host(kmap, seeds)
        out["host_s"] = round(dt, 3)
        out["host_visited"] = nv
        out["host_exp_per_s"] = round(nv / dt, 1)
        log(f"  host C++ FIFO: {dt:.3f}s, {nv} visited")
    if "dense" in engines:
        t_build, t_full, t_half, nn, nn_half = run_dense(kmap, seeds)
        dt = max(t_full - t_half, 1e-9)
        dn = max(nn - nn_half, 1)
        out["dense_build_s"] = round(t_build, 3)
        out["dense_traverse_s"] = round(t_full, 3)
        out["dense_visited"] = nn
        out["dense_diff_exp_per_s"] = round(dn / dt, 1)
        out["dense_abs_exp_per_s"] = round(nn / max(t_full, 1e-9), 1)
        log(f"  dense: build {t_build:.3f}s, traverse {t_full:.3f}s "
            f"(half {t_half:.3f}s), {nn} visited")
    if "probe" in engines:
        fcap = max(int(np.ceil(np.log2(seeds.size + 2))) + 1, 14)
        t_full, nn = run_probe(kmap, seeds, fcap)
        out["probe_traverse_s"] = round(t_full, 3)
        out["probe_visited"] = nn
        log(f"  probe: traverse {t_full:.3f}s, {nn} visited")
    print(json.dumps(out), flush=True)


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C"}
    if "A" in which:
        workload("A", 400_000, 4_096, ("host", "dense", "probe"))
    if "B" in which:
        workload("B", 400_000, 65_536, ("host", "dense"))
    if "C" in which:
        workload("C", 2_000_000, 500_000, ("host", "dense"))


if __name__ == "__main__":
    main()
