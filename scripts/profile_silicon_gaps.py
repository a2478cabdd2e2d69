"""Close the two round-4 silicon-evidence gaps (VERDICT r4 #6) on the chip:

1. hashed device BFS (ops/bfs_hashed.py, k>31 multiword packed codes) --
   CPU-tested and CLI-pinned since round 3 but never recorded on real TPU.
2. mesh-1 real-TPU run of ShardedCounter + run_sharded_bfs -- every prior
   sharded number was the virtual CPU mesh; a single-chip mesh validates
   the shard_map/all_to_all code path under the real TPU runtime.

Each section verifies result equality against the host oracle BEFORE
printing its JSON line. Results go to BENCH_NOTES.md.

Usage: timeout 1700 python scripts/profile_silicon_gaps.py [hashed|sharded]
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_hashed():
    from metacherchant_tpu.counting import count_sequences_host
    from metacherchant_tpu.dna import encode
    from metacherchant_tpu.ops.kmers import hash_codes_np
    from metacherchant_tpu.algo.environment_hashed import _bfs_layer_fifo
    from metacherchant_tpu.ops.bfs_hashed import run_device_bfs_hashed

    k, hasher = 55, "poly"
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=40_000))
    t0 = time.perf_counter()
    kmap = count_sequences_host([genome], k, hasher)
    log(f"hashed workload: map {len(kmap)} kmers (staged "
        f"{time.perf_counter() - t0:.1f}s)")
    gene = genome[10_000:12_000]
    wins = np.lib.stride_tricks.sliding_window_view(
        encode(gene), k).astype(np.uint8)
    occ = kmap.get_many(hash_codes_np(wins, hasher))
    seed_rows = [w for w, o in zip(wins, occ) if o >= 1]
    radius = 30

    t0 = time.perf_counter()
    host = _bfs_layer_fifo(seed_rows, kmap, k, 1, hasher, 0, radius,
                           None, False)
    dt_h = time.perf_counter() - t0
    want = set(host)
    log(f"  host engine: {len(want)} rows {dt_h:.2f}s")

    seeds = np.stack(seed_rows)

    def one():
        t0 = time.perf_counter()
        rows = run_device_bfs_hashed(seeds, kmap, k, 1, hasher, 0, radius)
        return time.perf_counter() - t0, rows

    t_first, rows = one()
    log(f"  device first (incl compile): {t_first:.1f}s "
        f"{rows.shape[0]} rows")
    # set equality with the host engine before any number prints
    got = {r.tobytes() for r in rows}
    assert got == want, (len(got), len(want))
    t_dev = min(one()[0] for _ in range(2))
    n = rows.shape[0]
    log(f"  device warm: {t_dev:.3f}s")
    print(json.dumps({
        "metric": "bfs_hashed_device_on_chip",
        "k": k, "hasher": hasher, "map_kmers": len(kmap),
        "seeds": int(seeds.shape[0]), "radius": radius,
        "n_visited": int(n), "device_s": round(t_dev, 3),
        "device_exp_per_s": round(n / t_dev, 1),
        "host_engine_s": round(dt_h, 3), "visited_sets_equal": True}))
    sys.stdout.flush()


def run_sharded(with_count: bool = True):
    from metacherchant_tpu.kmer_map import KmerMap
    from metacherchant_tpu.parallel.sharded_count import (
        ShardedCounter, make_mesh)
    from metacherchant_tpu.parallel.sharded_bfs import run_sharded_bfs
    from metacherchant_tpu.counting import count_sequences_host
    from metacherchant_tpu.algo.environment import bfs_layered

    mesh = make_mesh()
    n_dev = mesh.devices.size
    log(f"sharded mesh: {n_dev} device(s): {mesh.devices.ravel().tolist()}")

    k = 31
    rng = np.random.default_rng(1)
    genome = "".join(rng.choice(list("ACGT"), size=200_000))

    if with_count:
        reads = []
        for _ in range(4000):
            i = int(rng.integers(0, len(genome) - 120))
            reads.append(genome[i:i + 120])
        host_map = count_sequences_host(reads, k)
        log(f"  host oracle: {len(host_map)} distinct kmers")

        from metacherchant_tpu.ops.kmers import pack_reads
        from metacherchant_tpu.dna import encode
        frags = [encode(r) for r in reads]
        counter = ShardedCounter(mesh, k, None, capacity_log2_per_shard=19,
                                 batch=max(n_dev, 512), max_len=128)
        batch = counter.batch

        t0 = time.perf_counter()
        for b0 in range(0, len(frags), batch):
            packed = pack_reads(frags[b0:b0 + batch], batch, 128)
            counter.add_codes(packed)
        keys, counts = counter.items_host()
        dt_count = time.perf_counter() - t0
        assert np.array_equal(keys, host_map.keys), "sharded keys mismatch"
        assert np.array_equal(counts, host_map.counts), "counts mismatch"
        log(f"  sharded counting on real TPU mesh-{n_dev}: {dt_count:.2f}s, "
            f"{keys.size} keys, equality OK")
        print(json.dumps({
            "metric": "sharded_counter_real_tpu_mesh1",
            "devices": n_dev, "distinct_kmers": int(keys.size),
            "wall_s": round(dt_count, 2), "equal_to_host_oracle": True}))
        sys.stdout.flush()

    # BFS over a SMALLER map: the mesh-1 validation point is the
    # shard_map/all_to_all runtime path, not scale -- the while_loop at
    # 167K-key caps exceeded the remote compile budget (~17 min, killed)
    genome_b = genome[:30_000]
    bmap = count_sequences_host([genome_b], k)
    kmap = KmerMap(bmap.keys, bmap.counts)
    log(f"  BFS map: {len(kmap)} kmers")
    seed_pos = rng.choice(len(genome_b) - k, size=1000, replace=False)
    from metacherchant_tpu.counting import seed_keys_of_sequence
    all_fw = seed_keys_of_sequence(genome_b, k, None)  # canonical seeds
    seeds = np.unique(all_fw[seed_pos])
    radius = 30
    ref = bfs_layered(seeds, kmap, k, 1, 0, radius)

    def one():
        t0 = time.perf_counter()
        # tight frontier cap: ~1K seeds never widen past ~8K lanes/shard;
        # the default 2x-map cap made per-layer bucket/scatter lanes so
        # large the real-TPU worker watchdog killed the step
        vis = run_sharded_bfs(seeds, kmap, k, 1, 0, radius, mesh=mesh,
                              frontier_cap=8192)
        return time.perf_counter() - t0, vis

    t_first, vis = one()
    assert np.array_equal(np.sort(ref.visited), np.sort(vis))
    t_warm = min(one()[0] for _ in range(2))
    log(f"  sharded BFS on real TPU mesh-{n_dev}: first {t_first:.1f}s "
        f"warm {t_warm:.2f}s, {vis.size} visited, equality OK")
    print(json.dumps({
        "metric": "sharded_bfs_real_tpu_mesh1",
        "devices": n_dev, "n_visited": int(vis.size),
        "seeds": int(seeds.size), "radius": radius,
        "first_s": round(t_first, 2), "warm_s": round(t_warm, 2),
        "equal_to_host_oracle": True}))
    sys.stdout.flush()


def main():
    which = set(sys.argv[1:]) or {"hashed", "sharded"}
    if "hashed" in which:
        run_hashed()
    if "sharded" in which:
        run_sharded()
    elif "sharded-bfs" in which:
        run_sharded(with_count=False)


if __name__ == "__main__":
    main()
