"""Weak-scaling harness for sharded multi-chip counting (SURVEY §6 target:
>=80% weak-scaling efficiency on counting at 2+ hosts).

Methodology (runs anywhere; meaningful NUMBERS require a real multi-chip
slice, which this rig does not have -- on the virtual CPU mesh the harness
validates the measurement path and the sharded engine's exactness):

- Fix per-device work: each device contributes B reads per step (total batch
  = B * n_devices), so a perfectly scaling engine holds time/step constant
  as the mesh grows (weak scaling).
- For each mesh size n in {1, 2, 4, 8}: run the ShardedCounter
  (DP reads x hash-sharded table, all_to_all key routing,
  parallel/sharded_count.py) for M steps, difference-method timed
  (T(M_big) - T(M_small)) to cancel compile + readback.
- efficiency(n) = t_step(1) / t_step(n). Report per-mesh step time,
  total keys/s, and efficiency.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py
On a real pod slice, drop the env overrides; the same script measures ICI
all_to_all scaling (per-host file sharding is exercised separately via
parallel/distributed.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import metacherchant_tpu  # noqa: F401
import jax

from metacherchant_tpu.parallel.sharded_count import ShardedCounter, make_mesh

K = 31
PER_DEV_BATCH = int(os.environ.get("MC_SCALE_BATCH", "256"))
LEN = int(os.environ.get("MC_SCALE_LEN", "128"))
M_SMALL, M_BIG = 4, 12


def step_time(n_dev: int) -> float:
    devices = jax.devices()[:n_dev]
    mesh = make_mesh(devices)
    batch = PER_DEV_BATCH * n_dev
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=200000).astype(np.int8)
    win = np.arange(LEN)
    batches = [
        genome[rng.integers(0, genome.size - LEN, size=batch)[:, None]
               + win[None, :]].astype(np.int32)
        for _ in range(M_BIG)
    ]

    def chain(m: int) -> float:
        """Timed: the steady-state step loop only. The chain ends with ONE
        device-side sync (block on the sharded table buffers); correctness
        (items_host + oracle equality) is covered by tests/test_parallel.py,
        and the final readback/drain is excluded so the difference method
        cancels per-chain constants instead of amplifying them."""
        sc = ShardedCounter(mesh, K, None, capacity_log2_per_shard=16,
                            batch=batch, max_len=LEN,
                            overflow_buf=4096)
        t0 = time.perf_counter()
        for i in range(m):
            sc.add_codes(batches[i])
        jax.block_until_ready((sc.tkeys, sc.tcnts))
        return time.perf_counter() - t0

    chain(2)  # warm
    reps = [(chain(M_SMALL), chain(M_BIG)) for _ in range(3)]
    return min(max(tb - ts, 1e-9) / (M_BIG - M_SMALL) for ts, tb in reps)


def main() -> None:
    avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= avail]
    print(f"devices available: {avail}; meshes: {sizes}", file=sys.stderr)
    t1 = None
    for n in sizes:
        t = step_time(n)
        t1 = t if t1 is None else t1
        keys_per_step = PER_DEV_BATCH * n * (LEN - K + 1)
        print(json.dumps({
            "metric": "sharded_count_weak_scaling",
            "mesh": n,
            "step_ms": round(t * 1000, 1),
            "keys_per_s": round(keys_per_step / t, 1),
            "efficiency_vs_1dev": round(t1 / t, 3),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
