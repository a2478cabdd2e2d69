"""On-chip k>31 hashed-regime counting throughput (SURVEY §5.7: the large-k
regime must be first-class at speed, src/io/LargeKIOUtils.java:40-88).

Same StreamCounter consolidation units as the exact bench (int64 keys --
the cached sort2/cumsum shapes are key-regime agnostic); only the
extraction/append kernel differs (fused rolling poly/fnv1a hashing,
ops/kmers.py). Difference-method, DCE-proofed via the cross-backend probe.

Usage: timeout 900 python scripts/profile_hashed_count.py [poly|fnv1a] [k] [batch]
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

from metacherchant_tpu.ops.sortcount import StreamCounter, fast_scalar

LEN = 256
BATCH = 8192


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    hasher = sys.argv[1] if len(sys.argv) > 1 else "poly"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 55
    # batch override: r5 buffer-fill tuning -- appended lanes are
    # batch*(LEN-k+1) after the column trim, so pick a batch whose fills
    # land near 100% of the 2^24-2^21 buffer (k=55: 9024 -> 8 fills 99.3%)
    global BATCH
    # default 8960 = 70*128: vector-lane aligned AND 8 fills at 98.7% of
    # the buffer -- measured best for BOTH hashers round 5 (9024 fills
    # marginally better but its 70.5*128 lane padding costs the poly
    # kernel 40%; see BENCH_NOTES)
    BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8960
    keys_per_step = BATCH * (LEN - k + 1)
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=1_500_000).astype(np.int8)
    window = np.arange(LEN)
    m_small, m_big = 16, 112
    batches = [jnp.asarray(
        g[rng.integers(0, g.size - LEN, size=BATCH)[:, None]
          + window[None, :]].astype(np.int32)) for _ in range(m_big)]
    probe_fn = jax.jit(
        lambda b: (b.ravel()[123] ^ b.ravel()[456]).astype(jnp.int32))

    def run_chain(m):
        sc = StreamCounter(buffer_cap=(1 << 24) - (1 << 21),
                           store_cap=1 << 21)
        t0 = time.perf_counter()
        for i in range(m):
            sc.add_codes(batches[i], k, hasher)
        sc._consolidate()
        v = fast_scalar(probe_fn(sc.store_keys))
        dt = time.perf_counter() - t0
        log(f"hashed chain m={m}: {dt:.2f}s (probe={v}, live={sc._live})")
        return dt

    run_chain(2)
    log("warm")
    ts, tb = run_chain(m_small), run_chain(m_big)
    per = max(tb - ts, 1e-9) / (m_big - m_small)
    print(f"RESULT hashed-count hasher={hasher} k={k} "
          f"{per * 1000:.1f} ms/step "
          f"{keys_per_step / per / 1e6:.1f} M kmers/s", flush=True)


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
