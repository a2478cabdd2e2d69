"""On-chip comparison: XLA lax.scan canonical extraction vs the Pallas
Mosaic kernel (ops/pallas_kmers.py), difference-method, DCE-proofed.

VERDICT r3 #2 asked for at least one RECORDED TPU run of MC_PALLAS_EXTRACT;
this script is that record (results go to BENCH_NOTES.md).

Usage: timeout 580 python scripts/profile_pallas_extract.py [batch] [len]
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

from metacherchant_tpu.ops.kmers import canonical_kmers
from metacherchant_tpu.ops.pallas_kmers import exact_canonical_kmers_pallas
from metacherchant_tpu.ops.sortcount import fast_scalar

K = 31


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.int32))
               for _ in range(2)]
    kmers_per = B * (L - K + 1)

    def _fold(x):
        f = x.ravel()
        n = (f.shape[0] // 128) * 128
        return f[:n].reshape(-1, 128).sum(axis=0) + f[n:].sum()

    @jax.jit
    def step_xla(carry, codes):
        keys, _ = canonical_kmers(codes, K, None)
        return carry + _fold(keys)

    @jax.jit
    def step_pallas(carry, codes):
        keys, _ = exact_canonical_kmers_pallas(codes, K)
        return carry + _fold(keys)

    for name, step in (("xla-scan", step_xla), ("pallas", step_pallas)):
        t0 = time.perf_counter()
        c = step(jnp.zeros((128,), jnp.int64), batches[0])
        v = fast_scalar(c[0].astype(jnp.int32))
        log(f"{name} cold+first: {time.perf_counter() - t0:.1f}s (probe={v})")

        def chain(m):
            carry = jnp.zeros((128,), jnp.int64)
            t0 = time.perf_counter()
            for i in range(m):
                carry = step(carry, batches[i % 2])
            fast_scalar(carry[0].astype(jnp.int32))
            return time.perf_counter() - t0

        chain(2)
        ts, tb = chain(8), chain(40)
        per = (tb - ts) / 32
        print(f"RESULT {name} B={B} L={L} {per * 1000:.2f} ms/batch "
              f"{kmers_per / per / 1e6:.0f} M kmers/s", flush=True)


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
