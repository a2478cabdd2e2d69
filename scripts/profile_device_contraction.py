"""On-chip timing of the device unitig-contraction kernel
(ops/contraction_device.py::contract_codes_device): pointer-doubling over a
doubled-node universe built from a random-genome path.

VERDICT r3 #2 asked for at least one RECORDED TPU run of the device
contraction; this script is that record (results go to BENCH_NOTES.md).
Compares against the host sweep (algo/contraction.py) on the same k-mer set.

Usage: timeout 580 python scripts/profile_device_contraction.py [n_kmers]
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

from metacherchant_tpu.ops.contraction_device import contract_codes_device
from metacherchant_tpu.ops.sortcount import fast_scalar

K = 31


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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rng = np.random.default_rng(0)
    gcodes = rng.integers(0, 4, size=n + K - 1).astype(np.int64)
    canon = np.unique(_np_canonical(_np_window_codes(gcodes, K), K))
    tags = np.zeros(canon.size, np.int32)
    log(f"workload: {canon.size} canonical kmers")

    codes_dev = jnp.asarray(canon)
    tags_dev = jnp.asarray(tags)

    t0 = time.perf_counter()
    U, utags, head, dist = contract_codes_device(codes_dev, tags_dev, K)
    v = fast_scalar(head[123].astype(jnp.int32))
    log(f"cold+first: {time.perf_counter() - t0:.1f}s (probe={v})")

    def run():
        t0 = time.perf_counter()
        U, utags, head, dist = contract_codes_device(codes_dev, tags_dev, K)
        fast_scalar((head[123] ^ dist[456]).astype(jnp.int32))
        return time.perf_counter() - t0

    run()
    best = min(run() for _ in range(3))
    print(f"RESULT device-contraction n={canon.size} {best:.3f}s "
          f"({canon.size / best / 1e6:.2f} M kmers/s)", flush=True)

    # host sweep comparison on the same set (small-N regime is its domain)
    from metacherchant_tpu.ops.contraction_device import (
        assemble_unitigs)
    t0 = time.perf_counter()
    hU, hh, hd = (np.asarray(U), np.asarray(head), np.asarray(dist))
    unitigs = assemble_unitigs(hU, hh, hd, K)
    log(f"assemble_unitigs (host): {time.perf_counter() - t0:.1f}s, "
        f"{len(unitigs)} unitigs")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
