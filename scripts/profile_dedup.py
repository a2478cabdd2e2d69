"""Phase profile on the real chip: where does the count-insert step time go?

Measures, via the difference method (chained steps + one tiny cross-backend
probe readback), the per-step cost of:
  A. extraction only               (canonical_kmers)
  B. extraction + segment-op dedup (current _batch_unique_impl)
  C. extraction + scatter-free dedup (candidate: single sort + scans)
  D. full current count-insert      (extract + segment dedup + probe insert)
  E. extract + scatter-free dedup + probe insert (candidate full)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MC_JAX_CACHE", "/root/repo/.jax_cache")

import numpy as np
import metacherchant_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import (
    _count_insert_kernel, _insert_unique_impl, _batch_unique_impl, EMPTY)
from metacherchant_tpu.ops.kmers import canonical_kmers, SENTINEL

K = 31
BATCH = 4096
LEN = 256
TABLE_LOG2 = 24
MS, MB = 2, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


_probe_fn = jax.jit(lambda b: (b.ravel()[123] ^ b.ravel()[456]).astype(jnp.int32))


def probe(x):
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(_probe_fn(x), cpu)))


def make_batches(n):
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=4_000_000).astype(np.int8)
    window = np.arange(LEN)
    return [
        jnp.asarray(genome[rng.integers(0, genome.size - LEN, size=BATCH)[:, None]
                           + window[None, :]].astype(np.int32))
        for _ in range(n)
    ]


def _dedup_free_impl(keys_flat):
    """Scatter-free batch dedup: unique keys emitted at run-LAST positions of
    the sorted array, SENTINEL elsewhere. One sort, two scans, one gather."""
    n = keys_flat.shape[0]
    s = jnp.sort(keys_flat)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    w = (s != SENTINEL).astype(jnp.int64)
    cw_pad = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(w)])
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    cnt = cw_pad[idx + 1] - cw_pad[start]
    real = last & (s != SENTINEL)
    ukeys = jnp.where(real, s, SENTINEL)
    ucnts = jnp.where(real, cnt, 0).astype(jnp.int32)
    return ukeys, ucnts


def chain(name, fn, batches, init_state):
    def run(m):
        st = init_state()
        t0 = time.perf_counter()
        for i in range(m):
            st = fn(st, batches[i])
        v = probe(st[0] if isinstance(st, tuple) else st)
        dt = time.perf_counter() - t0
        log(f"  {name} m={m}: {dt:.2f}s (probe={v})")
        return dt

    run(1)  # compile
    ts, tb = run(MS), run(MB)
    per = (tb - ts) / (MB - MS)
    log(f"{name}: {per * 1000:.1f} ms/step = "
        f"{BATCH * (LEN - K + 1) / per / 1e6:.1f} M kmers/s")
    return per


def _fold(x, width=128):
    """Reduce a whole tensor into (width,) so no element is dead code."""
    f = x.ravel().astype(jnp.int64)
    n = (f.shape[0] // width) * width
    folded = f[:n].reshape(-1, width).sum(axis=0)
    return folded + f[n:].sum()


@jax.jit
def step_extract(carry, codes):
    keys, _ = canonical_kmers(codes, K, None)
    return carry + _fold(keys)


@jax.jit
def step_seg_dedup(carry, codes):
    keys, _ = canonical_kmers(codes, K, None)
    uk, uc = _batch_unique_impl(keys.ravel())
    return carry + _fold(uk) + _fold(uc)


@jax.jit
def step_free_dedup(carry, codes):
    keys, _ = canonical_kmers(codes, K, None)
    uk, uc = _dedup_free_impl(keys.ravel())
    return carry + _fold(uk) + _fold(uc)


import functools


@functools.partial(jax.jit, donate_argnums=(0,))
def step_full_current(state, codes):
    tk, tc = state
    tk, tc, _, _ = _count_insert_kernel(tk, tc, codes, K, None)
    return (tk, tc)


@functools.partial(jax.jit, donate_argnums=(0,))
def step_full_free(state, codes):
    tk, tc = state
    keys, _ = canonical_kmers(codes, K, None)
    uk, uc = _dedup_free_impl(keys.ravel())
    tk, tc, _, _ = _insert_unique_impl(tk, tc, uk, uc)
    return (tk, tc)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batches = make_batches(MB)
    log(f"{len(batches)} batches ready; device={jax.devices()[0].platform}")

    def fresh_table():
        return (jnp.full((1 << TABLE_LOG2,), EMPTY, jnp.int64),
                jnp.zeros((1 << TABLE_LOG2,), jnp.int32))

    def fresh_carry():
        return jnp.zeros((128,), jnp.int64)

    res = {}
    if which in ("all", "A"):
        res["A_extract"] = chain("A extract", step_extract, batches, fresh_carry)
    if which in ("all", "C"):
        res["C_free_dedup"] = chain("C extract+free-dedup", step_free_dedup,
                                    batches, fresh_carry)
    if which in ("all", "B"):
        res["B_seg_dedup"] = chain("B extract+seg-dedup", step_seg_dedup,
                                   batches, fresh_carry)
    if which in ("all", "E"):
        res["E_full_free"] = chain("E full free", step_full_free, batches,
                                   fresh_table)
    if which in ("all", "D"):
        res["D_full_current"] = chain("D full current", step_full_current,
                                      batches, fresh_table)
    for k, v in res.items():
        log(f"RESULT {k}: {v * 1000:.1f} ms/step")


if __name__ == "__main__":
    main()
