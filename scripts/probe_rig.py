"""Rig probe: timings for the primitives of the chunked consolidation path.

Measures (difference method, cross-backend probe) on the session TPU:
  - lax.sort at 2^17..2^21 lanes, 1-op and 2-op
  - batched sort: one lax.sort over (C, 2^20) rows
  - bitonic merge network at 2^21..2^24 lanes (keys-only and keyed 2-op)
  - associative_scan segmented-sum at 2^23 lanes

Run each probe as:  python scripts/probe_rig.py <probe> [args]
so the parent shell can enforce kill budgets per probe (remote compiles hang).
"""
import os
import sys
import time

os.environ.setdefault(
    "MC_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import metacherchant_tpu  # noqa: F401  (x64 + cache config)
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def probe(x):
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(
        (x.ravel()[123] ^ x.ravel()[457]).astype(jnp.int64), cpu)))


def _first(x):
    return x[0] if isinstance(x, tuple) else x


def timed_chain(step, state, m_small=4, m_big=12, label=""):
    """Difference method: per-call cost of `step` (state -> state)."""
    s = state
    for _ in range(1):
        s = step(s)
    probe(_first(s))  # compile + settle
    t0 = time.perf_counter()
    s2 = state
    for _ in range(m_small):
        s2 = step(s2)
    probe(_first(s2))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    s3 = state
    for _ in range(m_big):
        s3 = step(s3)
    probe(_first(s3))
    t_big = time.perf_counter() - t0
    per = (t_big - t_small) / (m_big - m_small)
    log(f"{label}: {per * 1000:.2f} ms/call (small {t_small:.2f}s big {t_big:.2f}s)")
    return per


def rand_keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 62, size=n, dtype=np.int64))


def main():
    which = sys.argv[1]
    t_start = time.perf_counter()

    if which == "sort":
        log2 = int(sys.argv[2])
        nops = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        n = 1 << log2
        keys = rand_keys(n)
        cnts = jnp.ones((n,), jnp.int32)

        if nops == 1:
            @jax.jit
            def step(x):
                # xor-perturb so each call sorts fresh data (not pre-sorted)
                return jax.lax.sort(x ^ (x >> 7))
            timed_chain(step, keys, label=f"sort1 2^{log2}")
        else:
            @jax.jit
            def step(state):
                k, c = state
                k2, c2 = jax.lax.sort((k ^ (k >> 7), c + 1), num_keys=1)
                return k2, c2
            timed_chain(step, (keys, cnts), label=f"sort2 2^{log2}")

    elif which == "bsort":
        # batched sort: (rows, 2^20) along last axis
        rows = int(sys.argv[2])
        keys = rand_keys(rows << 20).reshape(rows, 1 << 20)

        @jax.jit
        def step(x):
            return jax.lax.sort(x ^ (x >> 7), dimension=1)
        timed_chain(step, keys, label=f"bsort {rows}x2^20")

    elif which == "merge":
        log2 = int(sys.argv[2])          # total lanes of merged output
        nops = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        n = 1 << log2
        half = n // 2
        a = jax.lax.sort(rand_keys(half, 1))
        b = jax.lax.sort(rand_keys(half, 2))
        ca = jnp.ones((half,), jnp.int32)

        def merge_stages(keys, ops):
            s = keys.shape[0] // 2
            while s >= 1:
                k2 = keys.reshape(-1, 2, s)
                x, y = k2[:, 0], k2[:, 1]
                swap = x > y
                keys = jnp.stack(
                    [jnp.where(swap, y, x), jnp.where(swap, x, y)],
                    axis=1).reshape(-1)
                ops = [
                    jnp.stack([jnp.where(swap, q[:, 1], q[:, 0]),
                               jnp.where(swap, q[:, 0], q[:, 1])],
                              axis=1).reshape(-1)
                    for q in (o.reshape(-1, 2, s) for o in ops)
                ]
                s //= 2
            return keys, ops

        if nops == 1:
            @jax.jit
            def step(state):
                x, y = state
                keys, _ = merge_stages(
                    jnp.concatenate([x, y[::-1]]), [])
                return keys[:half] ^ 1, keys[half:]
            timed_chain(step, (a, b), label=f"merge1 2^{log2}")
        else:
            @jax.jit
            def step(state):
                x, y, c = state
                keys, (cc,) = merge_stages(
                    jnp.concatenate([x, y[::-1]]),
                    [jnp.concatenate([c, c[::-1]])])
                return keys[:half] ^ 1, keys[half:], cc[:half] + 1
            timed_chain(step, (a, b, ca), label=f"merge2 2^{log2}")

    elif which == "cum":
        # gather-free segmented RLE via native cumsum + cummax (single HLO
        # scan ops, unlike associative_scan's O(n log n)-op unrolled graph,
        # which hangs the remote compiler at 2^23)
        log2 = int(sys.argv[2])
        n = 1 << log2
        keys = jax.lax.sort(rand_keys(n))
        w0 = jnp.ones((n,), jnp.int32)

        @jax.jit
        def step(state):
            k, w = state
            head = jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
            s = jnp.cumsum(w.astype(jnp.int64))
            base = jax.lax.cummax(jnp.where(head, s - w, jnp.int64(-1)))
            tot = s - base  # at run-last lanes this is the run total
            last = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
            out_k = jnp.where(last, k, jnp.int64((1 << 62)))
            out_c = jnp.where(last, tot, 0).astype(jnp.int32)
            return out_k ^ 1, out_c + 1
        timed_chain(step, (keys, w0), label=f"cumrle 2^{log2}")

    elif which == "cumsum":
        log2 = int(sys.argv[2])
        n = 1 << log2
        w0 = jnp.ones((n,), jnp.int32)

        @jax.jit
        def step(w):
            s = jnp.cumsum(w.astype(jnp.int64))
            return (s & 1023).astype(jnp.int32) + 1
        timed_chain(step, w0, label=f"cumsum 2^{log2}")

    elif which == "rle":
        # full sort->cumsum->rekey->sort->diff RLE (the candidate consolidation)
        log2 = int(sys.argv[2])
        n = 1 << log2
        keys0 = rand_keys(n) >> 40  # ~4M distinct: heavy duplication
        w0 = jnp.ones((n,), jnp.int32)
        SEN = jnp.int64(np.iinfo(np.int64).max)

        @jax.jit
        def step(state):
            k0, w = state
            k, ws = jax.lax.sort((k0, w.astype(jnp.int64)), num_keys=1)
            s = jnp.cumsum(ws)
            last = jnp.concatenate([k[1:] != k[:-1], jnp.ones((1,), bool)])
            k2 = jnp.where(last, k, SEN)
            s2 = jnp.where(last, s, 0)
            ck, cs = jax.lax.sort((k2, s2), num_keys=1)
            prev = jnp.concatenate([jnp.zeros((1,), jnp.int64), cs[:-1]])
            tot = jnp.where(ck != SEN, cs - prev, 0)
            return ck ^ 1, (tot & 1023).astype(jnp.int32) + 1
        timed_chain(step, (keys0, w0), label=f"rle 2^{log2}")

    elif which == "scan":
        log2 = int(sys.argv[2])
        n = 1 << log2
        keys = jax.lax.sort(rand_keys(n))

        @jax.jit
        def step(state):
            k, acc = state
            first = jnp.concatenate(
                [jnp.ones((1,), bool), k[1:] != k[:-1]])

            def seg(u, v):
                return u[0] | v[0], jnp.where(v[0], v[1], u[1] + v[1])

            _, tot = jax.lax.associative_scan(
                seg, (first, jnp.ones((n,), jnp.int32)))
            return k ^ 1, acc + tot
        timed_chain(step, (keys, jnp.zeros((n,), jnp.int32)),
                    label=f"segscan 2^{log2}")

    else:
        raise SystemExit(f"unknown probe {which}")

    log(f"total wall {time.perf_counter() - t_start:.1f}s")
    print("OK")


if __name__ == "__main__":
    main()
