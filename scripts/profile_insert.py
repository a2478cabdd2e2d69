"""Dissect the open-addressing insert: round count, per-round cost,
while_loop vs fori_loop, and the StreamCounter (sort-engine) alternative."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MC_JAX_CACHE", "/root/repo/.jax_cache")

import numpy as np
import metacherchant_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import EMPTY, _mix64
from metacherchant_tpu.ops.kmers import canonical_kmers, SENTINEL

K = 31
BATCH = 4096
LEN = 256
TABLE_LOG2 = 24
MS, MB = 2, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(x):
    cpu = jax.devices("cpu")[0]
    return np.asarray(jax.device_put(x, cpu))


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


def insert_rounds(tkeys, tcnts, bkeys, bcnts, max_rounds):
    C = tkeys.shape[0]
    cmask = jnp.uint64(C - 1)
    active0 = bkeys != EMPTY
    slot0 = (_mix64(bkeys) & cmask).astype(jnp.int32)

    def cond(state):
        _, _, active, _, rounds, _ = state
        return jnp.logical_and(jnp.any(active), rounds < max_rounds)

    def body(state):
        tkeys, tcnts, active, slot, rounds, new = state
        cur = tkeys[slot]
        match = jnp.logical_and(active, cur == bkeys)
        empty = jnp.logical_and(active, cur == EMPTY)
        claim_slot = jnp.where(empty, slot, C)
        tkeys = tkeys.at[claim_slot].set(bkeys, mode="drop")
        winner = jnp.logical_and(empty, tkeys[slot] == bkeys)
        add_slot = jnp.where(jnp.logical_or(match, winner), slot, C)
        tcnts = tcnts.at[add_slot].add(bcnts, mode="drop")
        done = jnp.logical_or(match, winner)
        active = jnp.logical_and(active, jnp.logical_not(done))
        slot = jnp.where(active, (slot + 1) & jnp.int32(C - 1), slot)
        return (tkeys, tcnts, active, slot, rounds + 1,
                new + jnp.sum(winner).astype(jnp.int32))

    tkeys, tcnts, active, _, rounds, new = jax.lax.while_loop(
        cond, body, (tkeys, tcnts, active0, slot0, jnp.int32(0), jnp.int32(0)))
    return tkeys, tcnts, rounds, jnp.sum(active0), new


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("mr",))
def step_insert_rounds(state, codes, mr):
    tk, tc, tot_rounds = state
    keys, _ = canonical_kmers(codes, K, None)
    uk, uc = _dedup_free_impl(keys.ravel())
    tk, tc, rounds, nact, new = insert_rounds(tk, tc, uk, uc, mr)
    return (tk, tc, tot_rounds + rounds)


def run_rounds(batches, mr):
    def go(m):
        st = (jnp.full((1 << TABLE_LOG2,), EMPTY, jnp.int64),
              jnp.zeros((1 << TABLE_LOG2,), jnp.int32), jnp.int32(0))
        t0 = time.perf_counter()
        for i in range(m):
            st = step_insert_rounds(st, batches[i], mr)
        r = int(probe(st[2]))
        dt = time.perf_counter() - t0
        log(f"  mr={mr} m={m}: {dt:.2f}s total_rounds={r}")
        return dt, r

    go(1)
    ts, _ = go(MS)
    tb, rb = go(MB)
    per = (tb - ts) / (MB - MS)
    log(f"mr={mr}: {per * 1000:.1f} ms/step, avg rounds/step={rb / MB:.1f}")


def run_streamcounter(batches, buf_log2=24, store_log2=22):
    from metacherchant_tpu.ops.sortcount import StreamCounter

    def go(m):
        sc = StreamCounter(buffer_cap_log2=buf_log2, store_cap_log2=store_log2)
        t0 = time.perf_counter()
        for i in range(m):
            sc.add_codes(batches[i], K, None)
        sc._consolidate()
        n = sc._live
        dt = time.perf_counter() - t0
        log(f"  SC m={m}: {dt:.2f}s live={n}")
        return dt

    go(1)
    ts = go(MS)
    tb = go(MB)
    per = (tb - ts) / (MB - MS)
    log(f"StreamCounter: {per * 1000:.1f} ms/step = "
        f"{BATCH * (LEN - K + 1) / per / 1e6:.1f} M kmers/s (incl. final consolidate)")


def main():
    which = sys.argv[1]
    batches = make_batches(MB)
    log(f"device={jax.devices()[0].platform}")
    if which == "rounds":
        run_rounds(batches, 128)
    elif which == "rounds32":
        run_rounds(batches, 32)
    elif which == "sc":
        run_streamcounter(batches)
    elif which.startswith("sc-"):
        b, s = which.split("-")[1:]
        run_streamcounter(batches, int(b), int(s))


if __name__ == "__main__":
    main()
