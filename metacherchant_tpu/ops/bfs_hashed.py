"""Hashed-regime (k > 31) whole-environment BFS as a single device dispatch.

The exact-regime device engine (ops/bfs_device.py) keys states by one int64
code; arbitrary k needs W = ceil(k/32) words. States here are (N, W) uint64
rows, 2-bit packed big-endian (nucleotide p in word p//32 at bit offset
62 - 2*(p%32)), so word-wise lexicographic order equals string order over the
numeric alphabet. Everything runs inside one jitted lax.while_loop:

- neighbors: multiword funnel shifts (semantics of StringUtils.java:8-32,
  without strings)
- coverage: fused fw/rc polynomial / FNV-1a canonical hash recomputed from the
  packed words (unrolled static-k loop; constants and Java-long wraparound per
  src/utils/PolynomialHash.java:7-28, src/utils/FNV1AHash.java:8-42), probed
  against the SORTED (keys, counts) map arrays via searchsorted
- visited set: open-addressing table of multiword ORIENTED states (Java keys
  its distance map by the literal k-mer string, OneSequenceCalculator.java:200)
- dedup: lexsort over word columns

MAX_RADIUS is exact under layer synchrony; MAX_KMERS / trim are
admission-order-dependent and stay on the host engine
(algo/environment_hashed.py), same division as the exact regime.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .kmers import FNV_OFFSET_BASIS, FNV_PRIME, POLY_BASE


def words_of(k: int) -> int:
    return (k + 31) // 32


def _last_mask(k: int) -> np.uint64:
    """Mask of used bits in the last word."""
    k_last = k - 32 * (words_of(k) - 1)
    if k_last == 32:
        return np.uint64(0xFFFFFFFFFFFFFFFF)
    return np.uint64(((1 << (2 * k_last)) - 1) << (64 - 2 * k_last))


def pack_rows_np(rows: np.ndarray, k: int) -> np.ndarray:
    """(N, k) uint8 nucleotide codes -> (N, W) uint64 packed states."""
    rows = np.asarray(rows, np.uint64)
    N = rows.shape[0]
    W = words_of(k)
    out = np.zeros((N, W), np.uint64)
    for p in range(k):
        out[:, p // 32] |= rows[:, p] << np.uint64(62 - 2 * (p % 32))
    return out


def unpack_rows_np(packed: np.ndarray, k: int) -> np.ndarray:
    """(N, W) uint64 -> (N, k) uint8."""
    packed = np.asarray(packed, np.uint64)
    N = packed.shape[0]
    out = np.empty((N, k), np.uint8)
    for p in range(k):
        out[:, p] = (packed[:, p // 32] >> np.uint64(62 - 2 * (p % 32))) & np.uint64(3)
    return out


def _mw_neighbors(states: jax.Array, k: int, direction: int) -> jax.Array:
    """(N, W) states -> (N, D, W) neighbors, interleaved (l_n, r_n) per
    nucleotide for direction 0 (StringUtils.allNeighbors order)."""
    W = states.shape[-1]
    lm = _last_mask(k)
    nucs = jnp.arange(4, dtype=jnp.uint64)

    # left neighbor n + s[:-1]: shift right 2 bits across words, nuc at front
    sr = [states[:, i] >> jnp.uint64(2) for i in range(W)]
    for i in range(1, W):
        sr[i] = sr[i] | (states[:, i - 1] << jnp.uint64(62))
    left = jnp.stack(sr, axis=-1)[:, None, :].repeat(4, axis=1)
    left = left.at[:, :, 0].set(left[:, :, 0] | (nucs[None, :] << jnp.uint64(62)))
    left = left.at[:, :, W - 1].set(left[:, :, W - 1] & lm)

    # right neighbor s[1:] + n: shift left 2 bits across words, nuc at k-1
    sl = [states[:, i] << jnp.uint64(2) for i in range(W)]
    for i in range(W - 1):
        sl[i] = sl[i] | (states[:, i + 1] >> jnp.uint64(62))
    right = jnp.stack(sl, axis=-1)[:, None, :].repeat(4, axis=1)
    k_last = k - 32 * (W - 1)
    right = right.at[:, :, W - 1].set(
        (right[:, :, W - 1] & lm) | (nucs[None, :] << jnp.uint64(64 - 2 * k_last)))

    if direction == -1:
        return left
    if direction == 1:
        return right
    out = jnp.stack([left, right], axis=2)  # (N, 4, 2, W)
    return out.reshape(states.shape[0], 8, W)


def _mw_hash(states: jax.Array, k: int, hasher: str) -> jax.Array:
    """(N, W) -> (N,) int64 canonical hash (signed min of fused fw/rc)."""
    N, W = states.shape
    if hasher == "poly":
        fw = jnp.ones((N,), jnp.uint64)
        rc = jnp.ones((N,), jnp.uint64)
    else:
        fw = jnp.full((N,), jnp.uint64(FNV_OFFSET_BASIS & ((1 << 64) - 1)))
        rc = fw
    prime = jnp.uint64(FNV_PRIME)
    five = jnp.uint64(POLY_BASE)
    for t in range(k):
        cf = (states[:, t // 32] >> jnp.uint64(62 - 2 * (t % 32))) & jnp.uint64(3)
        pr = k - 1 - t
        cr = ((states[:, pr // 32] >> jnp.uint64(62 - 2 * (pr % 32)))
              & jnp.uint64(3)) ^ jnp.uint64(3)
        if hasher == "poly":
            fw = fw * five + cf
            rc = rc * five + cr
        else:
            fw = (fw ^ cf) * prime
            rc = (rc ^ cr) * prime
    fw = jax.lax.bitcast_convert_type(fw, jnp.int64)
    rc = jax.lax.bitcast_convert_type(rc, jnp.int64)
    return jnp.minimum(fw, rc)


def _mw_slot(states: jax.Array, cmask: jax.Array) -> jax.Array:
    """(N, W) -> (N,) int32 open-addressing start slot (fold words, mix)."""
    from .hashtable import _mix64
    h = states[:, 0]
    for i in range(1, states.shape[-1]):
        h = (h * jnp.uint64(0x9E3779B97F4A7C15)) ^ states[:, i]
    m = _mix64(jax.lax.bitcast_convert_type(h, jnp.int64))
    return (jax.lax.bitcast_convert_type(m, jnp.uint64) & cmask).astype(jnp.int32)


def _rows_eq(a: jax.Array, b: jax.Array) -> jax.Array:
    """Row-wise equality of (..., W) vs (..., W)."""
    return (a == b).all(axis=-1)


def _mw_unique(states: jax.Array, valid: jax.Array):
    """Sort rows (valid first, then lexicographic) and invalidate duplicates.
    Returns (states, valid) with valid unique rows compacted to the front."""
    W = states.shape[-1]
    keys = tuple(states[:, i] for i in range(W - 1, -1, -1)) + (~valid,)
    order = jnp.lexsort(keys)
    s = states[order]
    v = valid[order]
    dup = jnp.concatenate([jnp.zeros((1,), bool),
                           _rows_eq(s[1:], s[:-1]) & v[1:] & v[:-1]])
    v = v & ~dup
    # compact: stable sort by invalid flag
    order2 = jnp.argsort(~v, stable=True)
    return s[order2], v[order2]


def _mwset_lookup(skeys: jax.Array, used: jax.Array, q: jax.Array,
                  qvalid: jax.Array) -> jax.Array:
    """Membership of (N, W) rows in the multiword open-addressing set."""
    C = skeys.shape[0]
    cmask = jnp.uint64(C - 1)
    slot0 = _mw_slot(q, cmask)
    active0 = qvalid
    found0 = jnp.zeros(qvalid.shape, bool)

    def cond(s):
        active, _, _, r = s
        return jnp.logical_and(jnp.any(active), r < C)

    def body(s):
        active, slot, found, r = s
        hit = active & used[slot] & _rows_eq(skeys[slot], q)
        found = found | hit
        stop = hit | ~used[slot]
        active = active & ~stop
        slot = jnp.where(active, (slot + 1) & jnp.int32(C - 1), slot)
        return active, slot, found, r + 1

    _, _, found, _ = jax.lax.while_loop(cond, body,
                                        (active0, slot0, found0, jnp.int32(0)))
    return found


def _mwset_insert(skeys: jax.Array, used: jax.Array, bkeys: jax.Array,
                  bvalid: jax.Array):
    """Insert unique valid rows; returns (skeys, used, n_new)."""
    C = skeys.shape[0]
    cmask = jnp.uint64(C - 1)
    slot0 = _mw_slot(bkeys, cmask)

    def cond(s):
        _, _, active, _, r, _ = s
        return jnp.logical_and(jnp.any(active), r < C)

    def body(s):
        skeys, used, active, slot, r, new = s
        occupied = used[slot]
        match = active & occupied & _rows_eq(skeys[slot], bkeys)
        empty = active & ~occupied
        claim = jnp.where(empty, slot, C)
        skeys = skeys.at[claim].set(bkeys, mode="drop")
        used = used.at[claim].set(True, mode="drop")
        winner = empty & _rows_eq(skeys[slot], bkeys)
        done = match | winner
        active = active & ~done
        slot = jnp.where(active, (slot + 1) & jnp.int32(C - 1), slot)
        return skeys, used, active, slot, r + 1, new + jnp.sum(winner).astype(jnp.int32)

    skeys, used, _, _, _, new = jax.lax.while_loop(
        cond, body, (skeys, used, bvalid, slot0, jnp.int32(0), jnp.int32(0)))
    return skeys, used, new


def _map_lookup(mkeys: jax.Array, mcounts: jax.Array, q: jax.Array) -> jax.Array:
    """Sorted-array count probe (absent -> -1)."""
    if mkeys.shape[0] == 0:
        return jnp.full(q.shape, -1, jnp.int32)
    pos = jnp.searchsorted(mkeys, q)
    pos = jnp.minimum(pos, mkeys.shape[0] - 1)
    return jnp.where(mkeys[pos] == q, mcounts[pos], -1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("k", "hasher", "direction", "frontier_cap", "visited_log2"))
def device_bfs_mw(seeds: jax.Array, svalid: jax.Array, mkeys: jax.Array,
                  mcounts: jax.Array, min_occ: int, max_radius: int, k: int,
                  hasher: str, direction: int, frontier_cap: int,
                  visited_log2: int):
    """Full hashed-regime BFS on device.

    seeds: (S, W) packed oriented states + (S,) validity.
    Returns (visited skeys (C, W), used (C,), n_visited, overflowed).
    """
    W = words_of(k)
    D = 8 if direction == 0 else 4
    vcap = 1 << visited_log2
    skeys = jnp.zeros((vcap, W), jnp.uint64)
    used = jnp.zeros((vcap,), bool)
    useeds, uvalid = _mw_unique(seeds, svalid)
    skeys, used, n0 = _mwset_insert(skeys, used, useeds, uvalid)
    frontier = jnp.zeros((frontier_cap, W), jnp.uint64)
    fvalid = jnp.zeros((frontier_cap,), bool)
    ncopy = min(useeds.shape[0], frontier_cap)
    frontier = jax.lax.dynamic_update_slice(frontier, useeds[:ncopy], (0, 0))
    fvalid = jax.lax.dynamic_update_slice(fvalid, uvalid[:ncopy], (0,))

    def cond(state):
        _, fvalid, _, _, _, d, overflow = state
        return jnp.any(fvalid) & (d <= max_radius) & ~overflow

    def body(state):
        frontier, fvalid, skeys, used, count, d, overflow = state
        cand = _mw_neighbors(frontier, k, direction).reshape(-1, W)  # (F*D, W)
        cvalid = jnp.repeat(fvalid, D)
        occ = _map_lookup(mkeys, mcounts, _mw_hash(cand, k, hasher))
        cvalid = cvalid & (occ >= min_occ)
        cand, cvalid = _mw_unique(cand, cvalid)
        seen = _mwset_lookup(skeys, used, cand, cvalid)
        fresh_valid = cvalid & ~seen
        # compact fresh rows to the front
        order = jnp.argsort(~fresh_valid, stable=True)
        cand, fresh_valid = cand[order], fresh_valid[order]
        n_fresh = jnp.sum(fresh_valid)
        overflow = overflow | (n_fresh > frontier_cap)
        skeys, used, new = _mwset_insert(skeys, used, cand, fresh_valid)
        next_frontier = jax.lax.dynamic_slice(cand, (0, 0), (frontier_cap, W))
        next_fvalid = jax.lax.dynamic_slice(fresh_valid, (0,), (frontier_cap,))
        return (next_frontier, next_fvalid, skeys, used, count + new, d + 1,
                overflow)

    frontier, fvalid, skeys, used, count, _, overflow = jax.lax.while_loop(
        cond, body, (frontier, fvalid, skeys, used, n0, jnp.int32(1),
                     jnp.bool_(False)))
    return skeys, used, count, overflow


def run_device_bfs_hashed(seed_rows: np.ndarray, kmap, k: int, min_occ: int,
                          hasher: str, direction: int,
                          max_radius: int | None) -> np.ndarray:
    """Host wrapper: (S, k) uint8 seed rows -> (V, k) uint8 visited oriented
    rows (unordered). kmap: KmerMap with sorted (keys, counts)."""
    if seed_rows.shape[0] == 0:
        return np.empty((0, k), np.uint8)
    W = words_of(k)
    packed = pack_rows_np(seed_rows, k)
    scap = 1 << int(np.ceil(np.log2(packed.shape[0] + 1)))
    seeds = np.zeros((scap, W), np.uint64)
    svalid = np.zeros((scap,), bool)
    seeds[:packed.shape[0]] = packed
    svalid[:packed.shape[0]] = True
    est = max(len(kmap), 1)
    visited_log2 = max(int(np.ceil(np.log2(2 * est / 0.5 + 2))), 6)
    frontier_cap = 1 << max(int(np.ceil(np.log2(2 * est + 2))), 6)
    mr = max_radius if max_radius is not None else (1 << 30)
    mkeys, mcounts = kmap.device_arrays()
    skeys, used, count, overflow = device_bfs_mw(
        jnp.asarray(seeds), jnp.asarray(svalid), mkeys, mcounts, min_occ, mr,
        k, hasher, direction, frontier_cap, visited_log2)
    if bool(overflow):  # pragma: no cover - caps sized from table
        raise RuntimeError("device BFS frontier overflow")
    used = np.asarray(used)
    return unpack_rows_np(np.asarray(skeys)[used], k)
