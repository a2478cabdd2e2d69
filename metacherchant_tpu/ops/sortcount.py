"""Sort-based streaming k-mer counter: the TPU speed-of-light hot path.

Random-access probing (open addressing) pays data-dependent while_loop rounds;
on TPU the winning pattern is contiguous writes + bulk sorts:

  hot path:   extract canonical keys -> append into a device ring buffer
              (dynamic_update_slice: contiguous, no collisions, no loops)
  consolidate (buffer full): ONE sort + run-length-encode of the whole buffer,
              merged with the running (keys, counts) store by concat + sort +
              segment-sum -- all fixed-shape, loop-free ops
  finalize:   last consolidation; counts clamp at 32767
              (itmo:utils/NumUtils.java:21-26)

Lookups afterwards are vectorized binary searches on the sorted store
(kmer_map.KmerMap) -- pure gathers, no probing.

Capacity model: the append buffer holds `buffer_cap` raw keys; the store holds
up to `store_cap` distinct (key, count) pairs, growing by doubling when a
consolidation overflows it. All shapes are static per (buffer_cap, store_cap)
pair, so recompiles happen O(log growth) times.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .kmers import SENTINEL, canonical_kmers


@functools.partial(jax.jit, static_argnames=("k", "hasher"), donate_argnums=(0,))
def _append_kernel(buf, offset, codes, k: int, hasher: str | None):
    """Extract keys from a (B, L) code batch and append at buf[offset:].

    Invalid positions append SENTINEL (cheap: sorts to the end and is dropped
    by consolidation). Returns (buf, new_offset).
    """
    keys, _ = canonical_kmers(codes, k, hasher)
    flat = keys.ravel()
    buf = jax.lax.dynamic_update_slice(buf, flat, (offset,))
    return buf, offset + flat.shape[0]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _consolidate_kernel(store_keys, store_cnts, buf, offset):
    """Merge the append buffer into the sorted store.

    Pads un-appended buffer tail with SENTINEL, concatenates store + buffer,
    sorts, segment-sums weights (store entries carry their counts, buffer
    entries weight 1, SENTINEL weight 0), and re-packs into the store shape.
    Returns (store_keys, store_cnts, n_distinct, overflowed).
    """
    n = buf.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    buf = jnp.where(lane < offset, buf, SENTINEL)
    all_keys = jnp.concatenate([store_keys, buf])
    all_w = jnp.concatenate(
        [store_cnts, jnp.ones((n,), jnp.int32)])
    all_w = jnp.where(all_keys == SENTINEL, 0, all_w)
    order = jnp.argsort(all_keys)
    s = all_keys[order]
    w = all_w[order]
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    seg = (jnp.cumsum(first) - 1).astype(jnp.int32)
    m = store_keys.shape[0]
    cnts = jax.ops.segment_sum(w, seg, num_segments=m + n)
    keys = jax.ops.segment_max(s, seg, num_segments=m + n)
    keys = jnp.where(cnts > 0, keys, SENTINEL)
    cnts = jnp.where(keys == SENTINEL, 0, cnts)
    n_distinct = jnp.sum(keys != SENTINEL).astype(jnp.int32)
    overflowed = n_distinct > m
    return keys[:m], cnts[:m], n_distinct, overflowed


def fast_scalar(x) -> int:
    """Device scalar -> host int via a cross-backend copy.

    On this session's tunneled device the direct scalar readback path costs
    minutes; a device_put to the host CPU backend completes in seconds. On a
    normal TPU host both are microseconds."""
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(x, cpu)))


class StreamCounter:
    """Device streaming counter with a loop-free hot path.

    Syncs happen ONLY at consolidations (once per buffer_cap raw keys) and at
    finalize -- amortized to ~zero per key.
    """

    def __init__(self, buffer_cap_log2: int = 24, store_cap_log2: int = 22):
        self.buffer_cap = 1 << buffer_cap_log2
        self.store_cap = 1 << store_cap_log2
        self.buf = jnp.full((self.buffer_cap,), SENTINEL, jnp.int64)
        self.offset = jnp.int32(0)
        self._offset_host = 0
        self.store_keys = jnp.full((self.store_cap,), SENTINEL, jnp.int64)
        self.store_cnts = jnp.zeros((self.store_cap,), jnp.int32)
        self._live = 0  # exact live store entries (updated at consolidations)

    def add_codes(self, codes: jax.Array, k: int, hasher: str | None) -> None:
        incoming = codes.shape[0] * codes.shape[1]
        if self._offset_host + incoming > self.buffer_cap:
            self._consolidate()
        self.buf, self.offset = _append_kernel(
            self.buf, self.offset, codes, k, hasher)
        self._offset_host += incoming

    def _consolidate(self) -> None:
        if self._offset_host == 0:
            return
        # worst case every buffered key is new and distinct
        while self._live + self._offset_host > self.store_cap:
            self._grow_store()
        (self.store_keys, self.store_cnts, n_distinct,
         overflowed) = _consolidate_kernel(
            self.store_keys, self.store_cnts, self.buf, self.offset)
        self._live = fast_scalar(n_distinct)
        assert self._live <= self.store_cap
        self.buf = jnp.full((self.buffer_cap,), SENTINEL, jnp.int64)
        self.offset = jnp.int32(0)
        self._offset_host = 0

    def _grow_store(self) -> None:
        old_k, old_c = self.store_keys, self.store_cnts
        self.store_cap *= 2
        self.store_keys = jnp.concatenate(
            [old_k, jnp.full((self.store_cap // 2,), SENTINEL, jnp.int64)])
        self.store_cnts = jnp.concatenate(
            [old_c, jnp.zeros((self.store_cap // 2,), jnp.int32)])

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """Returns key-sorted (keys, counts) on host, counts clamped at 32767."""
        self._consolidate()
        sk = np.asarray(self.store_keys[: max(self._live, 1)])[: self._live]
        sc = np.asarray(self.store_cnts[: max(self._live, 1)])[: self._live]
        order = np.argsort(sk, kind="stable")
        return sk[order], np.minimum(sc[order], 32767).astype(np.int32)
