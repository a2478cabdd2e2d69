"""Device open-addressing table: insert/lookup/growth/saturation semantics."""
import collections

import numpy as np
import jax.numpy as jnp

from metacherchant_tpu.ops.hashtable import DeviceHashTable, SENTINEL, SATURATION


def _pad(keys, n):
    out = np.full(n, SENTINEL, np.int64)
    out[: len(keys)] = keys
    return jnp.asarray(out)


def test_insert_lookup_roundtrip():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1000, size=20000).astype(np.int64)
    t = DeviceHashTable(capacity_log2=4)  # force repeated growth
    for i in range(0, len(keys), 3000):
        t.insert_batch(_pad(keys[i:i + 3000], 4096))
    k, c = t.items_host()
    exp = collections.Counter(keys.tolist())
    assert len(k) == len(exp)
    assert all(exp[int(kk)] == int(cc) for kk, cc in zip(k, c))
    assert list(k) == sorted(k)

    q = np.array(list(exp.keys())[:50] + [999999, SENTINEL], np.int64)
    res = np.asarray(t.lookup(jnp.asarray(q)))
    assert all(res[i] == exp[int(q[i])] for i in range(50))
    assert res[50] == -1 and res[51] == -1


def test_negative_keys():
    # hashed regime produces negative int64 keys
    keys = np.array([-5, -5, -1, 0, 7, -(1 << 62)], np.int64)
    t = DeviceHashTable(capacity_log2=6)
    t.insert_batch(_pad(keys, 64))
    k, c = t.items_host()
    exp = collections.Counter(keys.tolist())
    assert dict(zip(k.tolist(), c.tolist())) == dict(exp)


def test_saturation_clamp():
    t = DeviceHashTable(capacity_log2=6)
    big = np.full(40000, 42, np.int64)
    for i in range(0, len(big), 4096):
        t.insert_batch(_pad(big[i:i + 4096], 4096))
    res = np.asarray(t.lookup(jnp.asarray(np.array([42], np.int64))))
    assert res[0] == SATURATION  # Short.MAX_VALUE (itmo:utils/NumUtils.java:21-26)


def test_count_insert_codes_fused():
    from metacherchant_tpu.dna import encode, canonical_code, kmer_to_code
    k = 7
    seq = "ACGTACGTTGCAACGTGTGTGTGTACACAC"
    packed = np.full((4, 32), -1, np.int32)
    packed[0, : len(seq)] = encode(seq)
    packed[1, : len(seq)] = encode(seq)
    t = DeviceHashTable(capacity_log2=6)
    t.count_insert_codes(jnp.asarray(packed), k, None)
    kk, cc = t.items_host()
    exp = collections.Counter(
        canonical_code(kmer_to_code(seq[i:i + k]), k)
        for i in range(len(seq) - k + 1))
    got = dict(zip(kk.tolist(), cc.tolist()))
    assert got == {key: 2 * v for key, v in exp.items()}
