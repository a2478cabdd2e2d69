"""MergeCounter (bitonic-merge engine) exactness vs the host oracle.

The engine must reproduce the reference counting semantics exactly:
canonical min(fw, rc) keys (itmo:utils/KmerUtils.java:59-61) with counts
saturating at 32767 (itmo:utils/NumUtils.java:21-26).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from metacherchant_tpu.ops.bitonic import (
    bitonic_merge, compact_sorted, merge_rle_compact, seg_totals)
from metacherchant_tpu.ops.kmers import SENTINEL
from metacherchant_tpu.ops.mergecount import MergeCounter
from metacherchant_tpu.counting import count_kmers_device, count_kmers_host


def _rand_sorted(rng, n, lo=0, hi=1 << 40):
    return np.sort(rng.integers(lo, hi, size=n).astype(np.int64))


def test_bitonic_merge_matches_numpy():
    rng = np.random.default_rng(0)
    for na, nb in [(16, 16), (64, 64), (128, 32), (1, 1), (256, 256)]:
        a, b = _rand_sorted(rng, na), _rand_sorted(rng, nb)
        got = np.asarray(bitonic_merge(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b]))
        assert np.array_equal(got[: na + nb], want)
        assert (got[na + nb:] == SENTINEL).all()


def test_bitonic_merge_carries_values():
    rng = np.random.default_rng(1)
    a, b = _rand_sorted(rng, 64), _rand_sorted(rng, 64)
    va = np.arange(64, dtype=np.int32)
    vb = np.arange(64, 128, dtype=np.int32)
    gk, gv = bitonic_merge(jnp.asarray(a), jnp.asarray(b),
                           jnp.asarray(va), jnp.asarray(vb))
    gk, gv = np.asarray(gk), np.asarray(gv)
    # every (key, value) pair must survive as a pair
    got = sorted(zip(gk.tolist(), gv.tolist()))[:128]
    want = sorted(zip(np.concatenate([a, b]).tolist(),
                      np.concatenate([va, vb]).tolist()))
    assert got == want


def test_bitonic_merge_sentinel_padding_ok():
    a = np.array([3, 7, SENTINEL, SENTINEL], dtype=np.int64)
    b = np.array([1, 7, 9, SENTINEL], dtype=np.int64)
    got = np.asarray(bitonic_merge(jnp.asarray(a), jnp.asarray(b)))
    assert got[:5].tolist() == [1, 3, 7, 7, 9]
    assert (got[5:] == SENTINEL).all()


def test_compact_sorted_moves_real_to_front():
    rng = np.random.default_rng(2)
    for n in [8, 64, 256, 1024]:
        keys = _rand_sorted(rng, n)
        cnts = rng.integers(1, 100, size=n).astype(np.int32)
        real = rng.random(n) < 0.4
        gk, gc, nr = compact_sorted(
            jnp.asarray(keys), jnp.asarray(cnts), jnp.asarray(real))
        gk, gc, nr = np.asarray(gk), np.asarray(gc), int(nr)
        assert nr == real.sum()
        assert np.array_equal(gk[:nr], keys[real])
        assert np.array_equal(gc[:nr], cnts[real])
        assert (gk[nr:] == SENTINEL).all() and (gc[nr:] == 0).all()


def test_seg_totals_at_run_lasts():
    keys = jnp.asarray(np.array([2, 2, 2, 5, 9, 9], dtype=np.int64))
    w = jnp.asarray(np.array([1, 2, 3, 4, 5, 6], dtype=np.int32))
    rs = np.asarray(seg_totals(keys, w))
    assert rs[2] == 6 and rs[3] == 4 and rs[5] == 11


def test_merge_rle_compact_counts_exact():
    rng = np.random.default_rng(3)
    store_n, run_n = 128, 128
    skeys = np.unique(rng.integers(0, 1000, size=96).astype(np.int64))
    scnts = rng.integers(1, 50, size=skeys.size).astype(np.int32)
    store_k = np.full(store_n, SENTINEL, np.int64)
    store_c = np.zeros(store_n, np.int32)
    store_k[: skeys.size], store_c[: skeys.size] = skeys, scnts
    raw = rng.integers(0, 1000, size=100).astype(np.int64)
    run = np.full(run_n, SENTINEL, np.int64)
    run[:100] = np.sort(raw)
    gk, gc, nd = merge_rle_compact(
        jnp.asarray(store_k), jnp.asarray(store_c), jnp.asarray(run))
    gk, gc, nd = np.asarray(gk), np.asarray(gc), int(nd)
    want: dict[int, int] = {int(k): int(c) for k, c in zip(skeys, scnts)}
    for x in raw:
        want[int(x)] = want.get(int(x), 0) + 1
    got = {int(k): int(c) for k, c in zip(gk[:nd], gc[:nd])}
    assert got == want
    assert np.array_equal(gk[:nd], np.sort(gk[:nd]))


@pytest.mark.parametrize("runs_per_merge", [2, 4])
def test_mergecounter_exact_vs_dict(runs_per_merge):
    rng = np.random.default_rng(4)
    k = 31
    mc = MergeCounter(run_cap_log2=12, runs_per_merge=runs_per_merge,
                      store_cap_log2=10)  # tiny store: forces growth
    want: dict[int, int] = {}
    for _ in range(7):  # odd count: finalize handles leftover runs
        codes = rng.integers(0, 4, size=(32, 100)).astype(np.int32)
        mc.add_codes(jnp.asarray(codes), k, None)
        from metacherchant_tpu.counting import _count_codes_into
        for row in codes:
            _count_codes_into(want, row, k, None)
    keys, cnts = mc.finalize()
    got = {int(a): int(b) for a, b in zip(keys, cnts)}
    assert got == want


def test_mergecounter_saturates_at_32767():
    mc = MergeCounter(run_cap_log2=12, runs_per_merge=2, store_cap_log2=10)
    # one read repeated: same k-mers counted many times
    codes = jnp.asarray(np.zeros((40, 100), np.int32))  # poly-A
    for _ in range(12):
        mc.add_codes(codes, 31, None)
    keys, cnts = mc.finalize()
    assert len(keys) == 1  # canonical poly-A 31-mer
    assert cnts[0] == 32767


def test_count_kmers_device_merge_engine_matches_host(tmp_path):
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), size=rng.integers(40, 300)))
            for _ in range(50)]
    f = tmp_path / "reads.fasta"
    f.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    got = count_kmers_device([str(f)], 31, engine="merge", table_log2=12,
                             batch=16, max_len=128)
    want = count_kmers_host([str(f)], 31)
    assert np.array_equal(got.keys, want.keys)
    assert np.array_equal(got.counts, want.counts)


def test_count_kmers_device_merge_engine_hashed(tmp_path):
    rng = np.random.default_rng(6)
    seqs = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(20)]
    f = tmp_path / "reads.fasta"
    f.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    got = count_kmers_device([str(f)], 63, hasher="poly", engine="merge",
                             table_log2=12, batch=16, max_len=256)
    want = count_kmers_host([str(f)], 63, hasher="poly")
    assert np.array_equal(got.keys, want.keys)
    assert np.array_equal(got.counts, want.counts)
