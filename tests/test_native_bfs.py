"""Native (C++) FIFO BFS engine vs the Python oracle engines.

The native engine must replicate the Python FIFO engines state-for-state --
including the order-dependent MAX_KMERS admission (TerminationMode.java:38-39)
and lastKmers marking (OneSequenceCalculator.java:209) -- in both regimes.
"""
import numpy as np
import pytest

from metacherchant_tpu import native
from metacherchant_tpu.counting import count_sequences_host
from metacherchant_tpu.algo import environment as env_mod
from metacherchant_tpu.algo import environment_hashed as envh_mod
from metacherchant_tpu.algo.environment import (
    bfs_fifo, seed_codes_of_sequences, trim_paths)

pytestmark = pytest.mark.skipif(
    not native.bfs_available(), reason="native bfs unavailable")


def _random_seqs(rng, n=30, lo=60, hi=220):
    return ["".join(rng.choice(list("ACGT"), size=rng.integers(lo, hi)))
            for _ in range(n)]


def _python_bfs_fifo(seed_list, kmap, k, min_occ, direction, max_radius,
                     max_kmers, collect_last):
    """Run the pure-Python FIFO engine (native path disabled)."""
    import unittest.mock as mock
    with mock.patch.object(native, "bfs_available", return_value=False):
        return bfs_fifo(seed_list, kmap, k, min_occ, direction,
                        max_radius, max_kmers, collect_last)


@pytest.mark.parametrize("direction", [-1, 1, 0])
@pytest.mark.parametrize("caps", [
    (None, None, False),
    (5, None, False),
    (None, 40, False),
    (3, None, True),
    (None, 25, True),
    (4, 60, True),
])
def test_exact_engine_equals_python(direction, caps):
    max_radius, max_kmers, collect_last = caps
    rng = np.random.default_rng(42)
    seqs = _random_seqs(rng)
    k = 15
    kmap = count_sequences_host(seqs, k)
    seeds = seed_codes_of_sequences(seqs[:2], k, kmap, 1)
    want = _python_bfs_fifo(seeds, kmap, k, 1, direction,
                            max_radius, max_kmers, collect_last)
    got_vis, got_last = native.bfs_exact(
        kmap.keys, kmap.counts, np.asarray(seeds, np.int64), k, 1,
        direction, max_radius, max_kmers, collect_last)
    assert np.array_equal(got_vis, want.visited)
    assert np.array_equal(got_last, want.last_kmers)


def test_exact_engine_trim_path_equal():
    rng = np.random.default_rng(7)
    seqs = _random_seqs(rng, n=20)
    k = 13
    kmap = count_sequences_host(seqs, k)
    seeds = seed_codes_of_sequences(seqs[:1], k, kmap, 1)
    for direction in (-1, 1):
        want = _python_bfs_fifo(seeds, kmap, k, 1, direction, 8, None, True)
        got_vis, got_last = native.bfs_exact(
            kmap.keys, kmap.counts, np.asarray(seeds, np.int64), k, 1,
            direction, 8, None, True)
        assert np.array_equal(got_vis, want.visited)
        assert np.array_equal(got_last, want.last_kmers)
        want_keep = trim_paths(want.visited, want.last_kmers, k, direction)
        got_keep = trim_paths(got_vis, got_last, k, direction)
        assert np.array_equal(got_keep, want_keep)


@pytest.mark.parametrize("hasher", ["poly", "fnv1a"])
@pytest.mark.parametrize("direction", [-1, 1, 0])
def test_hashed_engine_equals_layer_engine(hasher, direction):
    rng = np.random.default_rng(3)
    seqs = _random_seqs(rng, n=15, lo=80, hi=160)
    k = 41
    kmap = count_sequences_host(seqs, k, hasher=hasher)
    from metacherchant_tpu.dna import encode
    seed_rows = []
    for s in seqs[:2]:
        codes = encode(s)
        wins = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint8)
        occ = envh_mod._occ_block(kmap, wins, hasher)
        seed_rows.extend(wins[occ >= 1])
    want = envh_mod._bfs_layer_fifo(seed_rows, kmap, k, 1, hasher,
                                    direction, None, None, trim=False)
    got_vis, _ = native.bfs_hashed(
        kmap.keys, kmap.counts, np.stack(seed_rows), k, 1, direction,
        None, None, hasher, collect_last=False)
    got = {row.tobytes() for row in got_vis}
    assert got == set(want.keys())


@pytest.mark.parametrize("hasher", ["poly", "fnv1a"])
def test_hashed_engine_caps_and_trim_equal(hasher):
    rng = np.random.default_rng(11)
    seqs = _random_seqs(rng, n=12, lo=90, hi=150)
    k = 37
    kmap = count_sequences_host(seqs, k, hasher=hasher)
    from metacherchant_tpu.dna import encode
    seed_rows = []
    for s in seqs[:1]:
        codes = encode(s)
        wins = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint8)
        occ = envh_mod._occ_block(kmap, wins, hasher)
        seed_rows.extend(wins[occ >= 1])
    for max_radius, max_kmers, trim in [(6, None, False), (None, 30, False),
                                        (5, None, True), (None, 20, True)]:
        want = envh_mod._bfs_layer_fifo(
            seed_rows, kmap, k, 1, hasher, 0, max_radius, max_kmers, trim)
        got_vis, got_last = native.bfs_hashed(
            kmap.keys, kmap.counts, np.stack(seed_rows), k, 1, 0,
            max_radius, max_kmers, hasher, collect_last=trim)
        rows = {row.tobytes(): row for row in got_vis}
        if trim:
            keep = envh_mod._trim(rows, {r.tobytes() for r in got_last}, 0)
            rows = {b: rows[b] for b in keep}
        assert set(rows.keys()) == set(want.keys()), (max_radius, max_kmers, trim)


def test_build_environment_native_equals_python(tmp_path):
    """End-to-end build_environment: native default vs MC_NATIVE_BFS=0 path."""
    import unittest.mock as mock
    rng = np.random.default_rng(5)
    seqs = _random_seqs(rng, n=25)
    k = 17
    kmap = count_sequences_host(seqs, k)
    from metacherchant_tpu.algo.environment import build_environment
    gene = [seqs[0]]
    for both, trim, mr, mk in [(False, False, None, None), (True, True, 10, None),
                               (False, False, None, 50)]:
        got = build_environment(gene, k, kmap, 1, both, mr, mk, trim)
        with mock.patch.object(native, "bfs_available", return_value=False):
            want = build_environment(gene, k, kmap, 1, both, mr, mk, trim)
        assert np.array_equal(got.codes, want.codes)
        assert np.array_equal(got.counts, want.counts)
        assert got.extend_count == want.extend_count
