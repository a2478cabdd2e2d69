"""Multiword (k>31) device BFS vs the exact host hashed engine."""
import numpy as np
import pytest

from metacherchant_tpu.kmer_map import KmerMap
from metacherchant_tpu.dna import encode, reverse_complement
from metacherchant_tpu.ops.kmers import hash_str, hash_codes_np
from metacherchant_tpu.ops.bfs_hashed import (
    pack_rows_np, unpack_rows_np, run_device_bfs_hashed, words_of)
from metacherchant_tpu.algo.environment_hashed import (
    _bfs_layer_fifo, _neighbor_block)


def _setup(seed, k, n_reads=50, read_len=80, glen=350):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), glen))
    reads = []
    for _ in range(n_reads):
        i = rng.integers(0, glen - read_len)
        r = genome[i:i + read_len]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    gene = genome[100:100 + k + 40]
    from collections import Counter
    c = Counter()
    for r in reads:
        for i in range(len(r) - k + 1):
            c[hash_str(r[i:i + k], "poly")] += 1
    return KmerMap.from_dict(dict(c)), gene


@pytest.mark.parametrize("k", [33, 41, 64, 65])
def test_pack_unpack_roundtrip(k):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 4, size=(37, k)).astype(np.uint8)
    packed = pack_rows_np(rows, k)
    assert packed.shape == (37, words_of(k))
    assert (unpack_rows_np(packed, k) == rows).all()


@pytest.mark.parametrize("k", [33, 65])
def test_mw_hash_matches_oracle(k):
    import jax.numpy as jnp
    from metacherchant_tpu.ops.bfs_hashed import _mw_hash
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 4, size=(29, k)).astype(np.uint8)
    packed = jnp.asarray(pack_rows_np(rows, k))
    for hasher in ("poly", "fnv1a"):
        got = np.asarray(_mw_hash(packed, k, hasher))
        want = hash_codes_np(rows, hasher)
        assert (got == want).all()


@pytest.mark.parametrize("k", [33, 65])
def test_mw_neighbors_match_host(k):
    import jax.numpy as jnp
    from metacherchant_tpu.ops.bfs_hashed import _mw_neighbors
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 4, size=(11, k)).astype(np.uint8)
    packed = jnp.asarray(pack_rows_np(rows, k))
    for direction in (-1, 1, 0):
        got = np.asarray(_mw_neighbors(packed, k, direction))
        want = _neighbor_block(rows, direction)
        D = want.shape[1]
        got_rows = unpack_rows_np(got.reshape(-1, words_of(k)), k).reshape(11, D, k)
        assert (got_rows == want).all(), direction


@pytest.mark.parametrize("k", [33, 65])
@pytest.mark.parametrize("direction", [-1, 1, 0])
@pytest.mark.parametrize("max_radius", [None, 6])
def test_device_bfs_matches_host_engine(k, direction, max_radius):
    kmap, gene = _setup(3, k)
    codes = encode(gene)
    wins = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint8)
    occ = kmap.get_many(hash_codes_np(wins, "poly"))
    seed_rows = [w for w, o in zip(wins, occ) if o >= 1]
    if not seed_rows:
        pytest.skip("no seeds in this setup")
    host = _bfs_layer_fifo(seed_rows, kmap, k, 1, "poly", direction,
                           max_radius, None, False)
    want = {b for b in host}
    got_rows = run_device_bfs_hashed(np.stack(seed_rows), kmap, k, 1, "poly",
                                     direction, max_radius)
    got = {row.tobytes() for row in got_rows}
    assert got == want
