"""Hashed-regime (k>31 / --forcehash) environment engine tests.

Oracle: a direct transliteration of the reference's String-keyed FIFO BFS
(src/algo/OneSequenceCalculator.java:137-295) probing via the per-string hash
oracle. The layer-batched engine must reproduce it exactly, including the
order-dependent MAX_KMERS admission and lastKmers/trim semantics.
"""
import numpy as np
import pytest

from metacherchant_tpu.kmer_map import KmerMap
from metacherchant_tpu.dna import normalize, reverse_complement
from metacherchant_tpu.ops.kmers import hash_str
from metacherchant_tpu.algo.environment_hashed import build_environment_hashed
from metacherchant_tpu.algo.environment import build_environment

_NUCS = "AGCT"


def _neighbors(kmer, direction):
    left = [n + kmer[:-1] for n in _NUCS]
    right = [kmer[1:] + n for n in _NUCS]
    if direction == -1:
        return left
    if direction == 1:
        return right
    out = []
    for l, r in zip(left, right):
        out.extend((l, r))
    return out


def _oracle_env(sequences, k, kmap, min_occ, hasher, both_directions,
                max_radius, max_kmers, trim, hic_sequences=None):
    """String-FIFO reference BFS -> dict normalized kmer -> count, or None on fail."""
    def occ(s):
        return kmap.get(hash_str(s, hasher))

    seeds = []
    for seq in list(sequences) + list(hic_sequences or []):
        for i in range(len(seq) - k + 1):
            w = seq[i:i + k]
            if occ(w) >= min_occ:
                seeds.append(w)
    dirs = [0] if both_directions else [-1, 1]
    union = set()
    fail = True
    for direction in dirs:
        if not seeds:
            continue
        fail = False
        dist, queue, last = {}, [], set()
        for s in seeds:
            if s not in dist:
                dist[s] = 0
            queue.append(s)
        head = 0
        while head < len(queue):
            cur = queue[head]
            head += 1
            dd = dist[cur] + 1
            for nb in _neighbors(cur, direction):
                if occ(nb) >= min_occ:
                    allowed = nb not in dist
                    if allowed and max_kmers is not None and len(dist) >= max_kmers:
                        allowed = False
                    if allowed and max_radius is not None and dd > max_radius:
                        allowed = False
                    if allowed:
                        queue.append(nb)
                        dist[nb] = dd
                    elif trim:
                        last.add(cur)
        visited = set(dist)
        if trim:
            reached = set(last)
            q2 = list(last)
            h2 = 0
            while h2 < len(q2):
                cur = q2[h2]
                h2 += 1
                for nb in _neighbors(cur, -direction):
                    if nb in visited and nb not in reached:
                        reached.add(nb)
                        q2.append(nb)
            visited = reached
        union |= visited
    if fail:
        return None
    return {s: kmap.get(hash_str(s, hasher)) for s in
            sorted({normalize(s) for s in union})}


def _random_setup(seed, k=33, n_reads=60, read_len=90):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), 400))
    reads = []
    for _ in range(n_reads):
        i = rng.integers(0, len(genome) - read_len)
        r = genome[i:i + read_len]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    gene = genome[150:150 + 60]
    return reads, gene


def _count(reads, k, hasher):
    from collections import Counter
    c = Counter()
    for r in reads:
        for i in range(len(r) - k + 1):
            c[hash_str(r[i:i + k], hasher)] += 1
    return KmerMap.from_dict(dict(c))


@pytest.mark.parametrize("hasher", ["poly", "fnv1a"])
@pytest.mark.parametrize("cfg", [
    dict(both_directions=False, max_radius=None, max_kmers=None, trim=False),
    dict(both_directions=True, max_radius=None, max_kmers=None, trim=False),
    dict(both_directions=False, max_radius=7, max_kmers=None, trim=False),
    dict(both_directions=False, max_radius=7, max_kmers=None, trim=True),
    dict(both_directions=False, max_radius=None, max_kmers=40, trim=False),
    dict(both_directions=True, max_radius=5, max_kmers=35, trim=True),
])
def test_hashed_engine_matches_string_oracle(hasher, cfg):
    k = 33
    reads, gene = _random_setup(1, k=k)
    kmap = _count(reads, k, hasher)
    env = build_environment_hashed([gene], k, kmap, 1, hasher, **cfg)
    oracle = _oracle_env([gene], k, kmap, 1, hasher, **cfg)
    assert oracle is not None and not env.fail
    got = env.as_dict()
    assert got == oracle


def test_hashed_engine_fail_when_no_seeds():
    k = 33
    reads, _ = _random_setup(2, k=k)
    kmap = _count(reads, k, "poly")
    gene = "A" * 50  # poly-A absent from random genome (overwhelmingly)
    env = build_environment_hashed([gene], k, kmap, 1, "poly",
                                   both_directions=False, max_radius=None,
                                   max_kmers=None, trim=False)
    assert env.fail


def test_forcehash_matches_exact_regime_smallk():
    """k<=31 with --forcehash must yield the same normalized environment as
    the exact regime (keys differ; the walked string graph is identical)."""
    k = 21
    reads, gene = _random_setup(3, k=k, n_reads=50, read_len=70)
    kmap_h = _count(reads, k, "poly")
    kmap_e = _count(reads, k, None)
    for cfg in (dict(both_directions=False, max_radius=6, max_kmers=None, trim=False),
                dict(both_directions=True, max_radius=None, max_kmers=None, trim=True)):
        env_h = build_environment_hashed([gene], k, kmap_h, 1, "poly", **cfg)
        env_e = build_environment([gene], k, kmap_e, 1, **cfg)
        assert env_h.as_dict() == env_e.as_dict()
        assert env_h.extend_count == env_e.extend_count


def test_hashed_extend_count_matches_oracle():
    k = 33
    reads, gene = _random_setup(4, k=k)
    kmap = _count(reads, k, "poly")
    env = build_environment_hashed([gene], k, kmap, 1, "poly",
                                   both_directions=False, max_radius=8,
                                   max_kmers=None, trim=False)
    sub = env.as_dict()
    n = 0
    for kmer in sub:
        outside = 0
        for nb in _neighbors(kmer, 0):
            if normalize(nb) not in sub and kmap.get(hash_str(nb, "poly")) >= 1:
                outside += 1
        if outside == 1:
            n += 1
    assert env.extend_count == n


def test_scalar_poly_engine_equals_layer_engine():
    """_bfs_scalar_poly (O(1) sliding-hash FIFO) visits exactly the states of
    _bfs_layer_fifo across directions and termination modes."""
    import numpy as np
    from metacherchant_tpu.kmer_map import KmerMap
    from metacherchant_tpu.ops.kmers import hash_codes_np
    from metacherchant_tpu.dna import encode
    from metacherchant_tpu.algo import environment_hashed as EH

    rng = np.random.default_rng(17)
    k = 37
    genome = "".join(np.array(list("AGCT"))[rng.integers(0, 4, 4000)])
    wins = np.array([[int(c) for c in encode(genome[i:i + k])]
                     for i in range(len(genome) - k + 1)], np.int8)
    kmap = KmerMap.from_pairs(hash_codes_np(wins, "poly"),
                              np.full(wins.shape[0], 3, np.int64))
    codes = encode(genome[2000:2100])
    swins = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint8)
    seeds = list(swins[EH._occ_block(kmap, swins, "poly") >= 3])
    for direction in (-1, 1, 0):
        for mr, mk, trim in ((None, None, False), (25, None, True),
                             (None, 200, False)):
            a = EH._bfs_scalar_poly(seeds, kmap, k, 3, direction, mr, mk, trim)
            b = EH._bfs_layer_fifo(seeds, kmap, k, 3, "poly", direction, mr,
                                   mk, trim)
            assert set(a.keys()) == set(b.keys())
