"""Hashed-regime (k > 31 / --forcehash) environment BFS over string states.

The reference's BFS always walks literal k-mer strings; in the hashed regime
only the MAP KEY changes (64-bit canonical hash instead of the 2-bit code,
src/algo/OneSequenceCalculator.java:89-96 getKmerKey). Arbitrary k cannot pack
into one int64, so this host engine keeps string states and batches coverage
probes through the vectorized hash oracle. A multiword packed-code device path
is the planned optimization (SURVEY §7.3).

getKmerKey(s) = hasher.hash(normalizeDna(s)) == hasher.hash(s): both poly and
FNV-1a hashes are orientation-invariant (min of fw/rc), so normalization before
hashing is redundant -- replicated here by hashing the state directly.
"""
from __future__ import annotations

import numpy as np

from ..kmer_map import KmerMap
from ..dna import normalize
from ..ops.kmers import hash_str
from .environment import Environment

_NUCS = "AGCT"  # neighbor generation order (itmo:dna/DnaTools.java:33)


def _neighbors(kmer: str, direction: int) -> list[str]:
    """StringUtils left/right/all neighbors (src/utils/StringUtils.java:8-32)."""
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


def _occ(kmap: KmerMap, kmer: str, hasher: str) -> int:
    return kmap.get(hash_str(kmer, hasher))


def build_environment_hashed(sequences: list[str], k: int, kmap: KmerMap,
                             min_occ: int, hasher: str,
                             both_directions: bool, max_radius: int | None,
                             max_kmers: int | None, trim: bool,
                             hic_sequences: list[str] | None = None) -> Environment:
    seeds: list[str] = []
    for seq in list(sequences) + list(hic_sequences or []):
        for i in range(len(seq) - k + 1):
            w = seq[i:i + k]
            if _occ(kmap, w, hasher) >= min_occ:
                seeds.append(w)
    dirs = [0] if both_directions else [-1, 1]
    union: set[str] = set()
    fail = True
    for direction in dirs:
        if not seeds:
            continue
        fail = False
        dist: dict[str, int] = {}
        queue: list[str] = []
        for s in seeds:
            if s not in dist:
                dist[s] = 0
            queue.append(s)
        last: set[str] = set()
        head = 0
        while head < len(queue):
            cur = queue[head]
            head += 1
            dd = dist[cur] + 1
            for nb in _neighbors(cur, direction):
                if _occ(kmap, nb, hasher) >= min_occ:
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
            visited = _trim(visited, last, direction)
        union |= visited
    if fail:
        return Environment(k, np.empty(0, np.int64), np.empty(0, np.int32), fail=True)

    env = _HashedEnvironment(k, union, kmap, hasher)
    env.extend_count = _extend_count(env.as_dict(), kmap, hasher, min_occ, k)
    return env


def _trim(visited: set[str], last: set[str], direction: int) -> set[str]:
    """runTrimPaths (OneSequenceCalculator.java:241-262)."""
    reached = set(last)
    queue = list(last)
    head = 0
    while head < len(queue):
        cur = queue[head]
        head += 1
        for nb in _neighbors(cur, -direction):
            if nb in visited and nb not in reached:
                reached.add(nb)
                queue.append(nb)
    return reached


def _extend_count(subgraph: dict[str, int], kmap: KmerMap, hasher: str,
                  min_occ: int, k: int) -> int:
    """extendEnvironment no-op count (OneSequenceCalculator.java:265-295)."""
    n = 0
    for kmer in subgraph:
        outside = 0
        for nb in _neighbors(kmer, 0):
            if normalize(nb) not in subgraph and _occ(kmap, nb, hasher) >= min_occ:
                outside += 1
        if outside == 1:
            n += 1
    return n


class _HashedEnvironment(Environment):
    """Environment whose normalized strings come from string states."""

    def __init__(self, k: int, visited: set[str], kmap: KmerMap, hasher: str):
        norm = sorted({normalize(s) for s in visited})
        counts = np.array([kmap.get(hash_str(s, hasher)) for s in norm], np.int32)
        super().__init__(k, np.empty(0, np.int64), counts)
        self._norm = norm

    def normalized_strings(self) -> list[str]:
        return self._norm
