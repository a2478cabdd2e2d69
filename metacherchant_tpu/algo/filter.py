"""ReadsFilter: extract reads touching an environment subgraph.

Reimplements src/algo/ReadsFilter.java:34-77: stream a reads file, keep each
read whose count of subgraph k-mers reaches max(1, kmersInRead*percent/100),
write kept reads as '>readsNumber|index' FASTA records. Reference quirks kept:
- the window loop runs i in [0, len-k) -- the LAST k-mer of the read is never
  tested (:54)
- reads are NOT N-split here (readDnaQLazy path); N counts as 'A'
"""
from __future__ import annotations

import os

import numpy as np

from ..io.readers import iter_dnaq
from ..algo.classify import rolling_keys_np
from ..algo.environment import canonical_codes


class SubgraphChecker:
    """isContainedInSubgraph by canonical key (exact or hashed regime)."""

    def __init__(self, env_strings: list[str], k: int, hasher: str | None):
        from ..ops.kmers import hash_str
        if hasher is None:
            from ..dna import kmer_to_code
            keys = np.array(
                [kmer_to_code(s) for s in env_strings], np.int64)
            self._keys = np.sort(canonical_codes(keys, k))
        else:
            self._keys = np.sort(np.array(
                [hash_str(s, hasher) for s in env_strings], np.int64))
        self.k = k
        self.hasher = hasher

    def window_hits(self, codes_row: np.ndarray) -> np.ndarray:
        """Bool per window of one read's codes (N already as 0)."""
        keys = rolling_keys_np(codes_row[None, :], self.k, self.hasher)
        if keys.size == 0:
            return np.zeros(0, bool)
        q = keys[0]
        if self._keys.size == 0:
            return np.zeros(q.shape, bool)
        pos = np.minimum(np.searchsorted(self._keys, q), self._keys.size - 1)
        return self._keys[pos] == q


def filter_reads_file(reads_file: str, checker: SubgraphChecker,
                      output_prefix: str, reads_number: int,
                      percent_filtration: int) -> int:
    """Writes cutReads<i>.fasta; returns number of kept reads."""
    out_path = os.path.join(output_prefix, f"cutReads{reads_number}.fasta")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    k = checker.k
    index = 0
    with open(out_path, "w") as out:
        for dnaq in iter_dnaq(reads_file):
            read = dnaq.to_string()
            n = len(read)
            if n < k:
                continue
            kmers_in_read = n - k + 1
            need = max(1, kmers_in_read * percent_filtration // 100)
            hits = checker.window_hits(dnaq.codes.astype(np.int32))
            # reference tests windows [0, len-k) only (ReadsFilter.java:54)
            hits = hits[: max(n - k, 0)]
            if hits.size and np.cumsum(hits.astype(np.int32)).max() >= need:
                # emulate the early-break semantics: count reaches `need`
                index += 1
                out.write(f">{reads_number}|{index}\n{read}\n")
    return index
