"""Contraction order-sensitivity characterization.

The reference's doMerge is order-sensitive in degenerate configurations
(self-adjacent homopolymers, palindromic overlaps): it merges in ascending
sweep order and does not check `other.deleted`
(src/algo/OneSequenceCalculator.java:434-451). These tests pin the invariants
that DO hold regardless of order, protecting against accidental reorderings.
"""
import numpy as np
import pytest

from metacherchant_tpu.algo.contraction import (
    build_node_graph, do_merge, gene_kmer_checker)
from metacherchant_tpu.dna import normalize, reverse_complement


def _env_kmers(seqs, k):
    out = set()
    for s in seqs:
        for i in range(len(s) - k + 1):
            out.add(normalize(s[i:i + k]))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unitigs_cover_kmers_exactly(seed):
    """Alive unitigs' k-mers partition the input k-mer set (no loss, no dup
    beyond orientation pairs), and every unitig is a valid overlap walk.

    k=15 keeps (k-1)-overlap collisions (and hence degenerate parallel-edge /
    self-adjacent structures, where the reference's own merge order corrupts
    rc pairings) out of random data; at k=7 the invariant genuinely fails for
    the reference algorithm."""
    rng = np.random.default_rng(seed)
    k = 15
    base = "".join(rng.choice(list("ACGT"), size=400))
    seqs = [base[i:i + 80] for i in range(0, 320, 40)]
    seqs += [reverse_complement(s) for s in seqs[:3]]
    kmers = _env_kmers(seqs, k)
    nodes = build_node_graph(kmers, k,
                             is_gene=gene_kmer_checker([seqs[0][10:40]], k))
    do_merge(nodes, k)
    seen = []
    for n in nodes:
        if n.deleted or n.id >= n.rc.id:
            continue
        assert n.rc.seq == reverse_complement(n.seq)
        for i in range(len(n.seq) - k + 1):
            seen.append(normalize(n.seq[i:i + k]))
    assert sorted(seen) == sorted(kmers)


def test_gene_barrier_never_mixes():
    rng = np.random.default_rng(5)
    k = 15
    base = "".join(rng.choice(list("ACGT"), size=300))
    gene = base[100:160]
    kmers = _env_kmers([base], k)
    checker = gene_kmer_checker([gene], k)
    nodes = build_node_graph(kmers, k, is_gene=checker)
    do_merge(nodes, k)
    gene_windows = {gene[i:i + k] for i in range(len(gene) - k + 1)}
    for n in nodes:
        if n.deleted:
            continue
        flags = {(n.seq[i:i + k] in gene_windows
                  or reverse_complement(n.seq[i:i + k]) in gene_windows)
                 for i in range(len(n.seq) - k + 1)}
        assert len(flags) == 1  # unitigs are gene-homogeneous
        assert flags.pop() == n.is_gene


@pytest.mark.parametrize("seed", range(8))
def test_do_merge_prefilter_equals_literal_sweep(seed):
    """The round-5 pre-filtered do_merge must perform the EXACT merge
    sequence of the literal reference loop (full-node sweeps, visit-time
    eligibility checks, no other.deleted check), including on degenerate
    graphs with homopolymers and near-palindromes where order matters."""
    import numpy as np
    from metacherchant_tpu.dna import normalize
    from metacherchant_tpu.algo.contraction import (
        build_node_graph, do_merge, merge_nodes, _default_tag)

    def literal_sweep(nodes, k, tag=_default_tag):
        # transcription of OneSequenceCalculator.java:434-451, kept as the
        # oracle for the filtered implementation
        while True:
            acted = False
            for n in nodes:
                if n.deleted or len(n.neighbors) != 1:
                    continue
                other = n.neighbors[0]
                if len(other.neighbors) != 1 or tag(n) != tag(other):
                    continue
                merge_nodes(n, other, k)
                acted = True
            if not acted:
                return

    rng = np.random.default_rng(seed)
    k = 11
    glen = int(rng.integers(150, 900))
    genome = "".join(rng.choice(list("ACGT"), glen))
    kmers = {normalize(genome[i:i + k]) for i in range(glen - k + 1)}
    if seed % 2:
        kmers |= {"A" * k, normalize("AT" * (k // 2) + "A"),
                  normalize("ACG" * (k // 3) + "AC")}
    kmer_list = sorted(kmers)

    # tag shapes from every in-repo caller: default (is_gene), FMT
    # (color / (color, is_gene)), multi ((is_gene, graphs))
    def color_of(seq):
        return "RED" if hash(seq) % 3 == 0 else "BLUE"

    def graphs_of(seq):
        return frozenset({hash(seq) % 2})

    cases = [
        (dict(), _default_tag),
        (dict(color_of=color_of), lambda n: n.color),
        (dict(color_of=color_of), lambda n: (n.color, n.is_gene)),
        (dict(graphs_of=graphs_of),
         lambda n: (n.is_gene, n.graphs or frozenset())),
    ]
    for build_kw, tag in cases:
        a = build_node_graph(kmer_list, k, **build_kw)
        b = build_node_graph(kmer_list, k, **build_kw)
        do_merge(a, k, tag=tag)
        literal_sweep(b, k, tag=tag)
        state_a = [(n.deleted, n.seq, n.rc.seq) for n in a]
        state_b = [(n.deleted, n.seq, n.rc.seq) for n in b]
        assert state_a == state_b, tag
