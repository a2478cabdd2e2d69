"""Device pointer-jumping contraction vs the order-faithful host sweep."""
import numpy as np
import pytest

from metacherchant_tpu.dna import normalize, reverse_complement
from metacherchant_tpu.algo.contraction import (
    build_node_graph, do_merge, alive, gene_kmer_checker)
from metacherchant_tpu.ops.contraction_device import (
    contract_device, assemble_nodes)


def _alive_seqs(nodes):
    return {normalize(n.seq) for n in nodes if not n.deleted}


def _edges(nodes, k):
    out = set()
    for n in nodes:
        if n.deleted:
            continue
        for m in n.neighbors:
            if m.deleted:
                continue
            out.add(frozenset((normalize(n.seq), normalize(m.seq))))
    return out


def _random_kmers(seed, k=21, glen=400, n_frag=6):
    """k-mers of several random genome fragments (linear chains + branches)."""
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), glen))
    kmers = set()
    for _ in range(n_frag):
        i = rng.integers(0, glen - 80)
        frag = genome[i:i + 80]
        for j in range(len(frag) - k + 1):
            kmers.add(normalize(frag[j:j + k]))
    return sorted(kmers), genome


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_matches_host_sweep(seed):
    k = 21
    kmers, genome = _random_kmers(seed, k)
    host = build_node_graph(kmers, k)
    do_merge(host, k)
    dev = contract_device(kmers, k)
    assert _alive_seqs(dev) == _alive_seqs(host)
    assert _edges(dev, k) == _edges(host, k)


@pytest.mark.parametrize("seed", [4, 5])
def test_device_matches_host_with_gene_barrier(seed):
    k = 21
    kmers, genome = _random_kmers(seed, k)
    gene = genome[100:160]
    checker = gene_kmer_checker([gene], k)
    host = build_node_graph(kmers, k, is_gene=checker)
    do_merge(host, k)
    dev = contract_device(kmers, k, tag_of=checker)
    assert _alive_seqs(dev) == _alive_seqs(host)
    # gene flags agree per surviving sequence
    host_gene = {normalize(n.seq): n.is_gene for n in alive(host)}
    dev_gene = {normalize(n.seq): n.is_gene for n in alive(dev)}
    assert dev_gene == host_gene


def test_device_cycle_terminates_single_unitig():
    """A pure cycle (all k-mers of a circular sequence) must terminate and
    contract to one linearized unitig covering every k-mer."""
    k = 15
    rng = np.random.default_rng(9)
    while True:
        circ = "".join(rng.choice(list("ACGT"), 60))
        ext = circ + circ[:k - 1]
        kmers = {normalize(ext[i:i + k]) for i in range(len(circ))}
        # pure cycle: all k-mers distinct AND all (k-1)-overlaps distinct on
        # both strands (no branching)
        ov = [ext[i:i + k - 1] for i in range(len(circ))]
        ov += [reverse_complement(o) for o in ov]
        if len(kmers) == len(circ) and len(set(ov)) == 2 * len(circ):
            break
    dev = contract_device(sorted(kmers), k)
    seqs = _alive_seqs(dev)
    assert len(seqs) == 1
    (seq,) = seqs
    assert len(seq) == len(circ) + k - 1
    # every input k-mer appears in the unitig
    got = {normalize(seq[i:i + k]) for i in range(len(seq) - k + 1)}
    assert got == kmers


def test_single_kmer_and_empty():
    assert contract_device([], 21) == []
    km = normalize("ACGTACGTACGTACGTACGTA")
    dev = contract_device([km], 21)
    assert _alive_seqs(dev) == {km}


def test_even_k_rejected():
    with pytest.raises(ValueError):
        contract_device(["ACGT"], 4)


def test_colored_picture_device_matches_host(tmp_path, monkeypatch):
    """build_colored_picture with MC_DEVICE_CONTRACT produces the same unitig
    content (seq + color) as the host color-barrier sweep."""
    from metacherchant_tpu.algo.fmt import build_colored_picture

    k = 21
    kmers, genome = _random_kmers(11, k)
    sub = {s: 3 for s in kmers}
    boundary = set(list(sub)[: len(sub) // 3])

    def color(seq):
        return "RED" if seq in boundary else "BLUE"

    def run(tag):
        out = tmp_path / tag
        out.mkdir()
        return build_colored_picture(sub, k, color, str(out), "pic")

    monkeypatch.delenv("MC_DEVICE_CONTRACT", raising=False)
    host = run("host")
    monkeypatch.setenv("MC_DEVICE_CONTRACT", "1")
    dev = run("dev")

    def content(nodes):
        return {(normalize(n.seq), n.color) for n in nodes if not n.deleted}

    assert content(dev) == content(host)
    assert _edges(dev, k) == _edges(host, k)


def test_cli_auto_route_crossing(tmp_path, monkeypatch):
    """Pin the MC_DEVICE_CONTRACT_MIN auto-route boundary in create_picture
    (the per-gene pictures path, ADVICE r4): just below the threshold the
    host sweep runs; at/above it the device engine runs, with the same
    unitig set/edges and S record count, while seqs.fasta byte order MAY
    diverge (documented in create_picture's docstring)."""
    import os
    from metacherchant_tpu.algo.calculator import create_picture

    k = 21
    kmers, genome = _random_kmers(5, k)
    sub = {s: 3 for s in kmers}
    gene = [genome[:60]]
    monkeypatch.delenv("MC_DEVICE_CONTRACT", raising=False)

    def run(tag, auto_min):
        out = tmp_path / tag
        out.mkdir()
        monkeypatch.setenv("MC_DEVICE_CONTRACT_MIN", str(auto_min))
        create_picture(sub, gene, k, str(out), chunk_length=10_000)
        seqs = (out / "seqs.fasta").read_text()
        return {normalize(s) for s in seqs.split("\n")
                if s and not s.startswith(">")}, seqs

    # below threshold -> host sweep; identical to an explicitly-host run
    below, seqs_below = run("below", len(sub) + 1)
    monkeypatch.setenv("MC_DEVICE_CONTRACT", "0")
    host, seqs_host = run("host", 1)
    monkeypatch.delenv("MC_DEVICE_CONTRACT")
    assert seqs_below == seqs_host  # threshold not crossed: byte-stable
    # at threshold -> device engine: same unitig set, same record count
    above, seqs_above = run("above", len(sub))
    assert above == below
    assert seqs_above.count(">") == seqs_below.count(">")
