"""Legacy BLAST branch filter (OneSequenceCalculator.filter/walk,
createFilteredPicture) with a stub BLAST runner."""
import logging
import os

from metacherchant_tpu.dna import normalize, reverse_complement
from metacherchant_tpu.algo.contraction import build_node_graph, gene_kmer_checker
from metacherchant_tpu.algo.branch_filter import (
    filter_branches, create_filtered_picture)

K = 5
SPINE = "ACGGTCAGT"      # gene: ACGGT CGGTC GGTCA GTCAG TCAGT
BRANCH = "CGGTCGA"       # adds non-gene GGTCG GTCGA off the CGGTC junction


def _kmers(*seqs):
    out = set()
    for s in seqs:
        for i in range(len(s) - K + 1):
            out.add(normalize(s[i:i + K]))
    return sorted(out)


def _build():
    return build_node_graph(_kmers(SPINE, BRANCH), K,
                            is_gene=gene_kmer_checker([SPINE], K))


def test_filter_branches_removes_unsupported_and_walks_gene_closure(tmp_path):
    nodes = _build()
    junctions = [n for n in nodes if len(n.neighbors) > 1]
    assert junctions, "construction must produce a branch junction"

    queries = []

    def no_support_runner(db_prefix, query, out_path, threads, logger):
        # parse the junction query file; report weak hits only
        # (length*pident < expected*100 for every record)
        queries.append(query)
        assert db_prefix.endswith(os.path.join("db", "dbReads"))
        with open(query) as f:
            lines = [l.strip() for l in f if l.strip()]
        with open(out_path, "w") as out:
            for i in range(0, len(lines), 2):
                idx = int(lines[i][1:].split()[0])
                seq = lines[i + 1]
                # reference support test: len * pident >= expected_len * 100
                # (OneSequenceCalculator.java:491-497); half-length 90% fails
                out.write(f"{idx}\t{max(1, len(seq) // 2)}\t90.00\n")
        return True

    filtered = filter_branches(nodes, K, 1, str(tmp_path),
                               logging.getLogger("test"),
                               blast_runner=no_support_runner)
    assert queries, "junction queries must have been issued"

    gene_set = set()
    for w in _kmers(SPINE):
        gene_set.add(w)
        gene_set.add(reverse_complement(w))
    got = {n.seq for n in filtered}
    assert got == gene_set  # closure = gene spine only, branch cut
    assert "GGTCG" not in got and "GTCGA" not in got

    # symmetric edge removal: no surviving node references a cut branch node
    branch_seqs = {"GGTCG", reverse_complement("GGTCG")}
    for n in filtered:
        for m in n.neighbors:
            assert m.seq not in branch_seqs


def test_filter_branches_keeps_supported_and_gene_edges(tmp_path):
    nodes = _build()

    def full_support_runner(db_prefix, query, out_path, threads, logger):
        with open(query) as f:
            lines = [l.strip() for l in f if l.strip()]
        with open(out_path, "w") as out:
            for i in range(0, len(lines), 2):
                idx = int(lines[i][1:].split()[0])
                out.write(f"{idx}\t{len(lines[i + 1])}\t100.00\n")
        return True

    filtered = filter_branches(nodes, K, 1, str(tmp_path),
                               logging.getLogger("test"),
                               blast_runner=full_support_runner)
    # everything supported -> whole graph survives (it is gene-connected)
    all_seqs = set()
    for w in _kmers(SPINE, BRANCH):
        all_seqs.add(w)
        all_seqs.add(reverse_complement(w))
    assert {n.seq for n in filtered} == all_seqs


def test_create_filtered_picture_outputs(tmp_path):
    nodes = _build()

    def no_blast(db_prefix, query, out_path, threads, logger):
        return False  # BLAST unavailable -> zero support everywhere

    filtered = filter_branches(nodes, K, 1, str(tmp_path),
                               logging.getLogger("test"),
                               blast_runner=no_blast)
    subgraph = {w: 1 for w in _kmers(SPINE, BRANCH)}
    out = tmp_path / "env"
    create_filtered_picture(filtered, K, subgraph, str(out), 1)
    assert (out / "filtered" / "seqs.fasta").exists()
    assert (out / "filtered" / "graph.gfa").exists()
    assert (out / "filtered" / "tsvs" / "nodes.tsv").exists()
    gfa = (out / "filtered" / "graph.gfa").read_text()
    assert any(line.startswith("S\t") for line in gfa.splitlines())
