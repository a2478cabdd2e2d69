"""Per-gene environment calculator: BFS -> contraction -> writers.

Equivalent of src/algo/OneSequenceCalculator.java run():98-114 + createPicture
():326-339 for the exact (k<=31) regime; the hashed regime routes through
algo.environment_hashed (string states).
"""
from __future__ import annotations

import logging
import os

from ..kmer_map import KmerMap
from .environment import build_environment, Environment
from .contraction import build_node_graph, do_merge, gene_kmer_checker
from ..io.writers import (
    write_graph_txt, write_graph_txt_codes, write_seqs_fasta, write_gfa,
    write_tsvs)

logger = logging.getLogger("metacherchant")


def shorten_label(label: str, k: int) -> str:
    """src/utils/StringUtils.java:43-49."""
    if len(label) >= 2 * k:
        return f"{label[:k]}...{label[-k:]} (length={len(label)})"
    return label


def run_one_sequence(sequences: list[str], k: int, kmap: KmerMap,
                     min_occ: int, output_prefix: str,
                     both_directions: bool, chunk_length: int,
                     max_radius: int | None, max_kmers: int | None,
                     trim: bool, merged: bool,
                     hic_sequences: list[str] | None = None,
                     hasher: str | None = None) -> Environment | None:
    """Returns the Environment, or None when no gene k-mer was found
    (fail+halt, OneSequenceCalculator.java:193-196, run():106-109)."""
    if not merged:
        logger.info("Finding environment for sequence %s",
                    shorten_label(sequences[0], k))
    else:
        logger.info("Finding single environment for %d sequences", len(sequences))

    if hasher is None:
        env = build_environment(sequences, k, kmap, min_occ, both_directions,
                                max_radius, max_kmers, trim, hic_sequences)
    else:
        from .environment_hashed import build_environment_hashed
        env = build_environment_hashed(sequences, k, kmap, min_occ, hasher,
                                       both_directions, max_radius, max_kmers,
                                       trim, hic_sequences)
    if env.fail:
        logger.info("Could not find any k-mers of the target gene in the input, halting.")
        return None
    logger.info("Extending endings by %d kmers", env.extend_count)

    if hasher is None:
        # exact regime: vectorized writer straight from oriented codes
        # (byte-identical to write_graph_txt(as_dict()); golden-pinned)
        write_graph_txt_codes(os.path.join(output_prefix, "graph.txt"),
                              env.codes, env.counts, k)
    else:
        write_graph_txt(os.path.join(output_prefix, "graph.txt"),
                        env.as_dict())
    subgraph = env.as_dict()
    create_picture(subgraph, sequences, k, output_prefix, chunk_length)
    return env


def create_picture(subgraph: dict[str, int], gene_sequences: list[str], k: int,
                   output_prefix: str, chunk_length: int) -> None:
    """createPicture (OneSequenceCalculator.java:326-339): build doubled-node
    graph, contract, emit seqs.fasta + graph.gfa + tsvs/.

    The device pointer-jumping contraction is OPT-IN (same policy as the
    FMT pictures, algo/fmt.py): round 4 measured it winning 1.7x at 400K
    k-mers, but the round-5 host optimizations (vectorized linking,
    prefiltered merge, gc suspension) closed that gap (host 3.3-3.9 s vs
    device 3.38 s + 0.8 s assembly at 400K, BENCH_NOTES), so there is no
    default auto-route threshold -- set MC_DEVICE_CONTRACT=1 or an
    explicit MC_DEVICE_CONTRACT_MIN. Environments stay on the
    reference-faithful host sweep by default.

    DOCUMENTED DIVERGENCE (ADVICE r4): the device route produces the same
    unitig SET as the host sweep but may differ in seqs.fasta/graph.gfa/tsv
    record ORDER and per-unitig strand choice (both engines pick valid but
    different orientations). Graph topology, sequence content, LN/KC values
    and record counts are identical; pinned by the threshold-crossing CLI
    test (tests/test_contraction_device.py::test_cli_auto_route_crossing).
    Set MC_DEVICE_CONTRACT=0 for byte-stable host output at any size."""
    from .contraction import use_device_contraction
    kmer_list = sorted(subgraph)
    is_gene = gene_kmer_checker(gene_sequences, k)
    if use_device_contraction(len(kmer_list), k):
        from ..ops.contraction_device import contract_device
        nodes = contract_device(kmer_list, k, tag_of=is_gene)
    else:
        nodes = build_node_graph(kmer_list, k, is_gene=is_gene)
        do_merge(nodes, k)
    write_seqs_fasta(os.path.join(output_prefix, "seqs.fasta"), nodes, chunk_length)
    write_gfa(os.path.join(output_prefix, "graph.gfa"), nodes, k, subgraph)
    write_tsvs(os.path.join(output_prefix, "tsvs"), nodes, k)
