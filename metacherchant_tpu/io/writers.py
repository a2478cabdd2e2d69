"""Output writers: graph.txt, seqs.fasta, GFA, TSV, kmers.bin/stat.txt, FASTQ.

Formats replicate the reference byte-for-byte where the reference itself is
deterministic; line ORDER follows our deterministic node ids (sorted k-mers)
where the reference depends on JVM HashMap order (see SURVEY §7.3).
"""
from __future__ import annotations

import os
import struct
from typing import Iterable

import numpy as np

from ..dna import normalize
from ..algo.contraction import Node

GENE_LABEL_SUFFIX = "_start"  # io/writers/GFAWriter.java:12


def _ensure_dir(path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


# ---------------------------------------------------------------------------
# graph.txt (a.k.a. env.txt)
# ---------------------------------------------------------------------------

def write_graph_txt(path: str, env_dict: dict[str, int]) -> None:
    """'kmer count' lines (OneSequenceCalculator.printEnvironment:297-310).
    Reference order is HashMap order; we emit sorted for determinism."""
    _ensure_dir(path)
    with open(path, "w") as out:
        for kmer in sorted(env_dict):
            out.write(f"{kmer} {env_dict[kmer]}\n")


def load_graph_txt(path: str) -> dict[str, int]:
    """DeBruijnGraphUtils.loadGraph (src/io/graph/DeBruijnGraphUtils.java:13-27)."""
    graph: dict[str, int] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            tokens = line.split(" ")
            graph[tokens[0]] = int(tokens[1])
    return graph


# ---------------------------------------------------------------------------
# seqs.fasta
# ---------------------------------------------------------------------------

def _node_label(node: Node) -> str:
    """min(id, rc.id)+1 with _start suffix for gene nodes
    (OneSequenceCalculator.getNodeId:452-455, GFAWriter.getNodeId:84-86)."""
    return f"{node.min_id() + 1}{GENE_LABEL_SUFFIX if node.is_gene else ''}"


def _neighbor_ids(node: Node) -> list[int]:
    """TreeSet of neighbor min-ids (both orientations), minus self
    (OneSequenceCalculator.getNeighborIds:375-385)."""
    ids = {nb.min_id() + 1 for nb in node.neighbors}
    ids |= {nb.min_id() + 1 for nb in node.rc.neighbors}
    ids.discard(node.min_id() + 1)
    return sorted(ids)


def write_seqs_fasta(path: str, nodes: list[Node], chunk_length: int) -> None:
    """outputNodeSequences (OneSequenceCalculator.java:354-373): alive nodes
    with id < rc.id and length >= chunkLength."""
    _ensure_dir(path)
    with open(path, "w") as out:
        for n in nodes:
            if n.deleted or n.id >= n.rc.id or len(n.seq) < chunk_length:
                continue
            ids = _neighbor_ids(n)
            out.write(f"> Id{_node_label(n)} Length:{len(n.seq)} "
                      f"Neighbors:[{', '.join(map(str, ids))}]\n")
            out.write(n.seq + "\n")


# ---------------------------------------------------------------------------
# GFA
# ---------------------------------------------------------------------------

def _node_coverage(node: Node, k: int, subgraph: dict[str, int]) -> int:
    """KC tag: sum of subgraph counts over constituent k-mers, plus the last
    k-mer's count * (k-1) (GFAWriter.printLabel:88-99)."""
    cov = 0
    for i in range(len(node.seq) - k + 1):
        cov += subgraph[normalize(node.seq[i:i + k])]
    cov += subgraph[normalize(node.seq[len(node.seq) - k:])] * (k - 1)
    return cov


def write_gfa(path: str, nodes: list[Node], k: int,
              subgraph: dict[str, int], color_tag: str = "CL") -> None:
    """GFAWriter.printGraph (src/io/writers/GFAWriter.java:47-99):
    S lines for alive nodes in canonical orientation (seq <= rc.seq, ASCII);
    L lines for every alive adjacency, orientation signs by seq-vs-rc order."""
    _ensure_dir(path)
    with open(path, "w") as out:
        for n in nodes:
            if not n.deleted and n.seq <= n.rc.seq:
                cov = _node_coverage(n, k, subgraph)
                color = f"\t{color_tag}:Z:{n.color}" if n.color is not None else ""
                out.write(f"S\t{_node_label(n)}\t{n.seq}\tLN:i:{len(n.seq)}"
                          f"\tKC:i:{cov}{color}\n")
        for n in nodes:
            if n.deleted:
                continue
            for m in n.neighbors:
                if m.deleted:
                    continue
                sign_a = "+" if n.seq >= n.rc.seq else "-"
                sign_b = "+" if m.seq <= m.rc.seq else "-"
                out.write(f"L\t{_node_label(n)}\t{sign_a}\t{_node_label(m)}"
                          f"\t{sign_b}\t{k - 1}M\n")


# ---------------------------------------------------------------------------
# TSV (Cytoscape)
# ---------------------------------------------------------------------------

def write_tsvs(outdir: str, nodes: list[Node], k: int) -> None:
    """TSVWriter (src/io/writers/TSVWriter.java:27-87): nodes.tsv uses the
    node's OWN index+1 as id (:51-55); edges.tsv rows are
    'signedId(first.rc)\\tsignedId(second)\\tpp' under a 2-column header
    (:66-86) -- the 3-field rows replicate the reference exactly."""
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "nodes.tsv"), "w") as out:
        out.write("id\tlength\tseq\n")
        for n in nodes:
            if not n.deleted and n.seq <= n.rc.seq:
                out.write(f"{n.id + 1}\t{len(n.seq)}\t{n.seq}\n")

    def signed_id(node: Node) -> str:
        base = (str(node.id + 1) if node.seq <= node.rc.seq
                else f"-{node.rc.id + 1}")
        return base + (GENE_LABEL_SUFFIX if node.is_gene else "")

    with open(os.path.join(outdir, "edges.tsv"), "w") as out:
        out.write("source\ttarget\n")
        for n in nodes:
            if n.deleted:
                continue
            for m in n.neighbors:
                if not m.deleted:
                    out.write(f"{signed_id(n.rc)}\t{signed_id(m)}\tpp\n")


# ---------------------------------------------------------------------------
# kmers.bin + stat.txt
# ---------------------------------------------------------------------------

def write_kmers_bin(path: str, stat_path: str, keys: np.ndarray,
                    counts: np.ndarray, threshold: int = 0) -> int:
    """IOUtils.printKmers (src/io/IOUtils.java:39-65): big-endian int64 key +
    int16 count records for count > threshold; frequency histogram of ALL
    entries to stat.txt ('freq\\tnumber' sorted, with header + trailing blank
    line, itmo:statistics/QuickQuantitativeStatistics.java:37-76).
    Returns the number of records written."""
    _ensure_dir(path)
    keys = np.asarray(keys, np.int64)
    counts = np.asarray(counts, np.int64)
    good_mask = counts > threshold
    gk = keys[good_mask]
    gc = counts[good_mask].astype(np.int16)
    rec = np.empty(gk.size, dtype=np.dtype([("k", ">i8"), ("c", ">i2")]))
    rec["k"] = gk
    rec["c"] = gc
    with open(path, "wb") as out:
        rec.tofile(out)
    _ensure_dir(stat_path)
    freqs, nums = np.unique(counts, return_counts=True)
    with open(stat_path, "w") as out:
        out.write("# k-mer frequency\tnumber of such k-mers\n")
        for f, n in zip(freqs.tolist(), nums.tolist()):
            out.write(f"{f}\t{n}\n")
        out.write("\n")
    return int(gk.size)


def read_kmers_bin(path: str, threshold: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Load kmers.bin records with count > threshold
    (IOUtils.loadKmers:94-126 + KmersLoadWorker:14-32)."""
    rec = np.fromfile(path, dtype=np.dtype([("k", ">i8"), ("c", ">i2")]))
    keys = rec["k"].astype(np.int64)
    counts = rec["c"].astype(np.int32)
    keep = counts > threshold
    return keys[keep], counts[keep]


# ---------------------------------------------------------------------------
# FASTQ / FASTA writers
# ---------------------------------------------------------------------------

def write_fastq(path: str, records: Iterable[tuple[str, str, np.ndarray]],
                quality: str = "illumina") -> None:
    """WritersUtils.writeDnaQsToFastqFile (Illumina Phred+64 encoding default,
    itmo:io/writers/WritersUtils.java:50-80)."""
    offset = 64 if quality == "illumina" else 33
    _ensure_dir(path)
    with open(path, "w") as out:
        for name, seq, phred in records:
            q = "".join(chr(min(int(p), 62) + offset) for p in phred)
            out.write(f"@{name}\n{seq}\n+\n{q}\n")


class FastqWriter:
    """Incremental fastq writer for streaming classification.

    Same record format as write_fastq (Illumina Phred+64 default,
    itmo:io/writers/WritersUtils.java:50-80) with reads renamed to 1-based
    sequence numbers per output file (itmo:io/writers/DataCounter.java:22-24).
    Lets the classifier family route reads bin-by-bin in O(batch) memory
    instead of materializing whole read files (the reference streams pairs,
    itmo:io/sources/PairSource.java:22-57).
    """

    def __init__(self, path: str, quality: str = "illumina"):
        _ensure_dir(path)
        self._offset = 64 if quality == "illumina" else 33
        self._f = open(path, "w")
        self._n = 0

    def _format(self, dnaq) -> str:
        self._n += 1
        q = (np.minimum(np.asarray(dnaq.phred, np.int16), 62)
             + self._offset).astype(np.uint8).tobytes().decode("latin-1")
        return f"@{self._n}\n{dnaq.to_string()}\n+\n{q}\n"

    def write(self, dnaq) -> None:
        self._f.write(self._format(dnaq))

    def write_many(self, dnaqs) -> None:
        """Batch write: one formatting pass + one file write per bin slice
        (keeps classifier routing O(bins) Python work per batch)."""
        if dnaqs:
            self._f.write("".join(self._format(d) for d in dnaqs))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_fasta(path: str, records: Iterable[tuple[str, str]]) -> None:
    _ensure_dir(path)
    with open(path, "w") as out:
        for name, seq in records:
            out.write(f">{name}\n{seq}\n")


def write_binq(path: str, dnaqs) -> None:
    """BINQ writer: int32 big-endian length + (phred<<2 | nuc) bytes per read
    (inverse of readers._iter_binq; itmo:dna/DnaQ.java:140-150 layout)."""
    import struct
    _ensure_dir(path)
    with open(path, "wb") as out:
        for d in dnaqs:
            data = ((np.minimum(d.phred.astype(np.int32), 62) << 2)
                    | (d.codes.astype(np.int32) & 3)).astype(np.uint8)
            out.write(struct.pack(">i", len(data)))
            out.write(data.tobytes())
