"""Genome-scale reads->outputs golden: the full default CLI data path
(native C++ parser -> device counting engine -> native C++ FIFO BFS ->
contraction -> writers) must byte-match the all-Python oracle pipeline
(Python readers -> host dict counting -> Python FIFO BFS) at >=1M distinct
k-mers, on reads synthesized from the reference's checked-in Salmonella
genome (/root/reference/Hi-C_pipline/example/Salmonella_source/).

This is the non-toy-scale counterpart of test_env_golden.py (the reference's
wgs reads are not mounted, so reads are synthesized: fixed seed, 25x
coverage, 0.8% substitution errors -- enough errors to push the map past 1M
distinct k-mers, low enough that no coverage break fragments the gene's
record, so the environment itself is genome-scale).
"""
import logging
import os

import numpy as np
import pytest

from metacherchant_tpu.runner import main as runner_main
from metacherchant_tpu.dna import reverse_complement

SRC = "/root/reference/Hi-C_pipline/example/Salmonella_source"
K = 31
READ_LEN = 150
COVERAGE = 25
ERR = 0.008


def _load_genome() -> list[str]:
    seqs = []
    for fname in ("salmonella.fasta", "salmonella_pls.fasta"):
        cur = []
        with open(os.path.join(SRC, fname)) as f:
            for line in f:
                if line.startswith(">"):
                    if cur:
                        seqs.append("".join(cur))
                        cur = []
                else:
                    cur.append(line.strip())
        if cur:
            seqs.append("".join(cur))
    return seqs


@pytest.fixture(scope="module")
def salmonella_reads(tmp_path_factory):
    if not os.path.isdir(SRC):
        pytest.skip("reference Salmonella data not mounted")
    tmp = tmp_path_factory.mktemp("salm")
    seqs = _load_genome()
    rng = np.random.default_rng(42)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    reads_path = str(tmp / "reads.fastq")
    with open(reads_path, "w") as f:
        i = 0
        for g in seqs:
            arr = np.frombuffer(g.encode(), np.uint8)
            n_reads = len(g) * COVERAGE // READ_LEN
            starts = rng.integers(0, len(g) - READ_LEN, size=n_reads)
            for s in starts:
                r = arr[s:s + READ_LEN].copy()
                errs = np.flatnonzero(rng.random(READ_LEN) < ERR)
                r[errs] = alphabet[rng.integers(0, 4, size=errs.size)]
                read = r.tobytes().decode()
                if rng.random() < 0.5:
                    read = reverse_complement(read)
                f.write(f"@r{i}\n{read}\n+\n{'I' * READ_LEN}\n")
                i += 1
    gene_path = str(tmp / "gene.fasta")
    with open(gene_path, "w") as f:
        f.write(f">salmgene\n{seqs[0][50000:52000]}\n")
    return tmp, reads_path, gene_path


def _run(tmp, reads_path, gene_path, tag: str) -> str:
    out = str(tmp / f"out_{tag}")
    runner_main([
        "-t", "environment-finder", "-k", str(K), "-i", reads_path,
        "--seq", gene_path, "-o", out, "--coverage", "2",
        "--maxradius", "100000", "--work-dir", str(tmp / f"wd_{tag}"),
        "--force",
    ])
    (sub,) = os.listdir(out)
    return os.path.join(out, sub)


def test_genome_scale_default_equals_oracle(salmonella_reads, monkeypatch,
                                            caplog):
    tmp, reads_path, gene_path = salmonella_reads

    # pass A: the shipping default path
    monkeypatch.delenv("MC_NATIVE_IO", raising=False)
    monkeypatch.delenv("MC_HOST_COUNT", raising=False)
    monkeypatch.delenv("MC_NATIVE_BFS", raising=False)
    with caplog.at_level(logging.INFO, logger="metacherchant"):
        dir_a = _run(tmp, reads_path, gene_path, "default")
    sizes = [int(rec.message.split()[2]) for rec in caplog.records
             if rec.message.startswith("Hashtable size:")]
    assert sizes and sizes[0] >= 1_000_000, sizes  # non-toy scale

    # pass B: the all-Python oracle path
    monkeypatch.setenv("MC_NATIVE_IO", "0")
    monkeypatch.setenv("MC_HOST_COUNT", "1")
    monkeypatch.setenv("MC_NATIVE_BFS", "0")
    dir_b = _run(tmp, reads_path, gene_path, "oracle")

    with open(os.path.join(dir_a, "graph.txt")) as f:
        ga = f.read()
    with open(os.path.join(dir_b, "graph.txt")) as f:
        gb = f.read()
    assert ga == gb
    assert ga.count("\n") > 80_000  # the env itself is genome-scale

    with open(os.path.join(dir_a, "seqs.fasta")) as f:
        sa = f.read()
    with open(os.path.join(dir_b, "seqs.fasta")) as f:
        sb = f.read()
    assert sa == sb

    def gfa_counts(p):
        s = l = 0
        with open(p) as f:
            for line in f:
                s += line.startswith("S\t")
                l += line.startswith("L\t")
        return s, l

    assert (gfa_counts(os.path.join(dir_a, "graph.gfa"))
            == gfa_counts(os.path.join(dir_b, "graph.gfa")))
