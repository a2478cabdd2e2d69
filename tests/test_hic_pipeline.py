"""End-to-end Hi-C pipeline driver with stub bwa (no samtools needed: the
driver filters SAM flags itself, HiCEnvironmentFinder.sh:64-74 semantics)."""
import os
import stat
import sys

import numpy as np
import pytest

from metacherchant_tpu.hic.pipeline import run_hic_pipeline
from metacherchant_tpu.dna import reverse_complement

BWA_STUB = r'''#!/usr/bin/env python3
"""Stub bwa: 'index' is a no-op; 'mem' emits a deterministic SAM that maps
each mate pair to alternating reference contigs (by FASTA order)."""
import sys

def contigs(path):
    names = []
    for line in open(path):
        if line.startswith(">"):
            names.append(line[1:].split()[0].strip())
    return names

if sys.argv[1] == "index":
    sys.exit(0)
assert sys.argv[1] == "mem"
args = [a for a in sys.argv[2:] if a != "-t" and not a.isdigit()]
ref, r1, r2 = args[0], args[1], args[2]
names = contigs(ref) or ["c0"]

def reads(path):
    with open(path) as f:
        lines = f.read().splitlines()
    return [(lines[i][1:], lines[i + 1]) for i in range(0, len(lines), 4)]

print("@HD\tVN:1.6")
for n in names:
    print(f"@SQ\tSN:{n}\tLN:1000")
pairs = list(zip(reads(r1), reads(r2)))
for i, ((n1, s1), (n2, s2)) in enumerate(pairs):
    c1 = names[i % len(names)]
    c2 = names[(i + 1) % len(names)]
    if i % 3 == 0:
        # first mate UNMAPPED with mapped mate (0x1|0x4|0x40 = 69): the
        # -f 0x5 -F 0x908 selection target; second carries mate-unmapped
        print(f"{n1}\t69\t*\t0\t0\t*\t{c2}\t1\t0\t{s1}\t*")
        print(f"{n2}\t137\t{c2}\t1\t60\t{len(s2)}M\t*\t0\t0\t{s2}\t*")
    else:
        # both mates mapped to DIFFERENT contigs (contact-map rows)
        print(f"{n1}\t65\t{c1}\t1\t60\t{len(s1)}M\t{c2}\t1\t0\t{s1}\t*")
        print(f"{n2}\t129\t{c2}\t1\t60\t{len(s2)}M\t{c1}\t1\t0\t{s2}\t*")
'''


@pytest.fixture
def stub_bwa(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    bwa = bindir / "bwa"
    bwa.write_text(BWA_STUB)
    bwa.chmod(bwa.stat().st_mode | stat.S_IEXEC)
    # the driver requires samtools on PATH but never invokes it (flag
    # filtering is internal) -- provide an inert stub
    st = bindir / "samtools"
    st.write_text("#!/bin/sh\nexit 0\n")
    st.chmod(st.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


def test_hic_pipeline_end_to_end(tmp_path, stub_bwa):
    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), 2000))
    reads = []
    for _ in range(400):
        s = int(rng.integers(0, len(genome) - 60))
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    reads_path = tmp_path / "wgs.fastq"
    reads_path.write_text("".join(
        f"@r{i}\n{r}\n+\n{'I' * len(r)}\n" for i, r in enumerate(reads)))
    gene_path = tmp_path / "seq.fasta"
    gene_path.write_text(f">gene\n{genome[800:920]}\n")
    for mate in (1, 2):
        p = tmp_path / f"hic_{mate}.fastq"
        p.write_text("".join(
            f"@h{i}/{mate}\n{genome[i * 37 % 1900:i * 37 % 1900 + 40]}\n+\n{'I' * 40}\n"
            for i in range(20)))

    wd = str(tmp_path / "hic_wd")
    run_hic_pipeline([str(reads_path)], str(gene_path), wd,
                     str(tmp_path / "hic_1.fastq"), str(tmp_path / "hic_2.fastq"),
                     k=21, coverage=2, max_radius=1000)

    # pass 1 + pass 2 outputs and the contact map exist and are well-formed
    for p in ("output/1/merged/graph.txt", "output/1/merged/seqs.fasta",
              "1/selected_reads.fasta", "output/2/merged/graph.txt",
              "2/hic_map.txt"):
        assert os.path.exists(os.path.join(wd, p)), p
    lines = open(os.path.join(wd, "2/hic_map.txt")).read().splitlines()
    assert lines[0] == "v1\tv2\thic_w"
    for ln in lines[1:]:
        v1, v2, w = ln.split("\t")
        assert int(w) >= 0
    # selected reads: stub maps every mate with mate-mapped flags
    sel = open(os.path.join(wd, "1/selected_reads.fasta")).read()
    assert sel.count(">") == 7  # pairs with i % 3 == 0: the unmapped mate
    # contact map counts both-mapped different-contig pairs, count // 2
    assert len(lines) > 1
