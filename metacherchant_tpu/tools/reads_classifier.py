"""reads-classifier: classify paired reads against a weighted dBG.

Reimplements src/tools/ReadsClassifier.java: build the graph from one
metagenome's reads (or a *kmers.bin dump), classify paired reads of another
into found/not-found bins with the Poisson-interval breadth test, write the
six fastq outputs and the quality stats block.
"""
from __future__ import annotations

import os

import numpy as np

from ..tool import Tool, Parameter, ExecutionFailedException
from ..kmer_map import KmerMap
from ..counting import count_kmers_device, count_kmers_host
from ..io.readers import iter_dnaq, DnaQ
from ..io.writers import read_kmers_bin, write_fastq
from ..algo.classify import ReadBatch, find_reads, FoundStats

CLASSIFY_BATCH = 8192


def load_classifier_graph(tool: Tool, input_files: list[str], k: int,
                          hash_name: str) -> tuple[KmerMap, str | None]:
    """loadGraph (src/tools/ReadsClassifier.java:95-114): *kmers.bin dump or
    raw reads; hashing regime only when k > 31 (no --forcehash here)."""
    hasher = None
    if k > 31:
        hasher = "fnv1a" if hash_name.lower() == "fnv1a" else "poly"
        tool.info("Using %s hash function",
                  "FNV1a" if hasher == "fnv1a" else "default polynomial")
    if input_files and input_files[0].lower().endswith("kmers.bin"):
        keys_all, counts_all = [], []
        for f in input_files:
            kk, cc = read_kmers_bin(f, threshold=0)
            keys_all.append(kk)
            counts_all.append(cc)
        kmap = KmerMap.from_pairs(np.concatenate(keys_all),
                                  np.concatenate(counts_all))
    else:
        for f in input_files:
            if not os.path.exists(f):
                raise ExecutionFailedException(f"Could not load reads from {f}")
        counter = count_kmers_host if os.environ.get("MC_HOST_COUNT") \
            else count_kmers_device
        kmap = counter(input_files, k, hasher)
    tool.info("Hashtable size: %d kmers", len(kmap))
    return kmap, hasher


def read_dnaq_list(path: str) -> list[DnaQ]:
    if not os.path.exists(path):
        raise ExecutionFailedException(f"Could not load reads from {path}")
    return list(iter_dnaq(path))


def dnaq_fastq_records(dnaqs):
    """Reads are renamed to 1-based sequence numbers, matching the reference
    writer's DataCounter comments (itmo:io/writers/DataCounter.java:22-24)."""
    for i, d in enumerate(dnaqs):
        yield f"{i + 1}", d.to_string(), d.phred


class ReadsClassifier(Tool):
    NAME = "reads-classifier"
    DESCRIPTION = "classifies reads based on weighted De Bruijn graph"

    def __init__(self):
        super().__init__()
        self.k = self.add_parameter(Parameter(
            "k", int, short="k", mandatory=True, description="k-mer size"))
        self.input_files = self.add_parameter(Parameter(
            "input-files", str, short="i", multi=True, mandatory=True,
            description="file with paired input reads for De Bruijn graph OR "
                        "file with k-mers in binary format"))
        self.reads_files = self.add_parameter(Parameter(
            "read-files", str, short="r", multi=True, mandatory=True,
            description="files with paired reads to classify"))
        self.output_dir = self.add_parameter(Parameter(
            "output-dir", str, short="o",
            lazy_default=lambda t: os.path.join(t.work_dir.get(t),
                                                "reads_classifier"),
            description="directory to output found reads"))
        self.do_correction = self.add_parameter(Parameter(
            "correction", bool, short="corr", default=False,
            description="Do replacement of nucleotide in read with one low "
                        "quality position"))
        self.hash_function = self.add_parameter(Parameter(
            "hash", str, default="poly",
            description="hash function to use: poly or fnv1a"))
        self.interval95 = self.add_parameter(Parameter(
            "interval95", bool, default=False,
            description="Set the interval width to probability 0.95"))
        self.found_threshold = self.add_parameter(Parameter(
            "found-threshold", int, short="found", default=90,
            description="Minimum coverage breadth for class `found` [0 - 100 %]"))

    def run_impl(self) -> None:
        out = self.output_dir.get(self)
        os.makedirs(out, exist_ok=True)
        k = self.k.get(self)
        kmap, hasher = load_classifier_graph(
            self, self.input_files.get(self), k, self.hash_function.get(self))

        self.info("Loading reads...")
        files = self.reads_files.get(self)
        z = 1.96 if self.interval95.get(self) else 1.0
        thr = self.found_threshold.get(self) / 100.0
        corr = self.do_correction.get(self)
        self.info("Searching for%s reads in graph...",
                  " corrected" if corr else "")

        if len(files) == 2:
            reads1 = read_dnaq_list(files[0])
            reads2 = read_dnaq_list(files[1])
            # PairSource zips; shorter side continues with empty mates
            n = max(len(reads1), len(reads2))
            empty = DnaQ(np.empty(0, np.int8), np.empty(0, np.int16))
            reads1 += [empty] * (n - len(reads1))
            reads2 += [empty] * (n - len(reads2))
        else:
            reads1 = read_dnaq_list(files[0])
            empty = DnaQ(np.empty(0, np.int8), np.empty(0, np.int16))
            reads2 = [empty] * len(reads1)

        found_1 = np.zeros(len(reads1), bool)
        found_2 = np.zeros(len(reads1), bool)
        for s in range(0, len(reads1), CLASSIFY_BATCH):
            b1 = ReadBatch.from_dnaqs(reads1[s:s + CLASSIFY_BATCH])
            b2 = ReadBatch.from_dnaqs(reads2[s:s + CLASSIFY_BATCH])
            f1 = find_reads(b1, kmap, k, hasher, z, thr, corr)
            f2 = find_reads(b2, kmap, k, hasher, z, thr, corr)
            # single-end convention (PairFinder.java:42-44)
            f2 = np.where(b2.lengths == 0, ~f1, f2)
            found_1[s:s + CLASSIFY_BATCH] = f1
            found_2[s:s + CLASSIFY_BATCH] = f2

        both = found_1 & found_2
        first = found_1 & ~found_2
        second = ~found_1 & found_2
        neither = ~found_1 & ~found_2
        stats = FoundStats(int(both.sum()), int(first.sum()),
                           int(second.sum()), int(neither.sum()))
        self._log_stats(stats)

        self.info("Writing classified reads...")
        sel = np.flatnonzero
        write_fastq(os.path.join(out, "found_1.fastq"),
                    dnaq_fastq_records([reads1[i] for i in sel(both)]))
        write_fastq(os.path.join(out, "found_2.fastq"),
                    dnaq_fastq_records([reads2[i] for i in sel(both)]))
        write_fastq(os.path.join(out, "not_found_1.fastq"),
                    dnaq_fastq_records([reads1[i] for i in sel(neither)]))
        write_fastq(os.path.join(out, "not_found_2.fastq"),
                    dnaq_fastq_records([reads2[i] for i in sel(neither)]))
        found_s = [reads1[i] for i in sel(first) if len(reads1[i])] + \
                  [reads2[i] for i in sel(second) if len(reads2[i])]
        not_found_s = [reads2[i] for i in sel(first) if len(reads2[i])] + \
                      [reads1[i] for i in sel(second) if len(reads1[i])]
        write_fastq(os.path.join(out, "found_s.fastq"),
                    dnaq_fastq_records(found_s))
        write_fastq(os.path.join(out, "not_found_s.fastq"),
                    dnaq_fastq_records(not_found_s))
        self.info("Reads have been written. Finishing...")

    def _log_stats(self, stats: FoundStats) -> None:
        """Stats block (ReadsClassifier.java:189-199)."""
        self.info("|\tTotal: %d reads", stats.total)
        self.info("|\tPaired: %d reads", stats.paired)
        self.info("|\tTotal quality: %.2f %%",
                  100 * stats.paired / stats.total if stats.total else 0)
        self.info("|\tFound: %d reads", stats.found)
        self.info("|\tPercent of found reads: %.2f %%",
                  100 * stats.found / stats.total if stats.total else 0)
        self.info("|\tQuality of found bin: %.2f %%", stats.quality_found)
        self.info("|\tNot found: %d reads", stats.not_found)
        self.info("|\tPercent of not found reads: %.2f %%",
                  100 * stats.not_found / stats.total if stats.total else 0)
        self.info("|\tQuality of not found bin: %.2f %%", stats.quality_not_found)
