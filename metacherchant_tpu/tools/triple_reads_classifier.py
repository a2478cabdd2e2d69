"""triple-reads-classifier: two-pass classification with k then k2 > k.

Reimplements src/tools/TripleReadsClassifier.java: pass 1 (k) records
FOUND/HALF_FOUND/NOT_FOUND per read, the graph is rebuilt at k2, pass 2
combines verdicts (TripleFinder2 rules) and routes the 9 outcome combinations
into found/half_found/not_found x 1/2/s fastq bins.
"""
from __future__ import annotations

import os

import numpy as np

from ..tool import Tool, Parameter, ExecutionFailedException
from ..algo.classify import (
    ReadBatch, find_reads, batch_widths, triple_verdict_pass1,
    triple_verdict_pass2, FOUND, HALF_FOUND, NOT_FOUND)
from ..io.writers import write_fastq
from .reads_classifier import (
    load_classifier_graph, read_dnaq_list, dnaq_fastq_records, CLASSIFY_BATCH)
from ..io.readers import DnaQ


class TripleReadsClassifier(Tool):
    NAME = "triple-reads-classifier"
    DESCRIPTION = ("classifies reads based on weighted De Bruijn graph with "
                   "two values of k-mers and splits them into three categories")

    def __init__(self):
        super().__init__()
        self.k = self.add_parameter(Parameter(
            "k", int, short="k", mandatory=True, description="k-mer size"))
        self.k2 = self.add_parameter(Parameter(
            "k2", int, short="k2", mandatory=True,
            description="second k-mer size. k2 > k"))
        self.input_files = self.add_parameter(Parameter(
            "input-files", str, short="i", multi=True,
            description="file with paired input reads for De Bruijn graph"))
        self.input_kmers_1 = self.add_parameter(Parameter(
            "input-kmers-1", str, short="ik1", multi=True,
            description="file with k-mers in binary format for De Bruijn graph"))
        self.input_kmers_2 = self.add_parameter(Parameter(
            "input-kmers-2", str, short="ik2", multi=True,
            description="file with k-mers in binary format for De Bruijn graph"))
        self.reads_files = self.add_parameter(Parameter(
            "read-files", str, short="r", multi=True, mandatory=True,
            description="files with paired reads to classify"))
        self.output_dir = self.add_parameter(Parameter(
            "output-dir", str, short="o",
            lazy_default=lambda t: os.path.join(t.work_dir.get(t),
                                                "reads_classifier"),
            description="directory to output found reads"))
        self.hash_function = self.add_parameter(Parameter(
            "hash", str, default="poly",
            description="hash function to use: poly or fnv1a"))
        self.do_correction = self.add_parameter(Parameter(
            "correction", bool, short="corr", default=False,
            description="Do replacement of nucleotide in read with one low "
                        "quality position"))
        self.interval95 = self.add_parameter(Parameter(
            "interval95", bool, default=False,
            description="Set the interval width to probability 0.95"))
        self.found_threshold = self.add_parameter(Parameter(
            "found-threshold", int, short="found", default=90,
            description="Minimum coverage breadth for class `found` [0 - 100 %]"))
        self.half_threshold = self.add_parameter(Parameter(
            "half-threshold", int, short="half", default=40,
            description="Minimum coverage breadth for class `half-found` [0 - 100 %]"))

    def _load(self, k: int, kmers_param):
        kmers = kmers_param.get(self)
        if kmers and kmers[0].lower().endswith("kmers.bin"):
            return load_classifier_graph(self, kmers, k,
                                         self.hash_function.get(self))
        inputs = self.input_files.get(self)
        if not inputs:
            raise ExecutionFailedException(
                "Either --input-files or binary k-mer dumps must be given")
        return load_classifier_graph(self, inputs, k,
                                     self.hash_function.get(self))

    def run_impl(self) -> None:
        k, k2 = self.k.get(self), self.k2.get(self)
        if k >= k2:
            raise ExecutionFailedException(
                f"k2 should be greater than k, given: {k} {k2}")
        out = self.output_dir.get(self)
        os.makedirs(out, exist_ok=True)

        self.info("Loading reads...")
        files = self.reads_files.get(self)
        reads1 = read_dnaq_list(files[0])
        if len(files) >= 2:
            reads2 = read_dnaq_list(files[1])
        else:
            reads2 = []
        n = max(len(reads1), len(reads2))
        empty = DnaQ(np.empty(0, np.int8), np.empty(0, np.int16))
        reads1 += [empty] * (n - len(reads1))
        reads2 += [empty] * (n - len(reads2))

        z = 1.96 if self.interval95.get(self) else 1.0
        thr = self.found_threshold.get(self) / 100.0
        half = self.half_threshold.get(self) / 100.0
        corr = self.do_correction.get(self)

        self.info("Building graph with k = %d ...", k)
        kmap1, hasher1 = self._load(k, self.input_kmers_1)
        self.info("Searching for%s reads in graph...", " corrected" if corr else "")
        v1_1 = np.zeros(n, np.int32)
        v1_2 = np.zeros(n, np.int32)
        for s in range(0, n, CLASSIFY_BATCH):
            b1 = ReadBatch.from_dnaqs(reads1[s:s + CLASSIFY_BATCH])
            b2 = ReadBatch.from_dnaqs(reads2[s:s + CLASSIFY_BATCH])
            f1 = find_reads(b1, kmap1, k, hasher1, z, thr, corr)
            f2 = find_reads(b2, kmap1, k, hasher1, z, thr, corr)
            f2 = np.where(b2.lengths == 0, ~f1, f2)
            w1 = batch_widths(b1, kmap1, k, hasher1)
            w2 = batch_widths(b2, kmap1, k, hasher1)
            v1_1[s:s + CLASSIFY_BATCH] = triple_verdict_pass1(f1, w1, half)
            v1_2[s:s + CLASSIFY_BATCH] = triple_verdict_pass1(f2, w2, half)
        del kmap1

        self.info("Building graph with k = %d ...", k2)
        kmap2, hasher2 = self._load(k2, self.input_kmers_2)
        self.info("Searching for%s reads in graph...", " corrected" if corr else "")
        r1 = np.zeros(n, np.int32)
        r2 = np.zeros(n, np.int32)
        for s in range(0, n, CLASSIFY_BATCH):
            b1 = ReadBatch.from_dnaqs(reads1[s:s + CLASSIFY_BATCH])
            b2 = ReadBatch.from_dnaqs(reads2[s:s + CLASSIFY_BATCH])
            f1 = find_reads(b1, kmap2, k2, hasher2, z, thr, corr)
            f2 = find_reads(b2, kmap2, k2, hasher2, z, thr, corr)
            f2 = np.where(b2.lengths == 0, ~f1, f2)
            w1 = batch_widths(b1, kmap2, k2, hasher2)
            w2 = batch_widths(b2, kmap2, k2, hasher2)
            r1[s:s + CLASSIFY_BATCH] = triple_verdict_pass2(
                f1, w1, v1_1[s:s + CLASSIFY_BATCH], half)
            r2[s:s + CLASSIFY_BATCH] = triple_verdict_pass2(
                f2, w2, v1_2[s:s + CLASSIFY_BATCH], half)

        # route the 9 combinations (TripleFinder2.java:83-107)
        both_found = np.flatnonzero((r1 == FOUND) & (r2 == FOUND))
        both_half = np.flatnonzero((r1 == HALF_FOUND) & (r2 == HALF_FOUND))
        both_not = np.flatnonzero((r1 == NOT_FOUND) & (r2 == NOT_FOUND))
        mixed = (r1 != r2)
        s_found, s_half, s_not = [], [], []
        for i in np.flatnonzero(mixed):
            for res, read in ((r1[i], reads1[i]), (r2[i], reads2[i])):
                (s_found if res == FOUND else
                 s_half if res == HALF_FOUND else s_not).append(read)

        stats_total = 2 * (len(both_found) + len(both_half) + len(both_not)) \
            + len(s_found) + len(s_half) + len(s_not)
        self.info("|\tTotal: %d reads", stats_total)
        self.info("|\tPaired: %d reads",
                  2 * (len(both_found) + len(both_half) + len(both_not)))
        self.info("|\tFound: %d reads", 2 * len(both_found) + len(s_found))
        self.info("|\tHalf found: %d reads", 2 * len(both_half) + len(s_half))
        self.info("|\tNot found: %d reads", 2 * len(both_not) + len(s_not))

        self.info("Writing classified reads...")
        write_fastq(os.path.join(out, "found_1.fastq"),
                    dnaq_fastq_records([reads1[i] for i in both_found]))
        write_fastq(os.path.join(out, "found_2.fastq"),
                    dnaq_fastq_records([reads2[i] for i in both_found]))
        write_fastq(os.path.join(out, "half_found_1.fastq"),
                    dnaq_fastq_records([reads1[i] for i in both_half if len(reads1[i])]))
        write_fastq(os.path.join(out, "half_found_2.fastq"),
                    dnaq_fastq_records([reads2[i] for i in both_half if len(reads2[i])]))
        write_fastq(os.path.join(out, "not_found_1.fastq"),
                    dnaq_fastq_records([reads1[i] for i in both_not if len(reads1[i])]))
        write_fastq(os.path.join(out, "not_found_2.fastq"),
                    dnaq_fastq_records([reads2[i] for i in both_not if len(reads2[i])]))
        write_fastq(os.path.join(out, "found_s.fastq"),
                    dnaq_fastq_records([r for r in s_found if len(r)]))
        write_fastq(os.path.join(out, "half_found_s.fastq"),
                    dnaq_fastq_records([r for r in s_half if len(r)]))
        write_fastq(os.path.join(out, "not_found_s.fastq"),
                    dnaq_fastq_records([r for r in s_not if len(r)]))
        self.info("Reads have been written. Finishing...")
