"""recipient-visualiser: colored environments of the post-FMT metagenome.

Reimplements src/tools/RecipientVisualiser.java: one SeqEnvCalculator per
input sequence against the after-metagenome graph, colored by the four-bin
after predicate; outputs comp_<i>_seqs.fasta / comp_<i>.gfa under after/.
Default maxradius = 1000 (:65-68).
"""
from __future__ import annotations

import os

from ..tool import Tool, Parameter, ExecutionFailedException
from ..counting import count_kmers_device, count_kmers_host
from ..io.readers import read_rich_fasta
from ..algo.fmt import seq_env_subgraph, build_colored_picture, four_bin_color
from ..algo.calculator import shorten_label


class RecipientVisualiser(Tool):
    NAME = "recipient-visualiser"
    DESCRIPTION = ("Finds graphic environment for many genomic sequences in "
                   "recipient after FMT")

    def __init__(self):
        super().__init__()
        self.k = self.add_parameter(Parameter(
            "k", int, short="k", mandatory=True, description="k-mer size"))
        self.after_files = self.add_parameter(Parameter(
            "after-files", str, short="after", multi=True, mandatory=True,
            description="file with paired post-FMT recipient metagenomic reads"))
        self.seqs_file = self.add_parameter(Parameter(
            "seq", str, short="seq", mandatory=True,
            description="FASTA file with sequences"))
        self.max_kmers = self.add_parameter(Parameter(
            "maxkmers", int,
            description="maximum number of k-mers in created subgraph"))
        self.max_radius = self.add_parameter(Parameter(
            "maxradius", int, default=1000,
            description="maximum distance in k-mers from starting gene"))
        self.hash_function = self.add_parameter(Parameter(
            "hash", str, default="poly",
            description="hash function to use: poly or fnv1a"))
        self.output_dir = self.add_parameter(Parameter(
            "output-dir", str, short="o",
            lazy_default=lambda t: os.path.join(t.work_dir.get(t), "graph"),
            description="directory to output found reads"))
        self.input_dir = self.add_parameter(Parameter(
            "input-dir", str, short="i", mandatory=True,
            description="directory containing output of reads_classifier.sh "
                        "FMT classification script"))
        self.extension = self.add_parameter(Parameter(
            "ext", str, short="ext", mandatory=True,
            description="extension of output files of reads_classifier.sh FMT "
                        "classification script"))

    def _hasher(self) -> str | None:
        if self.k.get(self) <= 31:
            return None
        name = self.hash_function.get(self).lower()
        return "fnv1a" if name == "fnv1a" else "poly"

    def _bin_files(self, stem: str) -> list[str]:
        pre = self.input_dir.get(self)
        ext = self.extension.get(self)
        files = [os.path.join(pre, f"{stem}_{x}.{ext}") for x in ("1", "2", "s")]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise ExecutionFailedException(
                f"Could not load reads from {missing[0]}")
        return files

    def run_impl(self) -> None:
        k = self.k.get(self)
        hasher = self._hasher()
        if hasher is not None:
            self.info("Reading hashes of k-mers instead")
        counter = count_kmers_host if os.environ.get("MC_HOST_COUNT") \
            else count_kmers_device
        out = os.path.join(self.output_dir.get(self), "after")

        self.info("Loading after reads ...")
        graph = counter(self.after_files.get(self), k, hasher)
        from_donor = counter(self._bin_files("came_from_donor"), k, hasher)
        from_before = counter(self._bin_files("came_from_baseline"), k, hasher)
        from_both = counter(self._bin_files("came_from_both"), k, hasher)
        itself = counter(self._bin_files("came_itself"), k, hasher)
        try:
            records = read_rich_fasta(self.seqs_file.get(self))
        except OSError:
            raise ExecutionFailedException(
                f"Could not load sequences from {self.seqs_file.get(self)}")

        color = four_bin_color(k, hasher, from_donor, from_before, from_both,
                               itself)
        self.info("Creating after images ...")
        for i, rec in enumerate(records):
            self.info("Finding environment for sequence %s",
                      shorten_label(rec.seq, k))
            sub = seq_env_subgraph(rec.seq, k, graph, hasher,
                                   self.max_radius.get(self),
                                   self.max_kmers.get(self))
            if sub is None:
                self.info("Could not find any k-mers of the target gene in "
                          "the input, halting.")
                continue
            build_colored_picture(sub, k, color, out, f"comp_{i}",
                                  gene_sequence=rec.seq, merge_on_gene=True,
                                  seq_id_mode="min")
        self.info("Finished processing all sequences!")
