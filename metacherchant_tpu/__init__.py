"""metacherchant_tpu: TPU-native genomic-environment engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ctlab/metacherchant (reference mounted at /root/reference): canonical k-mer
counting of metagenomic reads into a device-resident hash table, coverage-
thresholded de Bruijn subgraph (genomic environment) extraction by frontier
BFS from target genes, unitig contraction, and GFA/TSV/FASTA emission, plus
the read-classification, differential multi-graph and FMT tool families.
"""
import jax

# 64-bit keys (Java long semantics) everywhere.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
