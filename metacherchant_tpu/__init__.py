"""metacherchant_tpu: TPU-native genomic-environment engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ctlab/metacherchant (reference mounted at /root/reference): canonical k-mer
counting of metagenomic reads into a device-resident hash table, coverage-
thresholded de Bruijn subgraph (genomic environment) extraction by frontier
BFS from target genes, unitig contraction, and GFA/TSV/FASTA emission, plus
the read-classification, differential multi-graph and FMT tool families.
"""
import os

import jax

# 64-bit keys (Java long semantics) everywhere.
jax.config.update("jax_enable_x64", True)

# MC_PLATFORM=cpu|tpu|... pins the JAX backend. Needed because some
# environments force a platform through plugin registration that ignores
# JAX_PLATFORMS (e.g. tunneled test devices); jax.config wins over both.
if os.environ.get("MC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MC_PLATFORM"])

# Persistent compilation cache. The JAX_COMPILATION_CACHE_DIR env var is
# ignored under some plugin backends (observed on the tunneled TPU, where
# kernel compiles cost minutes); jax.config.update always works. Opt-in via
# MC_JAX_CACHE=<dir> so tests/CI keep a clean slate by default.
if os.environ.get("MC_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.environ["MC_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"
