"""Sharded kmer-map checkpoint round-trip + manifest validation."""
import numpy as np
import pytest

from metacherchant_tpu.kmer_map import KmerMap
from metacherchant_tpu.checkpoint import save_kmer_map, load_kmer_map


def _kmap(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(-2**62, 2**62, size=n, dtype=np.int64))
    counts = rng.integers(1, 100, size=keys.size).astype(np.int32)
    return KmerMap(keys, counts)


@pytest.mark.parametrize("n_shards", [1, 4, 7])
def test_roundtrip(tmp_path, n_shards):
    km = _kmap()
    save_kmer_map(str(tmp_path), km, k=31, hasher=None, n_shards=n_shards,
                  inputs=["a.fastq"])
    got, manifest = load_kmer_map(str(tmp_path), expect_k=31,
                                  expect_hasher=None)
    assert (got.keys == km.keys).all() and (got.counts == km.counts).all()
    assert manifest["n_shards"] == n_shards
    assert manifest["inputs"] == ["a.fastq"]


def test_manifest_validation(tmp_path):
    km = _kmap(50)
    save_kmer_map(str(tmp_path), km, k=31, hasher="poly")
    with pytest.raises(ValueError, match="k=31"):
        load_kmer_map(str(tmp_path), expect_k=21)
    with pytest.raises(ValueError, match="hasher"):
        load_kmer_map(str(tmp_path), expect_k=31, expect_hasher="fnv1a")


def test_empty_map(tmp_path):
    km = KmerMap(np.empty(0, np.int64), np.empty(0, np.int32))
    save_kmer_map(str(tmp_path), km, k=31, hasher=None, n_shards=3)
    got, _ = load_kmer_map(str(tmp_path))
    assert len(got) == 0
