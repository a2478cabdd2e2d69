"""Device k-mer extraction vs. slow host oracle, all three keying regimes."""
import numpy as np
import jax.numpy as jnp
import pytest

from metacherchant_tpu.dna import (
    encode, decode, reverse_complement, normalize, kmer_to_code, code_to_kmer,
    revcomp_code, canonical_code, revcomp_codes_np, codes_to_kmers_np, split_on_n,
)
from metacherchant_tpu.ops.kmers import (
    exact_canonical_kmers, hash_canonical_kmers, hash_str, poly_hash_str,
    fnv1a_hash_str, pack_reads, SENTINEL,
)


def _random_seq(rng, n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return "".join(rng.choice(list(alpha), size=n, p=p))


def test_encode_decode_roundtrip():
    s = "ACGTTGCA"
    assert decode(encode(s)) == s


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AAGC") == "GCTT"
    assert normalize("TTTT") == "AAAA"
    # ASCII ordering: A < C < G < T
    assert normalize("GGA") == "GGA" if "GGA" < "TCC" else "TCC"


def test_code_roundtrip_and_revcomp():
    rng = np.random.default_rng(1)
    for _ in range(50):
        k = int(rng.integers(1, 32))
        s = _random_seq(rng, k)
        code = kmer_to_code(s)
        assert code_to_kmer(code, k) == s
        assert code_to_kmer(revcomp_code(code, k), k) == reverse_complement(s)
        assert canonical_code(code, k) == min(code, kmer_to_code(reverse_complement(s)))


def test_revcomp_codes_np_matches_scalar():
    rng = np.random.default_rng(2)
    k = 21
    codes = rng.integers(0, 1 << (2 * k), size=100, dtype=np.int64)
    vec = revcomp_codes_np(codes, k)
    for c, v in zip(codes.tolist(), vec.tolist()):
        assert v == revcomp_code(c, k)


def test_codes_to_kmers_np():
    rng = np.random.default_rng(3)
    k = 13
    codes = rng.integers(0, 1 << (2 * k), size=20, dtype=np.int64)
    strs = codes_to_kmers_np(codes, k)
    for c, s in zip(codes.tolist(), strs):
        assert s == code_to_kmer(c, k)


def test_split_on_n():
    codes = encode("ACGNNTTGANA")
    parts = [decode(p) for p in split_on_n(codes)]
    assert parts == ["ACG", "TTGA", "A"]


@pytest.mark.parametrize("k", [3, 15, 31])
def test_exact_kmers_vs_oracle(k):
    rng = np.random.default_rng(k)
    seqs = [_random_seq(rng, int(rng.integers(k, 80)), with_n=True) for _ in range(16)]
    frags = [encode(s) for s in seqs]
    packed = pack_reads(frags, 16, 80)
    keys, ok = map(np.asarray, exact_canonical_kmers(jnp.asarray(packed), k))
    for r, s in enumerate(seqs):
        for j in range(80):
            i = j - k + 1
            if i < 0 or j >= len(s) or "N" in s[i:j + 1]:
                assert not ok[r, j]
                assert keys[r, j] == SENTINEL
            else:
                assert ok[r, j]
                assert keys[r, j] == canonical_code(kmer_to_code(s[i:j + 1]), k)


@pytest.mark.parametrize("hasher", ["poly", "fnv1a"])
@pytest.mark.parametrize("k", [5, 31, 41, 63])
def test_hash_kmers_vs_oracle(hasher, k):
    rng = np.random.default_rng(k)
    seqs = [_random_seq(rng, int(rng.integers(k, 70)), with_n=True) for _ in range(8)]
    frags = [encode(s) for s in seqs]
    packed = pack_reads(frags, 8, 70)
    keys, ok = map(np.asarray, hash_canonical_kmers(jnp.asarray(packed), k, hasher))
    for r, s in enumerate(seqs):
        for j in range(70):
            i = j - k + 1
            if i < 0 or j >= len(s) or "N" in s[i:j + 1]:
                assert not ok[r, j]
            else:
                assert ok[r, j]
                assert keys[r, j] == hash_str(s[i:j + 1], hasher)


def test_hash_orientation_invariance():
    rng = np.random.default_rng(7)
    for _ in range(20):
        s = _random_seq(rng, 35)
        assert poly_hash_str(s) == poly_hash_str(reverse_complement(s))
        assert fnv1a_hash_str(s) == fnv1a_hash_str(reverse_complement(s))


def test_poly_hash_reference_values():
    # hand-computed from src/utils/PolynomialHash.java:7-16 semantics:
    # fw("AG") = (1*5+0)*5+1 = 26; rc("AG")=hash("CT") = (1*5+2)*5+3 = 38
    assert poly_hash_str("AG") == 26
    # palindrome-free check: hash("A") fw=5, rc("A")="T" -> 5*1+3=8 -> min 5
    assert poly_hash_str("A") == 5
