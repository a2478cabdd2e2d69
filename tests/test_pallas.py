"""Pallas extraction kernel vs XLA reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from metacherchant_tpu.ops.kmers import exact_canonical_kmers
from metacherchant_tpu.ops.pallas_kmers import exact_canonical_kmers_pallas


@pytest.mark.parametrize("k", [3, 15, 16, 17, 31])
def test_pallas_matches_xla(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(-1, 4, size=(1024, 40)).astype(np.int32)
    ref_k, ref_ok = map(np.asarray, exact_canonical_kmers(jnp.asarray(codes), k))
    got_k, got_ok = map(np.asarray,
                        exact_canonical_kmers_pallas(jnp.asarray(codes), k,
                                                     interpret=True))
    assert np.array_equal(ref_ok, got_ok)
    assert np.array_equal(ref_k, got_k)


def test_pallas_requires_block_multiple():
    codes = np.zeros((100, 8), np.int32)
    with pytest.raises(AssertionError):
        exact_canonical_kmers_pallas(jnp.asarray(codes), 5, interpret=True)


def test_mc_pallas_extract_routes_canonical_kmers(monkeypatch):
    """MC_PALLAS_EXTRACT=1 routes eligible batches through the Mosaic kernel
    (interpret mode off-TPU) with results identical to the XLA scan."""
    from metacherchant_tpu.ops.kmers import canonical_kmers
    rng = np.random.default_rng(7)
    codes = jnp.asarray(rng.integers(-1, 4, size=(1024, 48)).astype(np.int32))
    base_k, base_ok = map(np.asarray, canonical_kmers(codes, 21, None))
    monkeypatch.setenv("MC_PALLAS_EXTRACT", "1")
    got_k, got_ok = map(np.asarray, canonical_kmers(codes, 21, None))
    assert np.array_equal(base_ok, got_ok)
    assert np.array_equal(base_k, got_k)
    # ineligible batch size falls back to the XLA scan
    small = codes[:8]
    a, _ = map(np.asarray, canonical_kmers(small, 21, None))
    monkeypatch.delenv("MC_PALLAS_EXTRACT")
    b, _ = map(np.asarray, canonical_kmers(small, 21, None))
    assert np.array_equal(a, b)
