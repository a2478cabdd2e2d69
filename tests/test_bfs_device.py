"""Whole-BFS-on-device engine vs the host layered engine."""
import numpy as np
import pytest

from metacherchant_tpu.counting import count_sequences_host
from metacherchant_tpu.algo.environment import (
    bfs_layered, bfs_fifo, seed_codes_of_sequences)
from metacherchant_tpu.ops.bfs_device import run_device_bfs


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    k = 15
    kmap = count_sequences_host([genome], k)
    gene = genome[1000:1100]
    seeds = np.array(seed_codes_of_sequences([gene], k, kmap, 1), np.int64)
    return kmap, seeds, k


@pytest.mark.parametrize("direction", [-1, 1, 0])
@pytest.mark.parametrize("max_radius", [5, 50, None])
def test_device_bfs_matches_layered(setup, direction, max_radius):
    kmap, seeds, k = setup
    ref = bfs_layered(seeds, kmap, k, 1, direction, max_radius)
    got = run_device_bfs(seeds, kmap, k, 1, direction, max_radius)
    assert np.array_equal(np.sort(ref.visited), got)


def test_layered_matches_fifo_without_caps(setup):
    kmap, seeds, k = setup
    for direction in (-1, 1, 0):
        a = bfs_layered(seeds, kmap, k, 1, direction, 30)
        b = bfs_fifo(seeds.tolist(), kmap, k, 1, direction, 30, None)
        assert np.array_equal(a.visited, b.visited)


def test_device_bfs_coverage_threshold(setup):
    kmap, seeds, k = setup
    # min_occ=2 excludes single-copy kmers (whole genome is single-copy except repeats)
    got = run_device_bfs(seeds, kmap, k, 2, 0, None)
    ref = bfs_layered(seeds, kmap, k, 2, 0, None)
    assert np.array_equal(np.sort(ref.visited), got)
