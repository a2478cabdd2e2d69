"""Multi-device sharded counting on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metacherchant_tpu.parallel.sharded_count import ShardedCounter, make_mesh
from metacherchant_tpu.counting import count_sequences_host
from metacherchant_tpu.dna import encode


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh()


def _pack(seqs, batch, length):
    codes = np.full((batch, length), -1, np.int32)
    for j, s in enumerate(seqs):
        c = encode(s)
        codes[j, : len(c)] = c
    return codes


def test_sharded_count_matches_host(mesh):
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(64)]
    k = 21
    sc = ShardedCounter(mesh, k, None, capacity_log2_per_shard=12,
                        batch=16, max_len=128)
    for i in range(0, 64, 16):
        sc.add_codes(_pack(seqs[i:i + 16], 16, 128))
    keys, cnts = sc.items_host()
    ref = count_sequences_host(seqs, k)
    assert np.array_equal(keys, ref.keys)
    assert np.array_equal(cnts, ref.counts)


def test_sharded_count_hashed(mesh):
    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(32)]
    k = 35
    sc = ShardedCounter(mesh, k, "poly", capacity_log2_per_shard=12,
                        batch=8, max_len=96)
    for i in range(0, 32, 8):
        sc.add_codes(_pack(seqs[i:i + 8], 8, 96))
    keys, cnts = sc.items_host()
    ref = count_sequences_host(seqs, k, "poly")
    assert np.array_equal(keys, ref.keys)
    assert np.array_equal(cnts, ref.counts)


def test_sharded_overflow_carry(mesh):
    """Tiny all_to_all capacity forces overflow carry; results must still be
    exact (keys are retained and re-sent, never dropped)."""
    rng = np.random.default_rng(2)
    seqs = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(32)]
    k = 15
    from metacherchant_tpu.parallel import sharded_count as scmod
    sc = ShardedCounter(mesh, k, None, capacity_log2_per_shard=12,
                        batch=8, max_len=128, overflow_buf=8192)
    # slack=1 monkeypatch: rebuild step with minimal bucket capacity
    sc.step = scmod.make_sharded_count_step(mesh, k, None, slack=1)
    for i in range(0, 32, 8):
        sc.add_codes(_pack(seqs[i:i + 8], 8, 128))
    keys, cnts = sc.items_host()
    ref = count_sequences_host(seqs, k)
    assert np.array_equal(keys, ref.keys)
    assert np.array_equal(cnts, ref.counts)


def test_sharded_table_growth_exact(mesh):
    """Overfill every shard's table (tiny per-shard capacity): shards must
    GROW (never silently drop keys as in round 1, where the residual flag of
    _insert_unique_impl was discarded at sharded_count.py:100). Counts must
    match the host oracle exactly."""
    rng = np.random.default_rng(3)
    # ~3.4k distinct 21-mers vs 8 shards x 2^6 slots x 0.65 load = 333 slots:
    # forces multiple doublings
    seqs = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(32)]
    k = 21
    sc = ShardedCounter(mesh, k, None, capacity_log2_per_shard=6,
                        batch=8, max_len=128)
    cap0 = sc.shard_cap
    for i in range(0, 32, 8):
        sc.add_codes(_pack(seqs[i:i + 8], 8, 128))
    keys, cnts = sc.items_host()
    assert sc.shard_cap > cap0  # growth actually happened
    ref = count_sequences_host(seqs, k)
    assert np.array_equal(keys, ref.keys)
    assert np.array_equal(cnts, ref.counts)


def test_sharded_residual_requeue(mesh):
    """Even when the proactive bound is defeated (forced tiny max_load so the
    table fills mid-step), residual keys must be retained in the carry and land
    after growth -- the count multiset is never truncated."""
    rng = np.random.default_rng(4)
    seqs = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(16)]
    k = 17
    sc = ShardedCounter(mesh, k, None, capacity_log2_per_shard=5,
                        batch=8, max_len=128)
    # defeat the proactive guard: pretend there is always room
    sc._ensure_room = lambda incoming: None
    for i in range(0, 16, 8):
        sc.add_codes(_pack(seqs[i:i + 8], 8, 128))
    keys, cnts = sc.items_host()  # drain() syncs -> grows -> re-sends
    ref = count_sequences_host(seqs, k)
    assert np.array_equal(keys, ref.keys)
    assert np.array_equal(cnts, ref.counts)


def test_sharded_adversarial_skew(mesh):
    """Every key owned by ONE shard (worst-case bucket skew): the fixed
    per-destination all_to_all capacity forces a persistent overflow carry,
    and drain() must converge by live-carry progress (no fixed iteration
    ceiling) with exact counts."""
    import jax.numpy as jnp
    from metacherchant_tpu.ops.hashtable import _mix64
    from metacherchant_tpu.dna import kmer_to_code, canonical_code, decode

    k = 15
    rng = np.random.default_rng(5)
    seqs = []
    while len(seqs) < 160:
        s = "".join(rng.choice(list("ACGT"), size=k))
        key = canonical_code(kmer_to_code(s), k)
        if int(_mix64(jnp.asarray([key], jnp.int64))[0] % 8) == 0:
            seqs.append(s)
    sc = ShardedCounter(mesh, k, None, capacity_log2_per_shard=12,
                        batch=8, max_len=k, overflow_buf=1024)
    for i in range(0, 160, 8):
        sc.add_codes(_pack(seqs[i:i + 8], 8, k))
    keys, cnts = sc.items_host()
    ref = count_sequences_host(seqs, k)
    assert np.array_equal(keys, ref.keys)
    assert np.array_equal(cnts, ref.counts)


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jitted = jax.jit(fn)
    out = jitted(*args)
    assert len(out) == 4
    assert int(out[2]) > 0  # inserted some keys


def test_graft_entry_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)


def test_sharded_bfs_matches_host(mesh):
    """8-shard frontier-exchange BFS == host layered BFS, all directions."""
    import numpy as np
    from metacherchant_tpu.kmer_map import KmerMap
    from metacherchant_tpu.counting import count_sequences_host
    from metacherchant_tpu.algo.environment import (
        bfs_layered, seed_codes_of_sequences)
    from metacherchant_tpu.parallel.sharded_bfs import run_sharded_bfs
    from metacherchant_tpu.dna import reverse_complement

    k = 15
    rng = np.random.default_rng(21)
    genome = "".join(rng.choice(list("ACGT"), 600))
    reads = []
    for _ in range(120):
        i = rng.integers(0, len(genome) - 60)
        r = genome[i:i + 60]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    kmap = count_sequences_host(reads, k)
    gene = genome[200:260]
    seeds = np.array(seed_codes_of_sequences([gene], k, kmap, 1), np.int64)
    assert seeds.size
    for direction in (-1, 1, 0):
        for max_radius in (None, 5):
            want = bfs_layered(seeds, kmap, k, 1, direction, max_radius)
            got = run_sharded_bfs(seeds, kmap, k, 1, direction, max_radius,
                                  mesh)
            assert (got == want.visited).all(), (direction, max_radius)


def test_count_kmers_device_sharded_engine(mesh, tmp_path, monkeypatch):
    """count_kmers_device(engine='sharded') over the 8-device mesh equals the
    host oracle (CLI-reachable via MC_COUNT_ENGINE=sharded)."""
    import numpy as np
    from metacherchant_tpu.counting import count_kmers_device, count_kmers_host
    from metacherchant_tpu.dna import reverse_complement

    rng = np.random.default_rng(41)
    genome = "".join(rng.choice(list("ACGT"), 500))
    p = tmp_path / "r.fastq"
    with open(p, "w") as f:
        for i in range(200):
            s = int(rng.integers(0, len(genome) - 60))
            r = genome[s:s + 60]
            if rng.random() < 0.5:
                r = reverse_complement(r)
            f.write(f"@r{i}\n{r}\n+\n{'I' * 60}\n")
    got = count_kmers_device([str(p)], 21, engine="sharded",
                             batch=64, max_len=64, table_log2=14)
    want = count_kmers_host([str(p)], 21)
    assert (got.keys == want.keys).all()
    assert (got.counts == want.counts).all()


def test_sharded_bfs_explicit_frontier_cap(mesh):
    """The round-5 frontier_cap parameter: a generous explicit cap matches
    the default-cap result; an absurdly tight cap raises (overflow is
    device-detected, never silently truncated)."""
    from metacherchant_tpu.counting import count_sequences_host
    from metacherchant_tpu.algo.environment import bfs_layered
    from metacherchant_tpu.parallel.sharded_bfs import run_sharded_bfs

    k = 15
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 800))
    kmap = count_sequences_host([genome], k)
    # dispersed seeds -> wide frontiers
    from metacherchant_tpu.counting import seed_keys_of_sequence
    fw = seed_keys_of_sequence(genome, k, None)
    seeds = np.unique(fw[rng.choice(fw.size, size=300, replace=False)])
    want = bfs_layered(seeds, kmap, k, 1, 0, 6)
    got = run_sharded_bfs(seeds, kmap, k, 1, 0, 6, mesh, frontier_cap=4096)
    assert np.array_equal(np.sort(want.visited), got)
    # a cap below the densest seed shard is refused up front (a silent
    # init truncation would drop seeds)
    with pytest.raises(ValueError):
        run_sharded_bfs(np.unique(fw), kmap, k, 1, 0, 6, mesh,
                        frontier_cap=64)
    # a cap that fits the seeds but not the layer growth trips the
    # device-side overflow flag
    with pytest.raises(RuntimeError):
        run_sharded_bfs(seeds, kmap, k, 1, 0, 6, mesh, frontier_cap=64)
