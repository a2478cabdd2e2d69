"""Classifier math: vectorized implementation vs a direct scalar oracle of the
Java findRead/delta/correction code, plus CLI round trips."""
import math
import os

import numpy as np
import pytest

from metacherchant_tpu.kmer_map import KmerMap
from metacherchant_tpu.counting import count_sequences_host
from metacherchant_tpu.algo.classify import (
    ReadBatch, find_reads, batch_widths, rolling_keys_np,
    triple_verdict_pass1, triple_verdict_pass2, FOUND, HALF_FOUND, NOT_FOUND)
from metacherchant_tpu.io.readers import DnaQ
from metacherchant_tpu.ops.kmers import hash_str
from metacherchant_tpu.dna import decode


def oracle_find_read(seq_codes, kmap, k, hasher, z, threshold):
    """Direct transcription of findRead (ReadsFinderInGraph.java:37-48)."""
    n = len(seq_codes)
    if n < k:
        return False
    s = decode(np.where(seq_codes < 0, 0, seq_codes))
    cov = []
    for i in range(n - k + 1):
        c = kmap.get(hash_str(s[i:i + k], hasher))
        cov.append(max(c, 0))
    cov_mean = (sum(cov) + cov[-1] * (k - 1)) / n
    width = (sum(1 for c in cov if c > 0) + (1 if cov[-1] > 0 else 0) * (k - 1)) / n
    theory = 1.0 - math.exp(-cov_mean)
    std = z * math.sqrt(math.exp(-cov_mean) * (1 - math.exp(-cov_mean)) / n)
    ok = width == 1 or (width != 0 and -std <= width - theory <= std)
    return (not (width < threshold)) and ok


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), size=1500))
    kmap = count_sequences_host([genome] * 3, 15)  # counts = 3
    reads = []
    for _ in range(60):
        s = int(rng.integers(0, 1400))
        ln = int(rng.integers(10, 90))
        reads.append(genome[s:s + ln])
    # some random (not-in-graph) reads
    for _ in range(30):
        ln = int(rng.integers(20, 90))
        reads.append("".join(rng.choice(list("ACGT"), size=ln)))
    # chimeric half-half
    for _ in range(20):
        s = int(rng.integers(0, 1400))
        half = genome[s:s + 30]
        rand = "".join(rng.choice(list("ACGT"), size=30))
        reads.append(half + rand)
    return kmap, reads


@pytest.mark.parametrize("z,thr", [(1.0, 0.9), (1.96, 0.5)])
def test_find_reads_vs_oracle(setup, z, thr):
    kmap, reads = setup
    dnaqs = [DnaQ.from_string(r, 30) for r in reads]
    batch = ReadBatch.from_dnaqs(dnaqs)
    got = find_reads(batch, kmap, 15, None, z, thr)
    for i, r in enumerate(reads):
        exp = oracle_find_read(batch.codes[i, :len(r)], kmap, 15, None, z, thr)
        assert got[i] == exp, (i, r)


def test_widths_match_oracle(setup):
    kmap, reads = setup
    dnaqs = [DnaQ.from_string(r, 30) for r in reads]
    batch = ReadBatch.from_dnaqs(dnaqs)
    w = batch_widths(batch, kmap, 15, None)
    k = 15
    for i, r in enumerate(reads):
        if len(r) < k:
            assert w[i] == 0
            continue
        cov = [max(kmap.get(hash_str(r[j:j + k], None)), 0)
               for j in range(len(r) - k + 1)]
        exp = (sum(1 for c in cov if c > 0)
               + (1 if cov[-1] > 0 else 0) * (k - 1)) / len(r)
        assert abs(w[i] - exp) < 1e-12


def test_correction_recovers_single_error(setup):
    kmap, _ = setup
    rng = np.random.default_rng(5)
    # take a clean genome read, corrupt one base, mark it low-quality
    keys = kmap  # noqa
    genome_read = None
    # reconstruct a read present in the graph: use any kmer string round trip
    from metacherchant_tpu.counting import count_sequences_host as _
    # build a fresh tiny scenario
    genome = "".join(rng.choice(list("ACGT"), size=400))
    km = count_sequences_host([genome], 15)
    read = genome[50:110]
    codes = DnaQ.from_string(read, 30)
    corrupted = codes.codes.copy()
    orig = corrupted[20]
    corrupted[20] = (orig + 1) % 4
    phred = codes.phred.copy()
    phred[20] = 2  # low quality
    batch = ReadBatch.from_dnaqs([DnaQ(corrupted, phred)])
    assert not find_reads(batch, km, 15, None, 1.0, 0.9, do_correction=False)[0]
    assert find_reads(batch, km, 15, None, 1.0, 0.9, do_correction=True)[0]


def test_triple_verdict_rules():
    # pass1: found -> FOUND; width >= half -> HALF; else NOT
    f = np.array([True, False, False])
    w = np.array([0.1, 0.5, 0.3])
    assert triple_verdict_pass1(f, w, 0.4).tolist() == [FOUND, HALF_FOUND, NOT_FOUND]
    # pass2 combination (TripleFinder2.java:63-80)
    found = np.array([True, True, False, False, False])
    width2 = np.array([1.0, 0.0, 0.9, 0.5, 0.1])
    pass1 = np.array([FOUND, NOT_FOUND, FOUND, HALF_FOUND, NOT_FOUND])
    got = triple_verdict_pass2(found, width2, pass1, 0.4)
    assert got.tolist() == [FOUND, HALF_FOUND, HALF_FOUND, HALF_FOUND, NOT_FOUND]


def test_rolling_keys_hashed_match():
    rng = np.random.default_rng(3)
    s = "".join(rng.choice(list("ACGT"), size=50))
    codes = DnaQ.from_string(s).codes.astype(np.int32)[None, :]
    for hasher in ("poly", "fnv1a"):
        keys = rolling_keys_np(codes, 33, hasher)
        for i in range(50 - 33 + 1):
            assert keys[0, i] == hash_str(s[i:i + 33], hasher)


def test_cli_reads_classifier(tmp_path):
    from metacherchant_tpu.runner import main as runner_main
    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    graph_reads = [genome[int(rng.integers(0, 1900)):][:80] for _ in range(300)]
    in_graph = [genome[int(rng.integers(0, 1900)):][:70] for _ in range(20)]
    random_reads = ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(20)]
    gpath = str(tmp_path / "graph.fastq")
    with open(gpath, "w") as f:
        for i, r in enumerate(graph_reads):
            f.write(f"@g{i}\n{r}\n+\n{'I' * len(r)}\n")
    r1 = str(tmp_path / "r1.fastq")
    r2 = str(tmp_path / "r2.fastq")
    with open(r1, "w") as f:
        for i, r in enumerate(in_graph + random_reads):
            f.write(f"@p{i}\n{r}\n+\n{'I' * len(r)}\n")
    with open(r2, "w") as f:
        for i, r in enumerate(in_graph + random_reads):
            f.write(f"@p{i}\n{r}\n+\n{'I' * len(r)}\n")
    out = str(tmp_path / "out")
    rc = runner_main([
        "-t", "reads-classifier", "-k", "21", "-i", gpath,
        "-r", r1, r2, "-o", out, "--work-dir", str(tmp_path / "wd")])
    assert rc == 0
    for f in ("found_1.fastq", "found_2.fastq", "not_found_1.fastq",
              "not_found_2.fastq", "found_s.fastq", "not_found_s.fastq"):
        assert os.path.exists(os.path.join(out, f))
    n_found = open(os.path.join(out, "found_1.fastq")).read().count("@")
    n_not = open(os.path.join(out, "not_found_1.fastq")).read().count("@")
    assert n_found >= 15       # most in-graph reads classified found
    assert n_not >= 15         # most random reads not found
    assert n_found + n_not <= 40


@pytest.mark.parametrize("hasher", [None, "poly"])
def test_device_classify_matches_numpy(hasher, monkeypatch):
    """MC_DEVICE_CLASSIFY routes coverage through the fused device kernel;
    find_reads verdicts must be identical to the numpy path."""
    import numpy as np
    from metacherchant_tpu.algo.classify import ReadBatch, find_reads
    from metacherchant_tpu.counting import count_sequences_host
    from metacherchant_tpu.dna import reverse_complement
    from metacherchant_tpu.io.readers import DnaQ

    k = 21
    rng = np.random.default_rng(33)
    genome = "".join(rng.choice(list("ACGT"), 800))
    reads = []
    for _ in range(100):
        i = rng.integers(0, len(genome) - 60)
        r = genome[i:i + 60]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    kmap = count_sequences_host(reads, k, hasher)
    # mixed batch: in-graph reads, random reads, a too-short read
    queries = reads[:30] + ["".join(rng.choice(list("ACGT"), 60))
                            for _ in range(30)] + ["ACGT"]
    batch = ReadBatch.from_dnaqs([DnaQ.from_string(q, 30) for q in queries])

    monkeypatch.delenv("MC_DEVICE_CLASSIFY", raising=False)
    want = find_reads(batch, kmap, k, hasher, 1.96, 0.9)
    monkeypatch.setenv("MC_DEVICE_CLASSIFY", "1")
    got = find_reads(batch, kmap, k, hasher, 1.96, 0.9)
    assert (got == want).all()
    assert want[:30].all() and not want[-1]


def test_cli_reads_classifier_single_file(tmp_path):
    """Single-end mode (-r one file): found reads go to found_s, pair bins
    stay empty (ReadsClassifier.java:205-221 single-end convention)."""
    from metacherchant_tpu.runner import main as runner_main
    rng = np.random.default_rng(10)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    graph_reads = [genome[int(rng.integers(0, 1900)):][:80] for _ in range(300)]
    in_graph = [genome[int(rng.integers(0, 1900)):][:70] for _ in range(20)]
    random_reads = ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(20)]
    gpath = str(tmp_path / "graph.fastq")
    with open(gpath, "w") as f:
        for i, r in enumerate(graph_reads):
            f.write(f"@g{i}\n{r}\n+\n{'I' * len(r)}\n")
    r1 = str(tmp_path / "r1.fastq")
    with open(r1, "w") as f:
        for i, r in enumerate(in_graph + random_reads):
            f.write(f"@p{i}\n{r}\n+\n{'I' * len(r)}\n")
    out = str(tmp_path / "out")
    rc = runner_main([
        "-t", "reads-classifier", "-k", "21", "-i", gpath,
        "-r", r1, "-o", out, "--work-dir", str(tmp_path / "wd")])
    assert rc == 0
    n_s = len(open(os.path.join(out, "found_s.fastq")).read().splitlines()) // 4
    n_ns = len(open(os.path.join(out, "not_found_s.fastq")).read().splitlines()) // 4
    assert n_s >= 15 and n_ns >= 15
    assert open(os.path.join(out, "found_1.fastq")).read() == ""


def test_classifier_streams_constant_memory(tmp_path):
    """VERDICT r1 #4: the classifier must stream pairs in O(batch) memory,
    never materializing whole read files (reference streams via PairSource,
    itmo:io/sources/PairSource.java:22-57). Classifies 120k reads while
    asserting Python-heap peak stays far below the materialized-list cost,
    and that bin contents are exact."""
    import tracemalloc
    from metacherchant_tpu.runner import main as runner_main

    rng = np.random.default_rng(7)
    g = "".join(rng.choice(list("ACGT"), size=4000))
    n = 120_000
    starts = rng.integers(0, 3900, size=n)
    with open(tmp_path / "r1.fastq", "w") as f1, \
            open(tmp_path / "r2.fastq", "w") as f2:
        for i, s in enumerate(starts):
            read = g[s:s + 80]
            f1.write(f"@a{i}\n{read}\n+\n{'I' * 80}\n")
            f2.write(f"@b{i}\n{read}\n+\n{'I' * 80}\n")
    with open(tmp_path / "graph.fasta", "w") as f:
        f.write(f">g\n{g}\n")

    os.environ["MC_HOST_COUNT"] = "1"
    # pin the worker count: the default scales with os.cpu_count(), which
    # would make this peak-memory bound measure a different configuration
    # per host (2 workers = the threaded pipeline's memory shape)
    os.environ["MC_CLASSIFY_THREADS"] = "2"
    try:
        tracemalloc.start()
        rc = runner_main([
            "-t", "reads-classifier", "-k", "21",
            "-i", str(tmp_path / "graph.fasta"),
            "-r", str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq"),
            "-o", str(tmp_path / "out"),
            "--work-dir", str(tmp_path / "wd")])
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
    finally:
        os.environ.pop("MC_HOST_COUNT", None)
        os.environ.pop("MC_CLASSIFY_THREADS", None)
    assert rc == 0
    # materialized DnaQ lists would cost >= 2 files * 120k * ~400B >= 90MB
    # and GROW WITH FILE SIZE. The r4 native whole-read parse holds flat
    # arrays (~3 bytes/base = ~58MB here, gated by
    # MC_NATIVE_READS_MAX_BYTES for big files); the r5 threaded pipeline
    # classifies both mates concurrently, so one extra batch of
    # rolling-key/coverage temporaries (~40MB at batch 8192) is alive at
    # peak -- a CONSTANT, not O(file). The bound checks we never regress to
    # object-list costs or an unbounded queue: rerunning with 10x the reads
    # must not move it.
    assert peak < 165 * 1024 * 1024, f"peak {peak / 1e6:.1f} MB"
    n_found = len(open(tmp_path / "out" / "found_1.fastq").read().splitlines()) // 4
    assert n_found == n  # every read is a genome substring at coverage >= 1


def test_format_fastq_blob_matches_record_writer(tmp_path):
    """Vectorized blob assembly is byte-identical to the per-record path,
    including multi-digit record numbers, empty reads, and phred clamping."""
    import numpy as np
    from metacherchant_tpu.io.readers import DnaQ
    from metacherchant_tpu.io.writers import FastqWriter
    from metacherchant_tpu.algo.classify import ReadBatch

    rng = np.random.default_rng(7)
    dnaqs = []
    for i in range(250):  # crosses the 9 -> 10 and 99 -> 100 digit bumps
        n = int(rng.integers(0, 40)) if i % 17 else 0  # some empties
        codes = rng.integers(0, 4, size=n).astype(np.int8)
        phred = rng.integers(0, 80, size=n).astype(np.int16)  # clamps at 62
        dnaqs.append(DnaQ(codes, phred))

    p1 = tmp_path / "records.fastq"
    with FastqWriter(str(p1)) as w:
        # two chunks so numbering continues across write calls
        w.write_many(dnaqs[:100])
        w.write_many(dnaqs[100:])

    b = ReadBatch.from_dnaqs(dnaqs)
    p2 = tmp_path / "blob.fastq"
    with FastqWriter(str(p2)) as w:
        w.write_batch(b.codes, b.phred, b.lengths, np.arange(100))
        w.write_batch(b.codes, b.phred, b.lengths, np.arange(100, 250))

    assert p1.read_bytes() == p2.read_bytes()
    w0 = FastqWriter(str(tmp_path / "empty.fastq"))
    w0.write_batch(b.codes, b.phred, b.lengths, np.empty(0, np.int64))
    w0.close()
    assert (tmp_path / "empty.fastq").read_bytes() == b""
