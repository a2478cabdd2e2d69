"""End-to-end CLI test: environment-finder on synthetic reads, verified against
an independently-computed oracle environment (sequential FIFO BFS)."""
import os

import numpy as np
import pytest

from metacherchant_tpu.runner import main as runner_main
from metacherchant_tpu.counting import count_kmers_host
from metacherchant_tpu.io.writers import load_graph_txt
from metacherchant_tpu.dna import normalize, reverse_complement


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    reads = []
    for _ in range(400):
        s = int(rng.integers(0, len(genome) - 60))
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    reads_path = str(tmp / "reads.fastq")
    with open(reads_path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    gene = genome[800:900]
    gene_path = str(tmp / "gene.fasta")
    with open(gene_path, "w") as f:
        f.write(f">mygene\n{gene}\n")
    return tmp, reads_path, gene_path, gene


def _oracle_env(reads_path, gene, k, cov, max_radius):
    """Independent slow oracle: host counting + string-space FIFO BFS."""
    kmap = count_kmers_host([reads_path], k)
    from metacherchant_tpu.ops.kmers import hash_str

    def occ(s):
        return kmap.get(hash_str(s, None))

    env = {}
    for direction in (-1, 1):
        dist = {}
        queue = []
        for i in range(len(gene) - k + 1):
            w = gene[i:i + k]
            if occ(w) >= cov:
                dist.setdefault(w, 0)
                queue.append(w)
        head = 0
        while head < len(queue):
            cur = queue[head]
            head += 1
            d = dist[cur] + 1
            nbrs = ([n + cur[:-1] for n in "AGCT"] if direction == -1
                    else [cur[1:] + n for n in "AGCT"])
            for nb in nbrs:
                if occ(nb) >= cov and nb not in dist and d <= max_radius:
                    dist[nb] = d
                    queue.append(nb)
        for s in dist:
            env[normalize(s)] = occ(s)
    return env


def test_cli_end_to_end(synthetic):
    tmp, reads_path, gene_path, gene = synthetic
    out = str(tmp / "out")
    wd = str(tmp / "wd")
    rc = runner_main([
        "-t", "environment-finder",
        "-k", "21", "-i", reads_path, "--seq", gene_path,
        "-o", out, "--coverage", "2", "--maxradius", "50",
        "--work-dir", wd,
    ])
    assert rc == 0
    graph_path = os.path.join(out, "mygene", "graph.txt")
    assert os.path.exists(graph_path)
    got = load_graph_txt(graph_path)
    exp = _oracle_env(reads_path, gene, 21, 2, 50)
    assert got == exp
    # outputs exist
    for f in ("seqs.fasta", "graph.gfa", "tsvs/nodes.tsv", "tsvs/edges.tsv"):
        assert os.path.exists(os.path.join(out, "mygene", f))
    # unitig S lines must reconstruct: every S seq's k-mers are in the env
    for line in open(os.path.join(out, "mygene", "graph.gfa")):
        if line.startswith("S"):
            seq = line.split("\t")[2]
            for i in range(len(seq) - 21 + 1):
                assert normalize(seq[i:i + 21]) in got
    # checkpoint: SUCCESS written; --continue skips
    assert os.path.exists(os.path.join(wd, "SUCCESS"))
    rc = runner_main([
        "-t", "environment-finder",
        "-k", "21", "-i", reads_path, "--seq", gene_path,
        "-o", out, "--coverage", "2", "--maxradius", "50",
        "--work-dir", wd, "--continue",
    ])
    assert rc == 0


def test_cli_maxkmers_cap(synthetic):
    tmp, reads_path, gene_path, gene = synthetic
    out = str(tmp / "out_cap")
    rc = runner_main([
        "-t", "environment-finder",
        "-k", "21", "-i", reads_path, "--seq", gene_path,
        "-o", out, "--coverage", "2", "--maxkmers", "50",
        "--work-dir", str(tmp / "wd_cap"),
    ])
    assert rc == 0
    got = load_graph_txt(os.path.join(out, "mygene", "graph.txt"))
    # cap applies per BFS pass over ORIENTED states before normalization-dedup;
    # the admitted set per pass is <= seeds + 50
    assert len(got) <= 2 * (50 + (len(gene) - 21 + 1))


def test_cli_requires_termination(synthetic):
    tmp, reads_path, gene_path, _ = synthetic
    rc = runner_main([
        "-t", "environment-finder",
        "-k", "21", "-i", reads_path, "--seq", gene_path,
        "-o", str(tmp / "out_err"), "--work-dir", str(tmp / "wd_err"),
    ])
    assert rc == 1  # neither --maxkmers nor --maxradius


def test_cli_missing_reads_file(synthetic):
    tmp, _, gene_path, _ = synthetic
    rc = runner_main([
        "-t", "environment-finder",
        "-k", "21", "-i", str(tmp / "nope.fastq"), "--seq", gene_path,
        "-o", str(tmp / "o2"), "--maxradius", "10",
        "--work-dir", str(tmp / "wd2"),
    ])
    assert rc == 1


def test_bothdirs_superset(synthetic):
    """dir=0 (bothdirs) explores at least the union of dir=-1 and dir=+1."""
    tmp, reads_path, gene_path, gene = synthetic
    out1 = str(tmp / "out_b1")
    out2 = str(tmp / "out_b2")
    for out, both in ((out1, "false"), (out2, "true")):
        rc = runner_main([
            "-t", "environment-finder",
            "-k", "21", "-i", reads_path, "--seq", gene_path,
            "-o", out, "--coverage", "2", "--maxradius", "30",
            "--bothdirs", both, "--work-dir", out + "_wd",
        ])
        assert rc == 0
    e1 = load_graph_txt(os.path.join(out1, "mygene", "graph.txt"))
    e2 = load_graph_txt(os.path.join(out2, "mygene", "graph.txt"))
    assert set(e1) <= set(e2)


@pytest.mark.parametrize("k,extra,engine", [
    (21, [], "dense"),      # exact regime, default forced engine
    (21, [], "probe"),      # exact regime, legacy probe engine
    (33, ["--forcehash", "true"], "probe"),  # hashed regime (probe-only)
])
def test_cli_device_bfs_matches_host(synthetic, monkeypatch, k, extra,
                                     engine):
    """MC_DEVICE_BFS=1 routes the BFS through the whole-environment device
    engines (dense: ops/bfs_dense.py; probe: ops/bfs_device.py; hashed:
    ops/bfs_hashed.py multiword); graph.txt must be identical to the
    host-engine run for EVERY engine choice."""
    tmp, reads_path, gene_path, gene = synthetic
    monkeypatch.setenv("MC_DEVICE_BFS_ENGINE", engine)
    outs = {}
    for tag, dev in (("host", None), ("dev", "1")):
        if dev:
            monkeypatch.setenv("MC_DEVICE_BFS", dev)
        else:
            monkeypatch.delenv("MC_DEVICE_BFS", raising=False)
        out = str(tmp / f"out_devbfs_{k}_{engine}_{tag}")
        rc = runner_main([
            "-t", "environment-finder",
            "-k", str(k), "-i", reads_path, "--seq", gene_path,
            "-o", out, "--coverage", "2", "--maxradius", "30",
            "--work-dir", str(tmp / f"wd_devbfs_{k}_{engine}_{tag}"),
        ] + (["--forcehash", "true"] if k > 31 or extra else []),
        )
        assert rc == 0
        outs[tag] = load_graph_txt(os.path.join(out, "mygene", "graph.txt"))
    assert outs["dev"] == outs["host"] and outs["host"]


def test_cli_profile_writes_trace(synthetic, tmp_path):
    """--profile wraps the run in a jax profiler trace (SURVEY §5.1 aux)."""
    tmp, reads_path, gene_path, gene = synthetic
    trace_dir = str(tmp_path / "trace")
    rc = runner_main([
        "-t", "kmer-counter", "-k", "21", "-i", reads_path,
        "--work-dir", str(tmp_path / "wd"), "--profile", trace_dir,
    ])
    assert rc == 0
    prof = os.path.join(trace_dir, "plugins", "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


def test_cli_multigene_parallel_matches_serial(synthetic, tmp_path):
    """Per-gene task parallelism (-p) produces identical per-gene outputs."""
    tmp, reads_path, gene_path, gene = synthetic
    genes3 = tmp_path / "genes3.fasta"
    rng = np.random.default_rng(3)
    # three genes carved from the same synthetic genome as the fixture
    with open(gene_path) as f:
        pass
    # rebuild the fixture genome deterministically (same as synthetic fixture)
    g_rng = np.random.default_rng(7)
    genome = "".join(g_rng.choice(list("ACGT"), size=2000))
    genes3.write_text(f">gA\n{genome[800:900]}\n>gB\n{genome[200:300]}\n"
                      f">gC\n{genome[1500:1600]}\n")
    outs = {}
    for tag, p in (("serial", "1"), ("par", "4")):
        out = str(tmp_path / f"mg_{tag}")
        rc = runner_main([
            "-t", "environment-finder", "-k", "21", "-i", reads_path,
            "--seq", str(genes3), "-o", out, "-p", p,
            "--coverage", "2", "--maxradius", "40",
            "--work-dir", str(tmp_path / f"wd_{tag}")])
        assert rc == 0
        outs[tag] = {
            gname: load_graph_txt(os.path.join(out, gname, "graph.txt"))
            for gname in ("gA", "gB", "gC")}
    assert outs["par"] == outs["serial"]


def test_cli_device_contraction_matches_host(synthetic, monkeypatch):
    """MC_DEVICE_CONTRACT=1 routes create_picture through the device
    pointer-jumping contraction (calculator auto-route, same policy as the
    FMT pictures): seqs.fasta content and GFA S/L structure must match the
    host sweep."""
    tmp, reads_path, gene_path, gene = synthetic
    outs = {}
    for tag, dev in (("host", "0"), ("dev", "1")):
        monkeypatch.setenv("MC_DEVICE_CONTRACT", dev)
        out = str(tmp / f"out_devcon_{tag}")
        rc = runner_main([
            "-t", "environment-finder",
            "-k", "21", "-i", reads_path, "--seq", gene_path,
            "-o", out, "--coverage", "2", "--maxradius", "40",
            "--work-dir", str(tmp / f"wd_devcon_{tag}"),
        ])
        assert rc == 0
        d = os.path.join(out, "mygene")
        from metacherchant_tpu.dna import reverse_complement
        with open(os.path.join(d, "seqs.fasta")) as f:
            # unitig set up to orientation (the engines may emit either
            # strand; the reference's own choice follows HashMap order)
            seqs = sorted(min(l, reverse_complement(l))
                          for l in f.read().splitlines()
                          if not l.startswith(">"))
        s_lines = l_count = 0
        with open(os.path.join(d, "graph.gfa")) as f:
            for line in f:
                s_lines += line.startswith("S\t")
                l_count += line.startswith("L\t")
        outs[tag] = (seqs, s_lines, l_count)
    monkeypatch.delenv("MC_DEVICE_CONTRACT", raising=False)
    assert outs["dev"] == outs["host"] and outs["host"][0]
