"""Multi-graph join, Jaccard matrices, FMT calculators and writers."""
import math
import os

import numpy as np
import pytest

from metacherchant_tpu.algo.multi import (
    build_multi_node_graph, multi_merge, jaccard_matrices, determine_color,
    write_gfa_multi, write_seqs_fasta_multi)
from metacherchant_tpu.algo.contraction import Node
from metacherchant_tpu.algo.fmt import (
    MutableKmerView, kmer_env_subgraph, seq_env_subgraph, two_bin_color,
    four_bin_color, build_colored_picture)
from metacherchant_tpu.counting import count_sequences_host
from metacherchant_tpu.dna import normalize, reverse_complement
from metacherchant_tpu.runner import main as runner_main
from metacherchant_tpu.io.writers import load_graph_txt, write_graph_txt


def env_of(seq, k):
    """normalized k-mer -> count=1 environment of a sequence."""
    out = {}
    for i in range(len(seq) - k + 1):
        out[normalize(seq[i:i + k])] = out.get(normalize(seq[i:i + k]), 0) + 1
    return out


def test_jaccard_identical_graphs():
    g = {"ACG": 3, "CGT": 2}
    sym, alt = jaccard_matrices([g, dict(g)])
    assert sym[0][1] == 0.0 and alt[0][1] == 0.0
    assert sym[0][0] == 0.0


def test_jaccard_disjoint_graphs():
    a = {"AAA": 2}
    b = {"CCC": 3}
    sym, alt = jaccard_matrices([a, b])
    assert sym[0][1] == 1.0
    # alt denominator = union - differenceAlt = (2+3) - 2 = 3; 1 - 0/3 = 1
    assert alt[0][1] == 1.0


def test_jaccard_weighted_overlap():
    a = {"AAA": 4, "CCC": 2}
    b = {"AAA": 1}
    # F=a,S=b: difference = |4-1| + 2 = 5; diffAlt = 3+2=5; union = 4+2=6
    # back pass adds nothing (b's AAA in a)
    # intersection = 6-5 = 1; sym = 1-1/6; alt = 1 - 1/(6-5) = 0
    sym, alt = jaccard_matrices([a, b])
    assert abs(sym[0][1] - (1 - 1 / 6)) < 1e-9
    assert abs(alt[0][1] - 0.0) < 1e-9


def test_multi_color_palettes():
    n = Node("AAA", 0)
    n.graphs = frozenset({0})
    assert determine_color(n, 2) == "#ff0000"
    n.graphs = frozenset({0, 1})
    assert determine_color(n, 2) == "#0000ff"
    n.is_gene = True
    assert determine_color(n, 2) == "#00ff00"
    n.is_gene = False
    n.graphs = frozenset({0, 1, 2})
    assert determine_color(n, 3) == "#ff00ff"
    # >3 graphs: greyscale with the reference's %02X overflow at full membership
    n.graphs = frozenset(range(4))
    assert determine_color(n, 4) == "#100100100"
    n.graphs = frozenset({0})
    assert determine_color(n, 4) == "#404040"


def test_multi_join_membership_barrier(tmp_path):
    # two environments sharing a middle segment; contraction must break where
    # membership changes
    seq = "ACGTACGGTACTGACTGCAT"
    k = 5
    g1 = env_of(seq[:14], k)
    g2 = env_of(seq[6:], k)
    nodes = build_multi_node_graph([g1, g2], k, seq[8:12])
    multi_merge(nodes, k)
    alive = [n for n in nodes if not n.deleted and n.id < n.rc.id]
    # each alive node has homogeneous membership
    for n in alive:
        assert n.graphs is not None
    out = str(tmp_path)
    write_gfa_multi(os.path.join(out, "graph.gfa"), nodes, k, [g1, g2])
    write_seqs_fasta_multi(os.path.join(out, "seqs.fasta"), nodes)
    gfa = open(os.path.join(out, "graph.gfa")).read()
    assert "CL:Z:" in gfa and "C2:Z:" in gfa


def test_cli_env_multi(tmp_path):
    k = 7
    rng = np.random.default_rng(1)
    base = "".join(rng.choice(list("ACGT"), size=200))
    g1 = env_of(base[:120], k)
    g2 = env_of(base[60:], k)
    e1, e2 = str(tmp_path / "env1.txt"), str(tmp_path / "env2.txt")
    write_graph_txt(e1, g1)
    write_graph_txt(e2, g2)
    gene = str(tmp_path / "gene.fasta")
    with open(gene, "w") as f:
        f.write(f">g\n{base[80:100]}\n")
    out = str(tmp_path / "out")
    rc = runner_main(["-t", "environment-finder-multi", "-e", e1, e2,
                      "--seq", gene, "-o", out,
                      "--work-dir", str(tmp_path / "wd")])
    assert rc == 0
    for f in ("graph.gfa", "seqs.fasta", "gene.fasta",
              "Jacard_sym.txt", "Jacard_alt.txt"):
        assert os.path.exists(os.path.join(out, f))
    sym = open(os.path.join(out, "Jacard_sym.txt")).read().splitlines()
    assert sym[0].startswith("The[31mWarning! symmetric")
    # diagonal zeros
    assert " 0.00" in sym[2]


def test_kmer_env_flood_destructive():
    k = 5
    seqA = "ACGTACGTTACGGAC"
    seqB = "TTTTTTTTTTTT"  # separate component (homopolymer)
    kmap = count_sequences_host([seqA, seqB], k)
    view = MutableKmerView(kmap)
    sub = kmer_env_subgraph(seqA[:k], k, view, None)
    # component of seqA extracted; all its kmers zeroed
    for s in env_of(seqA, k):
        assert view.get(__import__("metacherchant_tpu.ops.kmers",
                                   fromlist=["hash_str"]).hash_str(s, None)) == 0
    # seqB untouched
    assert view.get(__import__("metacherchant_tpu.ops.kmers",
                               fromlist=["hash_str"]).hash_str("TTTTT", None)) > 0
    assert set(sub) == set(env_of(seqA, k))


def test_seq_env_matches_env_with_cov1():
    k = 7
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), size=500))
    kmap = count_sequences_host([genome], k)
    sub = seq_env_subgraph(genome[100:140], k, kmap, None, max_radius=10,
                           max_kmers=None)
    # sequential string engine must agree with the vectorized path
    sub2 = seq_env_subgraph(genome[100:140], k, kmap, None, max_radius=10,
                            max_kmers=10**9)  # forces the FIFO engine
    assert sub == sub2


def test_colored_picture_color_barrier(tmp_path):
    k = 5
    seq = "ACGTACGGTACTGACT"
    sub = env_of(seq, k)
    half = set(list(sorted(sub))[: len(sub) // 2])
    color = lambda s: "GREEN" if s in half else "BLUE"
    nodes = build_colored_picture(sub, k, color, str(tmp_path), "donor")
    for n in nodes:
        if not n.deleted:
            # every unitig is color-homogeneous by construction of the barrier
            for i in range(len(n.seq) - k + 1):
                assert color(normalize(n.seq[i:i + k])) == n.color
    assert os.path.exists(tmp_path / "donor_seqs.fasta")
    assert os.path.exists(tmp_path / "donor.gfa")
    gfa = open(tmp_path / "donor.gfa").read()
    assert "CL:Z:GREEN" in gfa or "CL:Z:BLUE" in gfa


def test_bin_color_predicates():
    pos = count_sequences_host(["ACGTACG"], 5)
    neg = count_sequences_host(["TTTTTTT"], 5)
    c2 = two_bin_color(5, None, pos, neg)
    assert c2("ACGTA") == "GREEN"
    assert c2("TTTTT") == "BLUE"
    assert c2("GGGGG") == "BLACK"
    c4 = four_bin_color(5, None, pos, neg, neg, neg)
    assert c4("ACGTA") == "RED"
    assert c4("TTTTT") == "GREY"  # in 3 bins
    assert c4("GGGGG") == "BLACK"


def test_load_present_kmer_strings_matches_host(tmp_path):
    """LargeKmerLoader equivalent: hashed-map string reconstruction from reads
    equals the host normalized-kmer -> count dict (k > 31)."""
    import numpy as np
    from metacherchant_tpu.counting import (
        count_kmers_host, load_present_kmer_strings)
    from metacherchant_tpu.dna import normalize, reverse_complement
    from collections import Counter

    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), 300))
    reads = []
    for _ in range(40):
        i = rng.integers(0, len(genome) - 60)
        r = genome[i:i + 60]
        if rng.random() < 0.5:
            r = reverse_complement(r)
        reads.append(r)
    f = tmp_path / "reads.fasta"
    f.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))

    k = 33
    kmap = count_kmers_host([str(f)], k, "poly")
    got = load_present_kmer_strings([str(f)], k, "poly", kmap)
    want = Counter()
    for r in reads:
        for i in range(len(r) - k + 1):
            want[normalize(r[i:i + k])] += 1
    assert got == dict(want)


@pytest.mark.parametrize("k", [21, 33])
def test_cli_fmt_visualiser(tmp_path, k, monkeypatch):
    """End-to-end fmt-visualiser in both regimes (k>31 exercises the
    LargeKmerLoader string-reconstruction path)."""
    import numpy as np
    from metacherchant_tpu.runner import main as runner_main
    from metacherchant_tpu.dna import reverse_complement

    monkeypatch.setenv("MC_HOST_COUNT", "1")
    rng = np.random.default_rng(11)
    genomes = {"donor": "".join(rng.choice(list("ACGT"), 200)),
               "before": "".join(rng.choice(list("ACGT"), 200)),
               "after": "".join(rng.choice(list("ACGT"), 200))}

    def make_reads(g, n):
        reads = []
        for _ in range(n):
            i = rng.integers(0, len(g) - 50)
            r = g[i:i + 50]
            if rng.random() < 0.5:
                r = reverse_complement(r)
            reads.append(r)
        return reads

    def write_fastq(path, reads):
        with open(path, "w") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    for name, g in genomes.items():
        write_fastq(tmp_path / f"{name}.fastq", make_reads(g, 30))
    bins = tmp_path / "bins"
    bins.mkdir()
    stems = ["settle", "not_settle", "stay", "gone", "came_from_donor",
             "came_from_baseline", "came_from_both", "came_itself"]
    src = {"settle": "donor", "not_settle": "donor", "stay": "before",
           "gone": "before"}
    for stem in stems:
        g = genomes[src.get(stem, "after")]
        for x in ("1", "2", "s"):
            write_fastq(bins / f"{stem}_{x}.fastq", make_reads(g, 5))

    out = tmp_path / "fmt_out"
    rc = runner_main([
        "-t", "fmt-visualiser", "-k", str(k),
        "-donor", str(tmp_path / "donor.fastq"),
        "-before", str(tmp_path / "before.fastq"),
        "-after", str(tmp_path / "after.fastq"),
        "-i", str(bins), "--ext", "fastq",
        "-o", str(out), "--work-dir", str(tmp_path / "wd"),
    ])
    assert rc == 0
    for name in ("donor", "before", "after"):
        gfa = out / f"{name}.gfa"
        assert gfa.exists()
        s_lines = [l for l in open(gfa) if l.startswith("S")]
        assert s_lines, name
        # every unitig k-mer must belong to that metagenome's k-mer set
        from metacherchant_tpu.dna import normalize
        kmers = set()
        g = genomes[name]
        reads_file = tmp_path / f"{name}.fastq"
        for line_no, line in enumerate(open(reads_file)):
            if line_no % 4 == 1:
                r = line.strip()
                for i in range(len(r) - k + 1):
                    kmers.add(normalize(r[i:i + k]))
        for l in s_lines:
            seq = l.split("\t")[2]
            for i in range(len(seq) - k + 1):
                assert normalize(seq[i:i + k]) in kmers


def test_keys_of_kmer_strings_matches_hash_str():
    import numpy as np
    from metacherchant_tpu.ops.kmers import (
        keys_of_kmer_strings, fw_codes_of_kmer_strings, hash_str)
    from metacherchant_tpu.dna import kmer_to_code

    rng = np.random.default_rng(3)
    for k, hasher in [(7, None), (21, None), (31, None),
                      (21, "poly"), (35, "poly"), (35, "fnv1a")]:
        kmers = ["".join(rng.choice(list("ACGT"), k)) for _ in range(64)]
        got = keys_of_kmer_strings(kmers, k, hasher)
        want = np.array([hash_str(s, hasher) for s in kmers], np.int64)
        assert (got == want).all(), (k, hasher)
        if hasher is None:
            fw = fw_codes_of_kmer_strings(kmers, k)
            want_fw = np.array([kmer_to_code(s) for s in kmers], np.int64)
            assert (fw == want_fw).all()
    assert keys_of_kmer_strings([], 21, None).size == 0


def test_batched_colors_match_scalar_predicate():
    import numpy as np
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), 200)) for _ in range(4)]
    bins = [count_sequences_host([s], 15) for s in seqs]
    kmers = sorted({s[i:i + 15] for s in seqs for i in range(0, 150, 3)}
                   | {"".join(rng.choice(list("ACGT"), 15)) for _ in range(50)})
    for color in (two_bin_color(15, None, bins[0], bins[1]),
                  four_bin_color(15, None, *bins)):
        batch = color.colors_for(kmers)
        assert list(batch) == [color(s) for s in kmers]


def test_colored_picture_batched_equals_scalar(tmp_path, monkeypatch):
    """The vectorized color + auto device-contraction path produces the same
    GFA segment content as the per-k-mer host path."""
    import numpy as np
    from metacherchant_tpu.counting import count_sequences_host as cs

    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), 3000))
    k = 15
    kmap = cs([genome], k)
    sub = {normalize(genome[i:i + k]): 1
           for i in range(len(genome) - k + 1)}
    pos = cs([genome[:1500]], k)
    neg = cs([genome[1200:]], k)
    color = two_bin_color(k, None, pos, neg)

    def s_lines(path):
        return sorted(ln.split("\t")[2] + "|" + ln.split("\t")[5]
                      for ln in open(path) if ln.startswith("S"))

    monkeypatch.setenv("MC_DEVICE_CONTRACT", "0")
    build_colored_picture(sub, k, color, str(tmp_path), "host")
    monkeypatch.setenv("MC_DEVICE_CONTRACT", "1")
    build_colored_picture(sub, k, color, str(tmp_path), "dev")
    host = s_lines(tmp_path / "host.gfa")
    dev = s_lines(tmp_path / "dev.gfa")
    # same unitig multiset up to orientation
    def canon(entries):
        out = []
        for e in entries:
            seq, col = e.split("|")
            out.append(normalize(seq) + "|" + col)
        return sorted(out)
    assert canon(host) == canon(dev)
