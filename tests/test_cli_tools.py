"""End-to-end CLI tests for the tools that lacked CLI-level coverage:
runner --tools/--version, seq-cov, triple-reads-classifier,
recipient-visualiser, fmt-visualizer, environment-assembler-finder
(with a stub assembler on disk).

Oracles are independent host-side computations (count_kmers_host +
string-window lookups), mirroring the reference's per-tool semantics
(src/tools/SequenceCoverage.java, TripleReadsClassifier.java,
RecipientVisualiser.java, FMTVisualizer.java, EnvironmentAssemblerFinder.java).
"""
import os
import stat

import numpy as np
import pytest

from metacherchant_tpu.runner import main as runner_main, _TOOL_MODULES
from metacherchant_tpu.counting import count_kmers_host
from metacherchant_tpu.ops.kmers import hash_str


def _write_fastq(path, seqs, name_prefix="r"):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@{name_prefix}{i}\n{s}\n+\n{'I' * len(s)}\n")
    return str(path)


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(11)
    return _rand_seq(rng, 3000), rng


def _sample_reads(genome, rng, n, length):
    out = []
    for _ in range(n):
        s = int(rng.integers(0, len(genome) - length))
        out.append(genome[s:s + length])
    return out


def test_runner_tools_listing(capsys):
    assert runner_main(["--tools"]) == 0
    out = capsys.readouterr().out
    for name in ("environment-finder", "environment-finder-multi",
                 "reads-classifier", "triple-reads-classifier",
                 "kmer-counter", "seq-cov", "environment-assembler-finder",
                 "fmt-visualiser", "fmt-visualizer", "recipient-visualiser"):
        assert name in out, name
    assert set(_TOOL_MODULES) >= {"environment-finder", "kmer-counter"}


def test_runner_version(capsys):
    assert runner_main(["--version"]) == 0
    assert "metacherchant-tpu" in capsys.readouterr().out


def test_runner_unknown_tool(capsys):
    assert runner_main(["-t", "no-such-tool"]) != 0


def test_cli_seq_cov(tmp_path, genome):
    g, rng = genome
    k = 21
    bins = {}
    for name, region in (("donor", (0, 1200)), ("before", (600, 1800)),
                         ("both", (1200, 2400)), ("itself", (1800, 3000))):
        lo, hi = region
        seqs = _sample_reads(g[lo:hi], rng, 60, 80)
        bins[name] = _write_fastq(tmp_path / f"{name}.fastq", seqs, name)
    queries = [g[100:260], g[1400:1560], g[2600:2760]]
    qpath = tmp_path / "queries.fasta"
    with open(qpath, "w") as f:
        for i, s in enumerate(queries):
            f.write(f">q{i}\n{s}\n")

    out = tmp_path / "out"
    rc = runner_main([
        "-t", "seq-cov", "-k", str(k),
        "--from-donor", bins["donor"], "--from-before", bins["before"],
        "--from-both", bins["both"], "--itself", bins["itself"],
        "-r", str(qpath), "-o", str(out),
        "--work-dir", str(tmp_path / "wd"), "--force", "true"])
    assert rc == 0

    lines = open(out / "seq_cov.csv").read().splitlines()
    assert lines[0].startswith("name, from_donor_depth, from_donor_breadth")
    assert len(lines) == 1 + len(queries)

    # independent oracle: depth/breadth per (query, bin)
    maps = {name: count_kmers_host([bins[name]], k) for name in
            ("donor", "before", "both", "itself")}
    for line, q in zip(lines[1:], queries):
        fields = line.split(", ")
        assert fields[0] == q
        vals = [float(x) for x in fields[1:]]
        denom = len(q) - k + 1
        for j, name in enumerate(("donor", "before", "both", "itself")):
            cov = [max(maps[name].get(hash_str(q[i:i + k], None)), 0)
                   for i in range(denom)]
            assert vals[2 * j] == pytest.approx(sum(cov) / denom)
            assert vals[2 * j + 1] == pytest.approx(
                sum(c > 0 for c in cov) / denom)


def test_cli_triple_reads_classifier(tmp_path, genome):
    g, rng = genome
    k, k2 = 21, 31
    graph_reads = _sample_reads(g, rng, 600, 100)
    graph_path = _write_fastq(tmp_path / "graph.fastq", graph_reads, "g")

    full = _sample_reads(g, rng, 5, 100)          # pass both k: FOUND
    rand = [_rand_seq(rng, 100) for _ in range(5)]  # NOT_FOUND
    # width denominator is the read LENGTH (ReadsFinderInGraph.java:43-44):
    # genome prefix L gives width (L-k+1)/100 -> L=78: 0.58 @k21, 0.48 @k31,
    # half-found (>=0.4) at both k values, found (>=0.9) at neither
    halfr = [g[1000 + i * 37:1000 + i * 37 + 78] + _rand_seq(rng, 22)
             for i in range(5)]

    r1 = full + rand + full + halfr
    r2 = list(full) + rand + rand + halfr          # pairs: FF, NN, FN, HH
    p1 = _write_fastq(tmp_path / "reads_1.fastq", r1, "a")
    p2 = _write_fastq(tmp_path / "reads_2.fastq", r2, "b")

    out = tmp_path / "out"
    rc = runner_main([
        "-t", "triple-reads-classifier", "-k", str(k), "-k2", str(k2),
        "-i", graph_path, "-r", p1, p2, "-o", str(out),
        "--work-dir", str(tmp_path / "wd"), "--force", "true"])
    assert rc == 0

    def seqs_of(name):
        path = out / name
        if not os.path.exists(path):
            return []
        lines = open(path).read().splitlines()
        return [lines[i + 1] for i in range(0, len(lines), 4)]

    assert sorted(seqs_of("found_1.fastq")) == sorted(full)
    assert sorted(seqs_of("found_2.fastq")) == sorted(full)
    assert sorted(seqs_of("not_found_1.fastq")) == sorted(rand)
    assert sorted(seqs_of("not_found_2.fastq")) == sorted(rand)
    # mixed pairs route each mate separately into the _s bins
    assert sorted(seqs_of("found_s.fastq")) == sorted(full)
    assert sorted(seqs_of("not_found_s.fastq")) == sorted(rand)
    # half reads: width >= 0.4 at both k values, found at neither
    assert sorted(seqs_of("half_found_1.fastq")) == sorted(halfr)
    assert sorted(seqs_of("half_found_2.fastq")) == sorted(halfr)


def _classifier_bins(tmp_path, rng, g, stems, ext="fastq"):
    d = tmp_path / "bins"
    d.mkdir(exist_ok=True)
    for stem in stems:
        for x in ("1", "2", "s"):
            _write_fastq(d / f"{stem}_{x}.{ext}",
                         _sample_reads(g, rng, 8, 60), stem)
    return str(d)


def test_cli_recipient_visualiser(tmp_path, genome):
    g, rng = genome
    after = _write_fastq(tmp_path / "after.fastq",
                         _sample_reads(g, rng, 400, 80), "aft")
    bins = _classifier_bins(tmp_path, rng, g,
                            ("came_from_donor", "came_from_baseline",
                             "came_from_both", "came_itself"))
    seqs = tmp_path / "seqs.fasta"
    with open(seqs, "w") as f:
        f.write(f">s0\n{g[500:650]}\n>s1\n{g[2000:2150]}\n")

    out = tmp_path / "out"
    rc = runner_main([
        "-t", "recipient-visualiser", "-k", "21", "--after-files", after,
        "--seq", str(seqs), "-i", bins, "--ext", "fastq", "-o", str(out),
        "--maxradius", "50",
        "--work-dir", str(tmp_path / "wd"), "--force", "true"])
    assert rc == 0
    for i in range(2):
        gfa = out / "after" / f"comp_{i}.gfa"
        fa = out / "after" / f"comp_{i}_seqs.fasta"
        assert gfa.exists() and fa.exists()
        text = open(gfa).read()
        assert "\nL\t" in text or text.startswith("S\t") or "S\t" in text
        # every S line carries a CL color tag (colored picture)
        for line in text.splitlines():
            if line.startswith("S\t"):
                assert "LN:i:" in line and "KC:i:" in line


def test_cli_fmt_visualizer(tmp_path, genome):
    g, rng = genome
    # three tiny disjoint metagenomes so component counts stay small
    donor = _write_fastq(tmp_path / "donor.fastq", [g[0:120]] * 4, "d")
    before = _write_fastq(tmp_path / "before.fastq", [g[1000:1120]] * 4, "b")
    after = _write_fastq(tmp_path / "after.fastq", [g[2000:2120]] * 4, "a")
    bins = _classifier_bins(tmp_path, rng, g,
                            ("settle", "not_settle", "stay", "gone",
                             "came_from_donor", "came_from_baseline",
                             "came_from_both", "came_itself"))

    out = tmp_path / "out"
    rc = runner_main([
        "-t", "fmt-visualizer", "-k", "21", "--donor-files", donor,
        "--before-files", before, "--after-files", after,
        "-i", bins, "--ext", "fastq", "-o", str(out),
        "--work-dir", str(tmp_path / "wd"), "--force", "true"])
    assert rc == 0

    from metacherchant_tpu.dna import normalize
    k = 21
    # each metagenome is one connected component -> exactly comp0 per subdir,
    # and its S lines (split only at color barriers) reconstruct the
    # fragment's canonical k-mer set exactly
    for sub, frag in (("donor", g[0:120]), ("before", g[1000:1120]),
                      ("after", g[2000:2120])):
        assert (out / sub / "comp0.gfa").exists(), sub
        assert not (out / sub / "comp1.gfa").exists(), sub
        want = {normalize(frag[i:i + k]) for i in range(len(frag) - k + 1)}
        got = set()
        for line in open(out / sub / "comp0.gfa"):
            if line.startswith("S\t"):
                seq = line.split("\t")[2]
                got |= {normalize(seq[i:i + k])
                        for i in range(len(seq) - k + 1)}
        assert got == want, sub


def test_cli_environment_assembler_finder(tmp_path, genome):
    g, rng = genome
    reads = _sample_reads(g, rng, 300, 150)
    reads_path = _write_fastq(tmp_path / "reads.fastq", reads, "r")
    seq = tmp_path / "gene.fasta"
    with open(seq, "w") as f:
        f.write(f">gene\n{g[500:700]}\n")

    # stub assembler: "perfect" SPAdes that emits its input reads as contigs
    spades_dir = tmp_path / "spades"
    spades_dir.mkdir()
    stub = spades_dir / "spades.py"
    stub.write_text(
        "import sys, os\n"
        "args = sys.argv[1:]\n"
        "cut = args[args.index('--12') + 1]\n"
        "out = args[args.index('-o') + 1]\n"
        "os.makedirs(out, exist_ok=True)\n"
        "data = open(cut).read()\n"
        "open(os.path.join(out, 'contigs.fasta'), 'w').write(data)\n"
        "print('stub spades done')\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    out = tmp_path / "out"
    rc = runner_main([
        "-t", "environment-assembler-finder", "-k", "21", "-i", reads_path,
        "--seq", str(seq), "-o", str(out), "--maxradius", "100",
        "--coverage", "1", "--assembler", "spades",
        "--assemblerpath", str(spades_dir), "-pf", "50",
        "--work-dir", str(tmp_path / "wd"), "--force", "true"])
    assert rc == 0

    # stage 1: environment + filtered reads
    assert (out / "graph.txt").exists()
    cut = open(out / "cutReads0.fasta").read()
    assert cut.count(">") > 0
    # stage 2: stub assembler ran and contigs were renamed
    assert (out / "contigs0.fasta").exists()
    # stage 3: k=55 re-run on contigs into result/
    assert (out / "result" / "graph.txt").exists()
    env55 = open(out / "result" / "graph.txt").read().splitlines()
    assert env55 and len(env55[0].split()[0]) == 55
    assert (out / "result" / "cutReads0.fasta").exists()
