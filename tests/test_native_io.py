"""Native (C++) fastio parser vs the pure-Python readers (oracle)."""
import gzip
import os

import numpy as np
import pytest

from metacherchant_tpu import native
from metacherchant_tpu.io import readers

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native fastio unavailable")


def _python_frags(path, fmt=None, quality=None):
    os.environ["MC_NATIVE_IO"] = "0"
    try:
        # _try_native checks availability lazily per call via module state;
        # bypass it by calling the Python internals directly
        fmt = fmt or readers.detect_file_format(path)
        base = fmt.split(".")[0]
        if base == "fasta":
            out = []
            with readers.open_maybe_compressed(path) as fh:
                for _, seq in readers._iter_fasta_records(fh):
                    codes = readers.CHAR_TO_CODE[np.frombuffer(
                        seq.translate(readers._IUPAC_TRANS).encode("ascii"),
                        np.uint8)]
                    out.append(codes.astype(np.int8))
            return out
        return [f for d in readers.iter_dnaq(path, fmt, quality)
                for f in readers._fragments_from_dnaq(d.codes, d.phred)]
    finally:
        del os.environ["MC_NATIVE_IO"]


def _native_frags(path, fmt=None, quality=None):
    fmt = fmt or readers.detect_file_format(path)
    codes, offs = native.parse_fragments(
        path, fmt,
        33 if (fmt.startswith("fasta")
               or readers.determine_quality_format(path) == "sanger") else 64)
    return [codes[offs[i]:offs[i + 1]] for i in range(offs.size - 1)]


def _assert_same(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_fasta_matches_python(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">r1 comment\nACGTAC\nGT\n>r2\n\n>r3\nRYSWKMBDHVN.acgt\n")
    _assert_same(_native_frags(str(p)), _python_frags(str(p)))


def test_fasta_invalid_raises(tmp_path):
    p = tmp_path / "bad.fasta"
    p.write_text(">r\nACGX\n")
    with pytest.raises(readers.SequenceError):
        list(readers.iter_reads_split(str(p)))


def test_fastq_split_matches_python(tmp_path):
    p = tmp_path / "x.fastq"
    recs = [
        ("ACGTNACGT", "IIII!IIII"),   # N + phred-0 separators
        ("NNNN", "IIII"),             # all separators -> no fragments
        ("ACGT", "II"),               # short qual -> phred-0 tail split
        ("", ""),                     # empty read, no separators
        ("acgtACGT", "IIIIIIII"),     # lowercase
    ]
    p.write_text("".join(f"@r{i}\n{s}\n+\n{q}\n"
                         for i, (s, q) in enumerate(recs)))
    _assert_same(_native_frags(str(p)), _python_frags(str(p)))


def test_fastq_gz_matches_python(tmp_path):
    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGTN"), rng.integers(10, 90)))
             for _ in range(200)]
    p = tmp_path / "x.fastq.gz"
    with gzip.open(p, "wt") as f:
        for i, r in enumerate(reads):
            qual = "".join(chr(33 + int(q))
                           for q in rng.integers(0, 40, len(r)))
            f.write(f"@r{i}\n{r}\n+\n{qual}\n")
    _assert_same(_native_frags(str(p)), _python_frags(str(p)))


def test_illumina_quality_offset(tmp_path):
    p = tmp_path / "x.fastq"
    # all-qual >= 64 -> autodetected illumina; phred = q - 64
    p.write_text("@r\nACGT\n+\n@@ab\n")   # '@'=64 -> phred 0 -> split
    assert readers.determine_quality_format(str(p)) == "illumina"
    _assert_same(_native_frags(str(p), quality="illumina"),
                 _python_frags(str(p), quality="illumina"))


def test_counting_equal_native_vs_python(tmp_path, monkeypatch):
    """End-to-end: count_kmers_host over native vs python ingestion."""
    from metacherchant_tpu.counting import count_kmers_host
    rng = np.random.default_rng(6)
    p = tmp_path / "r.fastq"
    with open(p, "w") as f:
        for i in range(100):
            r = "".join(rng.choice(list("ACGTN"), 70))
            f.write(f"@r{i}\n{r}\n+\n{'I' * 70}\n")
    monkeypatch.setenv("MC_NATIVE_IO", "0")
    # force a fresh availability decision for the python run
    native._tried = False
    native._lib = None
    km_py = count_kmers_host([str(p)], 21)
    monkeypatch.delenv("MC_NATIVE_IO")
    native._tried = False
    native._lib = None
    km_nat = count_kmers_host([str(p)], 21)
    assert (km_py.keys == km_nat.keys).all()
    assert (km_py.counts == km_nat.counts).all()


def test_count_kmers_device_native_batches_equal(tmp_path, monkeypatch):
    """count_kmers_device via native bulk batching == python ingestion path,
    including long-read chunking and min_len filtering."""
    from metacherchant_tpu.counting import count_kmers_device
    rng = np.random.default_rng(8)
    p = tmp_path / "mix.fastq"
    with open(p, "w") as f:
        for i in range(60):
            n = int(rng.integers(5, 400))  # some short (filtered), some long (chunked)
            r = "".join(rng.choice(list("ACGTN"), n))
            f.write(f"@r{i}\n{r}\n+\n{'I' * n}\n")
    kw = dict(k=21, min_len=25, batch=16, max_len=64, table_log2=12)
    km_nat = count_kmers_device([str(p)], **kw)
    monkeypatch.setenv("MC_NATIVE_IO", "0")
    native._tried = False
    native._lib = None
    km_py = count_kmers_device([str(p)], **kw)
    monkeypatch.delenv("MC_NATIVE_IO")
    native._tried = False
    native._lib = None
    assert (km_py.keys == km_nat.keys).all()
    assert (km_py.counts == km_nat.counts).all()


def test_parse_reads_matches_python_oracle(tmp_path):
    """native.parse_reads (whole reads, no N-split) must equal iter_dnaq on
    a fastq with Ns, IUPAC letters, short qual lines, and empty reads."""
    import numpy as np
    from metacherchant_tpu import native
    from metacherchant_tpu.io.readers import iter_dnaq
    if not native.available():
        import pytest
        pytest.skip("native io unavailable")

    p = tmp_path / "reads.fastq"
    p.write_text(
        "@r1\nACGTNACGT\n+\nIIIIIIIII\n"
        "@r2 with comment\nRYKMAC\n+\n!!!!!!\n"     # IUPAC -> N semantics
        "@r3\nACGT\n+\nII\n"                        # short qual line -> pad 0
        "@r4\n\n+\n\n"                              # empty read
        "@r5\nacgt\n+\nIIII\n")                     # lowercase
    codes, phred, offs = native.parse_reads(str(p), 33)
    dnaqs = list(iter_dnaq(str(p), "fastq", "sanger"))
    assert offs.size - 1 == len(dnaqs)
    for i, d in enumerate(dnaqs):
        c = codes[offs[i]:offs[i + 1]]
        q = phred[offs[i]:offs[i + 1]]
        assert np.array_equal(c, np.asarray(d.codes, np.int8)), i
        assert np.array_equal(q, np.asarray(d.phred, np.int16)), i


def test_iter_read_batch_pairs_native_equals_fallback(tmp_path, monkeypatch):
    """The native array-batch pair iterator must produce identical batches
    to the DnaQ fallback path, including uneven pair files and batching."""
    import numpy as np
    from metacherchant_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native io unavailable")
    import importlib
    import metacherchant_tpu.algo.classify as classify

    rng = np.random.default_rng(5)
    alpha = "ACGT"
    f1, f2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    for f, n in ((f1, 23), (f2, 17)):   # uneven: PairSource empty-mate tail
        with open(f, "w") as fh:
            for i in range(n):
                ln = int(rng.integers(1, 40))
                s = "".join(alpha[j] for j in rng.integers(0, 4, size=ln))
                fh.write(f"@x{i}\n{s}\n+\n{'I' * ln}\n")

    def batches(env):
        monkeypatch.setenv("MC_NATIVE_IO", env)
        # the native module caches availability; force re-evaluation via the
        # public iterator's fallback branch by reloading is overkill -- the
        # fallback is taken when parse fails OR env=0 at native load time,
        # so emulate by calling the two paths directly
        return list(classify.iter_read_batch_pairs(
            [str(f1), str(f2)], batch=8))

    native_batches = batches("1")
    # force the DnaQ fallback by monkeypatching availability
    monkeypatch.setattr(native, "available", lambda: False)
    fallback_batches = batches("1")
    assert len(native_batches) == len(fallback_batches)
    for (a1, a2), (b1, b2) in zip(native_batches, fallback_batches):
        for a, b in ((a1, b1), (a2, b2)):
            assert np.array_equal(a.lengths, b.lengths)
            L = max(a.codes.shape[1], b.codes.shape[1])
            mask_cols = np.arange(L)
            for arr_a, arr_b in ((a.codes, b.codes), (a.phred, b.phred)):
                pa = np.pad(arr_a, ((0, 0), (0, L - arr_a.shape[1])))
                pb = np.pad(arr_b, ((0, 0), (0, L - arr_b.shape[1])))
                m = mask_cols[None, :] < a.lengths[:, None]
                assert np.array_equal(pa[m], pb[m])
