"""C++ host runtime tests: encoder, glibc-rand parity, traceback walker
parity vs oracle, FASTA/FASTQ parsing."""

import numpy as np
import pytest

from swtpu import runtime_native as rn
from swtpu.core import oracle
from swtpu.core.encode import GlibcRand, encode, random_pair

pytestmark = pytest.mark.skipif(not rn.available(),
                                reason="native runtime not built")


def test_encode_matches_python():
    s = "ACGTacgtTTGGCCAA"
    np.testing.assert_array_equal(rn.encode(s), encode(s.upper()))


def test_encode_invalid():
    with pytest.raises(ValueError, match="position 3"):
        rn.encode("ACGXACGT")


def test_glibc_rand_parity():
    py = GlibcRand(1).reference_sequence(64)
    cc = rn.reference_random(64, seed=1)
    np.testing.assert_array_equal(py, cc)


def test_traceback_matches_oracle():
    a, b = random_pair(50, 40, seed=3)
    ref = oracle.fill(a, b)
    assert rn.traceback(ref.P, ref.max_pos) == oracle.backtrack(ref.P, ref.max_pos)
    sa, sb = rn.alignment_strings(a, b, ref.P, ref.max_pos)
    pa, pb = oracle.alignment_strings(a, b, ref.P, ref.max_pos)
    assert (sa, sb) == (pa, pb)


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "seqs.fa"
    p.write_text(">s1 header\nACGT\nACGT\n>s2\nTTTT\n>empty\n>s3\nGG\n")
    seqs = rn.read_seqfile(str(p))
    assert len(seqs) == 4
    np.testing.assert_array_equal(seqs[0], encode("ACGTACGT"))
    np.testing.assert_array_equal(seqs[1], encode("TTTT"))
    assert len(seqs[2]) == 0
    np.testing.assert_array_equal(seqs[3], encode("GG"))


def test_fastq(tmp_path):
    p = tmp_path / "reads.fq"
    p.write_text("@r1\nACGT\n+\n!!!!\n@r2\nGGCC\n+\n####\n")
    seqs = rn.read_seqfile(str(p))
    assert len(seqs) == 2
    np.testing.assert_array_equal(seqs[0], encode("ACGT"))
    np.testing.assert_array_equal(seqs[1], encode("GGCC"))


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        rn.read_seqfile("/nonexistent/path.fa")
