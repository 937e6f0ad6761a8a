"""Differential fuzz: native vs Python FASTA/FASTQ parsing + sketching.

The reference parses via kmerDecoder/kseq
(/root/reference/src/fastx_to_kf.cpp:24-45), which accepts multi-line
FASTA *and* multi-line FASTQ (quality ends when its length reaches the
sequence length).  Both of this repo's parsers
(kspider_tpu/io/fastx.read_records and the native sketch_stream in
native/src/kspider_native.cpp) implement that contract; this module
streams randomized record soup — wrapped seq/qual, CRLF, lowercase,
invalid bases, gzip, missing final newline — through both and asserts
identical hash sets, plus matching loud-error behavior on malformed
input (the pre-round-4 native parser silently mis-parsed wrapped FASTQ
as 4-line records).
"""

import gzip

import numpy as np
import pytest

from kspider_tpu.core import sketch as core_sketch
from kspider_tpu.io import fastx, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

BASES = "ACGTacgtN"


def _random_seq(rng, lo=0, hi=120):
    n = int(rng.integers(lo, hi + 1))
    return "".join(rng.choice(list(BASES), size=n)) if n else ""


def _wrap(text, rng, width_lo=1, width_hi=50):
    """Split text into random-width lines (possibly many, possibly one)."""
    if not text:
        return [""] if rng.random() < 0.5 else []
    lines = []
    i = 0
    while i < len(text):
        w = int(rng.integers(width_lo, width_hi + 1))
        lines.append(text[i : i + w])
        i += w
    return lines

# quality alphabet deliberately includes '@' and '+' so records whose
# quality lines *start* with those characters exercise the
# length-tracking (not sentinel-scanning) parse
QUAL = "!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJ"


def _random_fasta(rng, n_records):
    out = []
    for i in range(n_records):
        seq = _random_seq(rng)
        out.append(f">rec{i} extra words")
        out.extend(_wrap(seq, rng))
    return "\n".join(out), True


def _random_fastq(rng, n_records):
    out = []
    for i in range(n_records):
        seq = _random_seq(rng, lo=1)
        qual = "".join(rng.choice(list(QUAL), size=len(seq)))
        out.append(f"@rec{i} extra")
        out.extend(_wrap(seq, rng))
        out.append("+" + ("rec{i}" if rng.random() < 0.3 else ""))
        # quality wrapped at *different* widths than the sequence
        out.extend(_wrap(qual, rng) or [""])
    return "\n".join(out), False


def _write(tmp_path, text, rng, name="f"):
    crlf = rng.random() < 0.3
    gz = rng.random() < 0.3
    if rng.random() < 0.7:
        text += "\n"
    data = text.replace("\n", "\r\n").encode() if crlf else text.encode()
    path = tmp_path / (name + (".fq.gz" if gz else ".fq"))
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        path.write_bytes(data)
    return str(path)


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_native_matches_python(tmp_path, trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(1, 12))
    text, is_fasta = (
        _random_fasta(rng, n) if trial % 2 == 0 else _random_fastq(rng, n)
    )
    path = _write(tmp_path, text, rng, name=f"t{trial}")
    k = int(rng.integers(5, 25))
    scale = int(rng.choice([1, 2, 10]))

    hashes_n, total_n, inserted_n = native.sketch_file(path, k, scale)
    py = core_sketch._sketch_streams(
        [fastx.read_records(path)], k, scale, "sourmash", False
    )
    assert np.array_equal(hashes_n, py.hashes), f"hash sets differ ({path})"
    assert total_n == py.total_kmers
    assert inserted_n == py.inserted_kmers


def test_multiline_fastq_exact(tmp_path):
    """The concrete pre-fix silent-wrong-results case: wrapped FASTQ."""
    seq = "ACGTACGTACGTTTTTGGGGCCCCAAAA"
    text = (
        "@r1\n" + seq[:10] + "\n" + seq[10:] + "\n+\n"
        + "I" * 11 + "\n" + "I" * (len(seq) - 11) + "\n"
        "@r2\nACGTACGTACGT\n+\nIIIIIIIIIIII\n"
    )
    path = tmp_path / "ml.fq"
    path.write_text(text)
    hashes_n, total_n, _ = native.sketch_file(str(path), 7, 1)
    py = core_sketch._sketch_streams(
        [fastx.read_records(str(path))], 7, 1, "sourmash", False
    )
    assert np.array_equal(hashes_n, py.hashes)
    # both records' every window counted: (28-6) + (12-6)
    assert total_n == py.total_kmers == 22 + 6

    # and the wrapped parse differs from the naive 4-line read: the naive
    # parser would have hashed only seq[:10] for r1 and treated the rest
    # as framing, so the shared total would be smaller
    assert total_n > (10 - 6) + (12 - 6)


@pytest.mark.parametrize(
    "text",
    [
        # truncated: quality shorter than sequence, then EOF
        "@r\nACGTACGTA\n+\nIIII",
        # quality overruns the sequence length
        "@r\nACGT\n+\nIIIIIIIII\n@q\nACGT\n+\nIIII\n",
        # junk line where the next record header should be
        "@r\nACGTACGT\n+\nIIIIIIII\nnot-a-header\nACGT\n",
        # sequence with no '+' separator before EOF
        "@r\nACGTACGT\n",
    ],
)
def test_malformed_fastq_both_loud(tmp_path, text):
    path = tmp_path / "bad.fq"
    path.write_text(text)
    with pytest.raises((IOError, OSError)):
        native.sketch_file(str(path), 5, 1)
    with pytest.raises(ValueError):
        list(fastx.read_records(str(path)))
