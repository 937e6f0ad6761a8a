"""Hashing, k-mer extraction, and sketching semantics."""

import gzip

import numpy as np
import pytest

from kspider_tpu.core import hashing, sketch
from kspider_tpu.io import fastx


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_canonical_invariance(rng):
    seq = "".join(rng.choice(list("ACGT"), size=500))
    h1 = hashing.kmer_hashes_sourmash(seq, 21)
    h2 = hashing.kmer_hashes_sourmash(revcomp(seq), 21)
    assert np.array_equal(np.sort(h1), np.sort(h2))


def test_invalid_bases_skipped():
    seq = "ACGTACGTNNACGTACGTACGTACGT"
    h = hashing.kmer_hashes_sourmash(seq, 7)
    # windows touching the Ns are dropped
    valid = [seq[i : i + 7] for i in range(len(seq) - 6) if "N" not in seq[i : i + 7]]
    assert len(h) == len(valid)


def test_lowercase_normalized():
    a = hashing.kmer_hashes_sourmash("acgtacgtacgt", 7)
    b = hashing.kmer_hashes_sourmash("ACGTACGTACGT", 7)
    assert np.array_equal(a, b)


def test_murmur_known_basics():
    # murmur64a is deterministic and seed-sensitive
    row = np.frombuffer(b"ACGTACGTACGTACGTACGTA", dtype=np.uint8)[None, :]
    h42 = hashing.murmur64(row, seed=42)
    h43 = hashing.murmur64(row, seed=43)
    assert h42 != h43
    assert hashing.murmur64(row, seed=42) == h42


def test_murmur_matches_native():
    from kspider_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    for length in (3, 8, 13, 21, 31, 64):
        rows = rng.integers(0, 256, size=(200, length), dtype=np.uint8)
        assert np.array_equal(
            native.murmur64_batch(rows, 42), hashing.murmur64(rows, 42)
        )


def _mmh3_x64_128_h1_scalar(data: bytes, seed: int) -> int:
    # independent scalar transcription of the canonical smhasher
    # MurmurHash3_x64_128 (first 64 bits of the digest)
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M
        k ^= k >> 33
        return k

    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    nblocks = len(data) // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16 :]
    t = len(tail)
    k1 = k2 = 0
    if t > 8:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * c2) & M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = fmix(h1)
    h2 = fmix(h2)
    return (h1 + h2) & M


def test_murmur3_external_known_answer_vectors():
    """Known-answer vectors pinned to EXTERNAL sources (not same-author
    transcriptions): ``hash('ACG', 42)`` is sourmash's own test vector for
    its k-mer hash (first 64 bits of MurmurHash3_x64_128 at seed 42);
    ``hash('foo', 0)`` is the widely published mmh3 doc vector.  These
    catch wrong-constant bugs that three same-author replicas all miss."""
    acg = np.frombuffer(b"ACG", dtype=np.uint8)
    assert int(hashing.murmur3_64(acg, seed=42)[0]) == 1731421407650554201
    foo = np.frombuffer(b"foo", dtype=np.uint8)
    assert int(hashing.murmur3_64(foo, seed=0)[0]) == 16316970633193145697
    # 16-byte (full-block) and >16-byte inputs, from the mmh3 library docs:
    # mmh3.hash64('hello', signed=False) -> (14688674573012802306, ...)
    hello = np.frombuffer(b"hello", dtype=np.uint8)
    assert int(hashing.murmur3_64(hello, seed=0)[0]) == 14688674573012802306


def test_murmur3_matches_scalar_reference():
    rng = np.random.default_rng(7)
    for length in (1, 3, 7, 8, 9, 15, 16, 17, 21, 31, 32, 40):
        rows = rng.integers(0, 256, size=(50, length), dtype=np.uint8)
        got = hashing.murmur3_64(rows, seed=42)
        expect = [
            _mmh3_x64_128_h1_scalar(bytes(r.tobytes()), 42) for r in rows
        ]
        assert got.tolist() == expect, length


def test_murmur3_matches_native():
    from kspider_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    for length in (3, 8, 13, 21, 31, 64):
        rows = rng.integers(0, 256, size=(200, length), dtype=np.uint8)
        assert np.array_equal(
            native.murmur3_batch(rows, 42), hashing.murmur3_64(rows, 42)
        )


def test_integer_hash_invertible_range():
    ks = 21
    x = np.arange(1000, dtype=np.uint64)
    h = hashing.integer_hash(x, ks)
    assert len(np.unique(h)) == 1000  # injective on the masked domain
    assert int(h.max()) < (1 << (2 * ks))


def test_scale_downsampling_property(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    p = tmp_path / "x.fa"
    p.write_text(f">s\n{seq}\n")
    full = sketch.sketch_single_end(str(p), 15, scale=1)
    down = sketch.sketch_single_end(str(p), 15, scale=16)
    max_hash = sketch.UINT64_MAX // 16
    assert np.array_equal(down.hashes, full.hashes[full.hashes < max_hash])


def test_singleton_removal(tmp_path):
    # k-mers occurring once are dropped with --singletones
    seq1 = "ACGTACGTAGGCTAGCTAGCT"
    p = tmp_path / "r.fq"
    # seq repeated twice + one unique read
    p.write_text(
        f"@a\n{seq1}\n+\n{'I' * len(seq1)}\n"
        f"@b\n{seq1}\n+\n{'I' * len(seq1)}\n"
        f"@c\nTTTTAAAACCCCGGGGTTTTA\n+\n{'I' * 21}\n"
    )
    keep = sketch.sketch_single_end(str(p), 15, remove_singletons=True)
    all_ = sketch.sketch_single_end(str(p), 15, remove_singletons=False)
    # independent count model: occurrences across (and within) reads
    from collections import Counter

    counts = Counter()
    for s, times in [(seq1, 2), ("TTTTAAAACCCCGGGGTTTTA", 1)]:
        for _ in range(times):
            counts.update(hashing.kmer_hashes_sourmash(s, 15).tolist())
    expected = np.sort(
        np.array([h for h, c in counts.items() if c > 1], dtype=np.uint64)
    )
    assert np.array_equal(keep.hashes, expected)
    assert len(all_.hashes) > len(keep.hashes)


def test_paired_end_matches_union(tmp_path, rng):
    s1 = "".join(rng.choice(list("ACGT"), size=800))
    s2 = "".join(rng.choice(list("ACGT"), size=800))
    (tmp_path / "x_R1.fq").write_text(f"@a\n{s1}\n+\n{'I' * len(s1)}\n")
    (tmp_path / "x_R2.fq").write_text(f"@a\n{s2}\n+\n{'I' * len(s2)}\n")
    res = sketch.sketch_paired_end(
        str(tmp_path / "x_R1.fq"), str(tmp_path / "x_R2.fq"), 21
    )
    expect = np.union1d(
        hashing.kmer_hashes_sourmash(s1, 21), hashing.kmer_hashes_sourmash(s2, 21)
    )
    assert np.array_equal(res.hashes, expect)
    assert sketch.paired_end_basename(str(tmp_path / "x_R1.fq")) == "x"


def test_fastx_formats(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), size=300))
    fa = tmp_path / "m.fa"
    fa.write_text(">a desc here\n" + "\n".join(seq[i : i + 60] for i in range(0, 300, 60)) + "\n>b\nACGT\n")
    recs = list(fastx.read_records(str(fa)))
    assert recs == [("a", seq), ("b", "ACGT")]

    fq = tmp_path / "m.fq"
    # kseq semantics: quality length must equal sequence length
    fq.write_text(f"@r1 x\n{seq}\n+\n{'I' * 300}\n@r2\nACGT\n+\nIIII\n")
    recs = list(fastx.read_records(str(fq)))
    assert recs == [("r1", seq), ("r2", "ACGT")]

    gz = tmp_path / "m.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(f">a\n{seq}\n")
    assert list(fastx.read_records(str(gz))) == [("a", seq)]


def test_protein_codes():
    codes = hashing.protein_kmer_codes("ACDEFGHIKLMNPQRSTVWY", 7)
    assert len(codes) == 14
    assert len(np.unique(codes)) == 14
    day = hashing.protein_kmer_codes("ACDEFGHIKLMNPQRSTVWY", 7, dayhoff=True)
    assert len(day) == 14
    # dayhoff collapses groups -> codes bounded by 6 symbols in 5 bits
    assert int(day.max()) < (1 << 35)


def test_protein_sketch_threshold_semantics(tmp_path, rng):
    """Pins the reference's protein downsampling rule
    (/root/reference/src/fastx_to_kf.cpp:177-199): threshold =
    TW(2^(k*5/2)) masked to 2^(5k), applied to the packed code; the packed
    representation (not the hash) is what gets inserted."""
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    seq = "".join(rng.choice(aas, size=3000))
    p = tmp_path / "p.fa"
    p.write_text(f">x\n{seq}\n")
    k, scale = 10, 4
    full = sketch.sketch_protein(str(p), k)
    down = sketch.sketch_protein(str(p), k, scale=scale)
    hasher_ksize = (k * 5) // 2
    max_real = int(
        hashing.integer_hash(
            np.array([1 << hasher_ksize], dtype=np.uint64), hasher_ksize
        )[0]
    )
    max_hash = max_real // scale
    hs = hashing.integer_hash(full.hashes, hasher_ksize)
    expect = np.sort(full.hashes[hs < max_hash])
    assert np.array_equal(down.hashes, expect)
    assert 0 < len(down.hashes) < len(full.hashes)


def test_protein_ksize_cap():
    with pytest.raises(ValueError):
        hashing.protein_kmer_codes("ACDEFGHIKLMNPQRS", 14)
