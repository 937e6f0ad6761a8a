"""Native runtime cross-validation against the Python implementations."""

import numpy as np
import pytest

from kspider_tpu.core import index as core_index
from kspider_tpu.core import pairwise as core_pairwise
from kspider_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_build_colors_matches_python(rng):
    n_samples = 20
    hashes = rng.integers(0, 5000, size=30_000, dtype=np.uint64)
    gids = rng.integers(0, n_samples, size=30_000).astype(np.int32)
    offs_n, mems_n, counts_n = native.build_colors(hashes, gids)

    arrays = [
        np.unique(hashes[gids == g]) for g in range(n_samples)
    ]
    idx = core_index.build_index_from_hash_sets(
        [f"s{g}" for g in range(n_samples)], arrays
    )
    assert np.array_equal(offs_n, idx.color_offsets)
    assert np.array_equal(mems_n, idx.color_members)
    assert np.array_equal(counts_n, idx.color_counts)


def test_build_colors_dedupes_postings():
    hashes = np.array([7, 7, 7, 9], dtype=np.uint64)
    gids = np.array([1, 1, 2, 1], dtype=np.int32)
    offs, mems, counts = native.build_colors(hashes, gids)
    got = {
        tuple(mems[offs[i] : offs[i + 1]].tolist()): int(counts[i])
        for i in range(len(counts))
    }
    assert got == {(1,): 1, (1, 2): 1}


def test_native_tsv_matches_python(tmp_path, rng):
    n = 30
    shared = rng.integers(0, 100000, size=(n, n)).astype(np.int64)
    shared = np.triu(shared, 1)
    shared += shared.T
    counts = rng.integers(1, 200000, size=n).astype(np.int64)
    counts[3] = 0  # division-by-zero path -> inf

    idx = core_index.ColorIndex(
        names=[f"s{i}" for i in range(n)],
        group_kmer_count=counts.copy(),
        color_ids=np.empty(0, np.uint64),
        color_offsets=np.zeros(1, np.int64),
        color_members=np.empty(0, np.int32),
        color_counts=np.empty(0, np.int64),
    )

    native.write_pairwise_tsv(str(tmp_path / "nat.tsv"), shared, counts)

    # python fallback path: bypass the native branch
    import kspider_tpu.io.native as native_mod

    orig = native_mod.available
    native_mod.available = lambda: False
    try:
        core_pairwise.write_pairwise_tsv(str(tmp_path / "py"), idx, shared)
    finally:
        native_mod.available = orig

    nat = (tmp_path / "nat.tsv").read_text()
    py = (tmp_path / "py_kSpider_pairwise.tsv").read_text()
    assert nat == py
