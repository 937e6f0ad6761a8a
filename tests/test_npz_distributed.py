"""npz index cache + hash-range partitioning."""

import numpy as np

from kspider_tpu.core.index import build_index_from_hash_sets
from kspider_tpu.io import npz_index
from kspider_tpu.ops import pairwise as pw
from kspider_tpu.parallel import distributed


def test_npz_roundtrip(tmp_path, rng):
    arrays = [
        np.unique(rng.integers(0, 2**63, size=500, dtype=np.uint64))
        for _ in range(5)
    ]
    index = build_index_from_hash_sets(
        [f"s{i}" for i in range(5)], arrays, ksize=21, params="kSize:21"
    )
    prefix = str(tmp_path / "x")
    npz_index.save(prefix, index)
    back = npz_index.load(prefix)
    assert back.names == index.names
    assert back.ksize == 21
    assert np.array_equal(back.color_offsets, index.color_offsets)
    assert np.array_equal(back.color_members, index.color_members)
    assert np.array_equal(back.color_counts, index.color_counts)
    assert np.array_equal(back.group_kmer_count, index.group_kmer_count)
    assert npz_index.load(str(tmp_path / "missing")) is None


def test_hash_range_partition_reconstructs_matrix(rng):
    """Per-range partial matrices must sum to the global matrix — the
    multi-host ingestion invariant."""
    n = 12
    arrays = [
        np.unique(rng.integers(0, 2**64, size=2000, dtype=np.uint64))
        for _ in range(n)
    ]
    names = [f"s{i}" for i in range(n)]
    full = build_index_from_hash_sets(names, arrays)
    s_full = pw.shared_kmer_matrix_numpy(
        full.color_offsets, full.color_members, full.color_counts, n
    )

    partials = []
    hosts = 4
    for pid in range(hosts):
        lo, hi = distributed.my_hash_range(pid, hosts)
        sub = [distributed.filter_to_range(a, lo, hi) for a in arrays]
        idx = build_index_from_hash_sets(names, sub)
        partials.append(
            pw.shared_kmer_matrix_numpy(
                idx.color_offsets, idx.color_members, idx.color_counts, n
            )
        )
    merged = distributed.merge_partial_matrices(partials)
    assert np.array_equal(merged, s_full)


def test_hash_range_covers_space():
    hosts = 5
    ranges = [distributed.my_hash_range(i, hosts) for i in range(hosts)]
    assert ranges[0][0] == 0
    assert ranges[-1][1] == 1 << 64
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c
