"""Color-class build vs brute-force set arithmetic."""

import numpy as np

from kspider_tpu.core.index import build_index_from_hash_sets


def brute_force_classes(hash_sets):
    """{frozenset(members): count} from plain python sets."""
    from collections import defaultdict

    kmer_to_members = defaultdict(set)
    for g, s in enumerate(hash_sets):
        if s is None:
            continue
        for h in s:
            kmer_to_members[h].add(g)
    classes = defaultdict(int)
    for members in kmer_to_members.values():
        classes[frozenset(members)] += 1
    return dict(classes)


def index_classes(index):
    out = {}
    for c in range(index.num_colors):
        ms = index.color_members[index.color_offsets[c] : index.color_offsets[c + 1]]
        out[frozenset(int(m) for m in ms)] = int(index.color_counts[c])
    return out


def test_classes_match_bruteforce(rng):
    universe = rng.choice(10_000, size=3000, replace=False).astype(np.uint64)
    sets = []
    for _ in range(12):
        take = rng.random(len(universe)) < 0.3
        sets.append(set(int(h) for h in universe[take]))
    arrays = [np.array(sorted(s), dtype=np.uint64) for s in sets]
    index = build_index_from_hash_sets([f"s{i}" for i in range(12)], arrays)
    assert index_classes(index) == brute_force_classes(sets)
    assert np.array_equal(
        index.group_kmer_count, np.array([len(s) for s in sets], dtype=np.int64)
    )


def test_singleton_color_ids_are_group_ids(rng):
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([3, 4, 5], dtype=np.uint64)
    index = build_index_from_hash_sets(["a", "b"], [a, b])
    # classes: {a}={0}x2, {b}={1}x2, {a,b}={0,1}x1
    by_id = dict(zip(index.color_ids.tolist(), index.color_counts.tolist()))
    assert by_id[1] == 2  # groupID 1 private kmers
    assert by_id[2] == 2
    assert by_id[3] == 1  # first multi-member id = N+1
    assert index.num_kmers == 5


def test_never_ingested_group(rng):
    a = np.array([1, 2, 3], dtype=np.uint64)
    index = build_index_from_hash_sets(["a", "ghost"], [a, None])
    assert index.group_kmer_count[1] == -1
    assert index.num_groups == 2
    assert index.num_colors == 1


def test_duplicate_hashes_within_sample_counted_once():
    a = np.array([7, 7, 8], dtype=np.uint64)
    b = np.array([7], dtype=np.uint64)
    index = build_index_from_hash_sets(["a", "b"], [a, b])
    cls = {}
    for c in range(index.num_colors):
        ms = index.color_members[index.color_offsets[c] : index.color_offsets[c + 1]]
        cls[frozenset(ms.tolist())] = int(index.color_counts[c])
    assert cls[frozenset({0, 1})] == 1  # hash 7 once
    assert cls[frozenset({0})] == 1  # hash 8
    # but reported kmer count is the raw array length (reference semantics)
    assert index.group_kmer_count[0] == 3


def test_build_index_consume_matches_and_frees(rng):
    """consume=True: identical index, sources released as copied."""
    from kspider_tpu.core.index import build_index_from_hash_sets

    names = [f"s{i}" for i in range(20)]
    arrays = [
        np.unique(rng.integers(0, 2**62, size=int(rng.integers(5, 40)),
                               dtype=np.uint64))
        for _ in range(20)
    ]
    arrays[3] = None  # registered-but-not-ingested stays supported
    keep = [None if a is None else a.copy() for a in arrays]
    idx_ref = build_index_from_hash_sets(names, keep, ksize=21)
    idx_con = build_index_from_hash_sets(names, arrays, ksize=21,
                                         consume=True)
    assert all(a is None for a in arrays)
    np.testing.assert_array_equal(idx_ref.color_offsets,
                                  idx_con.color_offsets)
    np.testing.assert_array_equal(idx_ref.color_members,
                                  idx_con.color_members)
    np.testing.assert_array_equal(idx_ref.color_counts,
                                  idx_con.color_counts)
    np.testing.assert_array_equal(idx_ref.group_kmer_count,
                                  idx_con.group_kmer_count)
