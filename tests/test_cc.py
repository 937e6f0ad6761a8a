"""Device connected components vs scipy."""

import numpy as np

from kspider_tpu.ops import cc


def test_simple_components():
    src = np.array([0, 1, 3], dtype=np.int32)
    dst = np.array([1, 2, 4], dtype=np.int32)
    labels = cc.connected_components(src, dst, 6)
    assert labels.tolist() == [0, 0, 0, 3, 3, 5]


def test_matches_scipy_random(rng):
    n = 500
    e = 800
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    dev = cc.connected_components(src, dst, n)
    host = cc.connected_components_scipy(src, dst, n)
    assert np.array_equal(dev, host)


def test_chain_graph_log_convergence():
    # worst case for naive propagation: a long path
    n = 4097
    src = np.arange(n - 1, dtype=np.int32)
    dst = src + 1
    labels = cc.connected_components(src, dst, n)
    assert np.all(labels == 0)


def test_no_edges():
    labels = cc.connected_components(
        np.empty(0, np.int32), np.empty(0, np.int32), 4
    )
    assert labels.tolist() == [0, 1, 2, 3]


def test_labels_to_clusters():
    labels = np.array([0, 0, 2, 2, 0, 5], dtype=np.int32)
    comps = cc.labels_to_clusters(labels)
    assert [c.tolist() for c in comps] == [[0, 1, 4], [2, 3], [5]]


def test_streamed_cluster_chunks_match_single_pass(tmp_path, rng):
    """cluster_index folds 10M-row TSV chunks into running labels; tiny
    chunk_rows must produce the identical clustering to one big chunk."""
    from kspider_tpu.core import cluster as cluster_core

    n = 40
    prefix = str(tmp_path / "idx")
    with open(prefix + ".namesMap", "w") as f:
        f.write(f"{n}\n")
        for i in range(1, n + 1):
            f.write(f"{i} s{i}\n")
    # random graph: ~150 edges above cutoff scattered among below-cutoff rows
    rows = []
    for _ in range(400):
        a, b = sorted(rng.choice(n, size=2, replace=False) + 1)
        d = float(rng.random())
        rows.append(f"{a}\t{b}\t10\t{d:.4f}\t{d:.4f}\t{d:.4f}")
    with open(prefix + "_kSpider_pairwise.tsv", "w") as f:
        f.write("h1\th2\th3\th4\th5\th6\n")
        f.write("\n".join(rows) + "\n")

    out_small = cluster_core.cluster_index(
        prefix, 0.5, use_tpu=False, chunk_rows=7
    )
    small = open(out_small).read()
    out_big = cluster_core.cluster_index(
        prefix, 0.5, use_tpu=False, chunk_rows=10**7
    )
    assert open(out_big).read() == small
    # and the device pointer-jumping path agrees with scipy
    out_dev = cluster_core.cluster_index(prefix, 0.5, use_tpu=True, chunk_rows=13)
    assert open(out_dev).read() == small
