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
