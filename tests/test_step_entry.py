"""Fused pipeline step + driver entry points."""

import sys

import jax
import numpy as np

from kspider_tpu.ops import cc as cc_ops
from kspider_tpu.parallel import mesh as mesh_lib
from kspider_tpu.parallel import step as step_lib


def test_dense_cc_matches_edge_cc(rng):
    n = 100
    adj = np.zeros((n, n), dtype=bool)
    src = rng.integers(0, n, size=150)
    dst = rng.integers(0, n, size=150)
    adj[src, dst] = True
    adj |= adj.T
    labels_dense = np.asarray(cc_ops.connected_components_dense(jax.numpy.asarray(adj)))
    labels_edge = cc_ops.connected_components_scipy(src, dst, n)
    assert np.array_equal(labels_dense, labels_edge)


def test_single_device_step_consistency():
    bits, wl, counts, block, n_pad, n_limbs = step_lib.make_example_blocks(
        n_samples=64, n_colors=256, block=32, seed=3
    )
    shared, labels = jax.jit(
        lambda b, w, k, cut: step_lib.single_device_step(
            b, w, k, cut, block=block, n_pad=n_pad, n_limbs=n_limbs
        )
    )(bits, wl, counts, 0.01)
    shared = np.asarray(shared)
    labels = np.asarray(labels)
    assert shared.shape == (64, 64)
    assert np.array_equal(shared, shared.T)
    assert (np.diag(shared) == 0).all()
    # labels consistent with thresholded adjacency
    cont = shared / np.maximum(
        np.minimum(counts[:, None], counts[None, :]).astype(np.float32), 1.0
    )
    adj = (cont >= 0.01) & (shared > 0)
    expect = cc_ops.connected_components_scipy(*np.nonzero(adj), 64)
    assert np.array_equal(labels, expect)


def test_sharded_step_matches_single():
    mesh = mesh_lib.make_mesh(8)
    bits, wl, counts, block, n_pad, n_limbs = step_lib.make_example_blocks(
        n_samples=64, n_colors=512, block=8, seed=5
    )
    s1, l1 = step_lib.single_device_step(
        bits, wl, counts, 0.02, block=block, n_pad=n_pad, n_limbs=n_limbs
    )
    s2, l2 = step_lib.sharded_step(
        mesh, bits, wl, counts, 0.02, block, n_pad, n_limbs
    )
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))


def test_graft_entry(tmp_path):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (256, 256)
    ge.dryrun_multichip(8)
