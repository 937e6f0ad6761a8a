"""Bitmask and Pallas pairwise engines vs the numpy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from kspider_tpu.ops import bitmask as bm
from kspider_tpu.ops import pairwise as pw
from kspider_tpu.ops.pallas_pairwise import shared_kmer_matrix_pallas
from tests.test_pairwise_ops import random_csr


def test_pack_bitmask_matches_packbits(rng):
    offsets = np.array([0, 3, 5], dtype=np.int64)
    members = np.array([0, 9, 130, 4, 255], dtype=np.int64)
    bits = bm.pack_bitmask_blocks(offsets, members, 256, block=2)
    dense = np.zeros((2, 256), dtype=np.uint8)
    dense[0, [0, 9, 130]] = 1
    dense[1, [4, 255]] = 1
    expect = np.packbits(dense, axis=1)
    assert np.array_equal(bits[0], expect)


def test_bitmask_engine_matches_numpy(rng):
    o, m, w = random_csr(rng, 900, 200, max_degree=12, max_weight=70000)
    s1 = bm.shared_kmer_matrix_bitmask(o, m, w, 200, block=256)
    s2 = pw.shared_kmer_matrix_numpy(o, m, w, 200)
    assert np.array_equal(s1, s2)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
def test_pallas_engine_matches_numpy(rng, dtype):
    o, m, w = random_csr(rng, 600, 150, max_degree=10, max_weight=40000)
    s1 = shared_kmer_matrix_pallas(
        o, m, w, 150, block=128, tile=128, compute_dtype=dtype
    )
    s2 = pw.shared_kmer_matrix_numpy(o, m, w, 150)
    assert np.array_equal(s1, s2)


def test_pallas_multi_tile(rng):
    # n spans multiple 128-wide tiles to exercise the (i, j) grid
    o, m, w = random_csr(rng, 500, 300, max_degree=8, max_weight=300)
    s1 = shared_kmer_matrix_pallas(o, m, w, 300, block=128, tile=128)
    s2 = pw.shared_kmer_matrix_numpy(o, m, w, 300)
    assert np.array_equal(s1, s2)


def test_pallas_sym_engine_matches_numpy(rng):
    # tile=None routes to the symmetric row-strip kernel (multi-strip n,
    # 3 weight limbs)
    o, m, w = random_csr(rng, 700, 200, max_degree=10, max_weight=40000)
    s1 = shared_kmer_matrix_pallas(o, m, w, 200, block=128)
    s2 = pw.shared_kmer_matrix_numpy(o, m, w, 200)
    assert np.array_equal(s1, s2)


def test_pallas_sym_single_strip(rng):
    # n below one 128-strip: the kernel degenerates to one full square
    o, m, w = random_csr(rng, 250, 50, max_degree=6, max_weight=500)
    s1 = shared_kmer_matrix_pallas(o, m, w, 50, block=128)
    s2 = pw.shared_kmer_matrix_numpy(o, m, w, 50)
    assert np.array_equal(s1, s2)


def test_pallas_sym_wide_strip(rng):
    # n_pad=512 selects the 512-row strip (the TPU-measured optimum);
    # one strip == the whole panel, diagonal-complete
    o, m, w = random_csr(rng, 400, 512, max_degree=8, max_weight=40000)
    s1 = shared_kmer_matrix_pallas(o, m, w, 512, block=128)
    s2 = pw.shared_kmer_matrix_numpy(o, m, w, 512)
    assert np.array_equal(s1, s2)


def test_best_strip():
    from kspider_tpu.ops.pallas_pairwise import best_strip

    assert best_strip(1024) == 512
    assert best_strip(512) == 512
    assert best_strip(768) == 256
    assert best_strip(640) == 128
    assert best_strip(128) == 128


def test_engine_dispatcher(rng):
    o, m, w = random_csr(rng, 300, 60, max_degree=6, max_weight=1000)
    s_ref = pw.shared_kmer_matrix_numpy(o, m, w, 60)
    for engine in ("auto", "bitmask", "scatter", "pallas"):
        s = pw.shared_kmer_matrix(o, m, w, 60, engine=engine)
        assert np.array_equal(s, s_ref), engine
    with pytest.raises(ValueError):
        pw.shared_kmer_matrix(o, m, w, 60, engine="nope")
