"""phmap-dump binary format roundtrips (reference contract §2.19)."""

import io

import numpy as np

from kspider_tpu.io import phmap


def test_hash_set_roundtrip(tmp_path, rng):
    hashes = np.unique(rng.integers(0, 2**64, size=5100, dtype=np.uint64))[:5000]
    p = tmp_path / "sample.bin"
    phmap.write_hash_set(p, hashes)
    back = phmap.read_hash_set(p)
    assert np.array_equal(back, np.sort(hashes))


def test_empty_hash_set_roundtrip(tmp_path):
    p = tmp_path / "empty.bin"
    phmap.write_hash_set(p, np.empty(0, dtype=np.uint64))
    back = phmap.read_hash_set(p)
    assert back.size == 0


def test_u32_map_roundtrip(tmp_path):
    keys = np.arange(1, 101, dtype=np.uint32)
    vals = (keys * 7 + 3).astype(np.uint32)
    p = tmp_path / "m.bin"
    phmap.write_u32_u32_map(p, keys, vals)
    k, v = phmap.read_u32_u32_map(p)
    assert np.array_equal(k, keys.astype(np.int64))
    assert np.array_equal(v, vals.astype(np.int64))


def test_u64_map_roundtrip(tmp_path, rng):
    keys = np.unique(rng.integers(0, 2**64, size=400, dtype=np.uint64))[:333]
    vals = rng.integers(0, 2**40, size=333).astype(np.uint64)
    p = tmp_path / "m64.bin"
    phmap.write_u64_u64_map(p, keys, vals)
    k, v = phmap.read_u64_u64_map(p)
    order = np.argsort(keys)
    assert np.array_equal(k, keys[order])
    assert np.array_equal(v, vals[order])


def test_versioned_dump_detection(tmp_path):
    """Reader must accept phmap >= 1.3.x dumps that lead with a version word."""
    hashes = np.array([5, 9, 42], dtype=np.uint64)
    buf = io.BytesIO()
    w = phmap.PhmapWriter(buf)
    w.save_flat_table(hashes)
    raw = buf.getvalue()
    versioned = np.uint64((1 << 64) - 11).tobytes() + raw
    r = phmap.PhmapReader(io.BytesIO(versioned))
    out = r.load_flat_table(np.dtype("<u8"))
    assert set(out.tolist()) == {5, 9, 42}


def test_color_to_sources_roundtrip(tmp_path):
    colors = np.array([1, 2, 26, 27], dtype=np.uint64)
    offsets = np.array([0, 1, 2, 4, 7], dtype=np.int64)
    members = np.array([1, 2, 1, 2, 1, 2, 3], dtype=np.int64)
    p = tmp_path / "c2s.bin"
    phmap.write_color_to_sources(p, colors, offsets, members)
    c, o, m = phmap.read_color_to_sources(p)
    assert np.array_equal(c, colors)
    assert np.array_equal(o, offsets)
    assert np.array_equal(m, members)


def test_capacity_policy_matches_phmap_growth():
    # phmap: capacity 2^k - 1, max load 7/8 => growth(cap) = cap - cap/8
    assert phmap._normalize_capacity(0) == 1
    assert phmap._normalize_capacity(1) == 1
    assert phmap._normalize_capacity(14) == 15  # growth(15) = 15-1 = 14
    assert phmap._normalize_capacity(15) == 31
    assert phmap._normalize_capacity(28) == 31  # growth(31) = 31-3 = 28
    assert phmap._normalize_capacity(29) == 63
