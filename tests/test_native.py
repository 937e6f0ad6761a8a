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

    # python fallback path: disable native outright (KSPIDER_NATIVE=off
    # short-circuits before report_fallback, so no RuntimeWarning noise)
    import os

    os.environ["KSPIDER_NATIVE"] = "off"
    try:
        core_pairwise.write_pairwise_tsv(str(tmp_path / "py"), idx, shared)
    finally:
        del os.environ["KSPIDER_NATIVE"]

    nat = (tmp_path / "nat.tsv").read_text()
    py = (tmp_path / "py_kSpider_pairwise.tsv").read_text()
    assert nat == py


def test_color_to_sources_cross_impl(tmp_path, rng):
    """python-written files read by native and vice versa."""
    from kspider_tpu.io import phmap as phmap_io

    colors = np.array([1, 2, 300], dtype=np.uint64)
    offsets = np.array([0, 2, 3, 7], dtype=np.int64)
    members = np.array([1, 5, 2, 1, 2, 3, 9], dtype=np.int64)

    # force the pure-python writer
    p_py = tmp_path / "py.bin"
    w = phmap_io.PhmapWriter(str(p_py))
    w.save_u64(len(colors))
    for i, c in enumerate(colors):
        w.save_u64(int(c))
        w.save_flat_table(
            np.ascontiguousarray(members[offsets[i]:offsets[i+1]], dtype="<u4")
        )
    w.close()
    c1, o1, m1 = native.read_color_to_sources(str(p_py))
    assert np.array_equal(c1, colors)
    assert np.array_equal(o1, offsets)
    assert np.array_equal(np.sort(m1[:2]), np.sort(members[:2]))

    # native writer read by pure-python reader
    p_nat = tmp_path / "nat.bin"
    native.write_color_to_sources(str(p_nat), colors, offsets, members)
    r = phmap_io.PhmapReader(str(p_nat))
    count = r.load_u64()
    assert count == 3
    assert r.load_u64() == 1
    first_set = r.load_flat_table(np.dtype("<u4"))
    assert set(first_set.tolist()) == {1, 5}
    r.close()


def test_fallback_warns_once_when_native_call_fails(tmp_path, monkeypatch):
    """A broken native library must degrade VISIBLY: one RuntimeWarning
    per entry point, correct pure-Python output."""
    import warnings

    native._warned_fallbacks.clear()
    monkeypatch.setattr(
        native, "sketch_file",
        lambda *a, **k: (_ for _ in ()).throw(OSError("boom")),
    )
    from kspider_tpu.core import sketch as sketch_core

    fa = tmp_path / "x.fa"
    fa.write_text(">r1\n" + "ACGT" * 30 + "\n")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = sketch_core.sketch_single_end(str(fa), 21)
        res2 = sketch_core.sketch_single_end(str(fa), 21)
    msgs = [w for w in rec if issubclass(w.category, RuntimeWarning)
            and "sketch_file" in str(w.message)]
    assert len(msgs) == 1  # warn-once
    assert len(res.hashes) > 0 and np.array_equal(res.hashes, res2.hashes)


def test_force_mode_raises_on_native_failure(tmp_path, monkeypatch):
    monkeypatch.setenv("KSPIDER_NATIVE", "force")
    monkeypatch.setattr(
        native, "sketch_file",
        lambda *a, **k: (_ for _ in ()).throw(OSError("boom")),
    )
    from kspider_tpu.core import sketch as sketch_core

    fa = tmp_path / "x.fa"
    fa.write_text(">r1\n" + "ACGT" * 30 + "\n")
    with pytest.raises(native.NativeRequiredError):
        sketch_core.sketch_single_end(str(fa), 21)


def test_off_mode_disables_native(monkeypatch):
    monkeypatch.setenv("KSPIDER_NATIVE", "off")
    assert not native.enabled()
    assert not native.available()
    monkeypatch.setenv("KSPIDER_NATIVE", "auto")
    assert native.enabled()


def test_fill_postings_matches_python_loop(rng):
    from kspider_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    n_samples = 50
    arrays = [
        np.unique(rng.integers(0, 2**62, size=int(rng.integers(0, 30)),
                               dtype=np.uint64))
        for _ in range(n_samples)
    ]
    arrays[7] = None
    total = sum(len(a) for a in arrays if a is not None)
    # python reference
    h_ref = np.empty(total, np.uint64)
    g_ref = np.empty(total, np.int32)
    pos = 0
    entries = []
    for g, a in enumerate(arrays):
        if a is None or len(a) == 0:
            continue
        m = len(a)
        h_ref[pos:pos + m] = a
        g_ref[pos:pos + m] = g
        entries.append((g, a, pos))
        pos += m
    h_got = np.empty(total, np.uint64)
    g_got = np.empty(total, np.int32)
    native.fill_postings(entries, h_got, g_got)
    assert np.array_equal(h_got, h_ref)
    assert np.array_equal(g_got, g_ref)
    # empty entry list is a no-op
    native.fill_postings([], h_got[:0], g_got[:0])
