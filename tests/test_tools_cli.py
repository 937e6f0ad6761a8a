"""The tools subcommands, driven through click's test runner."""

import numpy as np
import pytest
from click.testing import CliRunner

from kspider_tpu.cli.main import cli
from kspider_tpu.io import phmap as phmap_io
from kspider_tpu.io import sigs as sigs_io


@pytest.fixture
def runner():
    return CliRunner()


def test_sig_to_bin_abundance_filter(tmp_path, runner, rng):
    mins = np.sort(rng.integers(0, 2**63, size=100, dtype=np.uint64))
    abund = np.where(np.arange(100) < 40, 1, 5)
    sig = tmp_path / "x.sig"
    sigs_io.write_sig(str(sig), "x", mins.tolist(), 21, abundances=abund.tolist())
    out = tmp_path / "x.bin"
    r = runner.invoke(cli, ["tools", "sig_to_bin", str(sig), "21", "2", str(out)])
    assert r.exit_code == 0, r.output
    back = phmap_io.read_hash_set(out)
    assert np.array_equal(back, np.sort(mins[abund >= 2]))


def test_validate_bins_sweep(tmp_path, runner, rng):
    good = rng.integers(0, 2**63, size=50, dtype=np.uint64)
    phmap_io.write_hash_set(tmp_path / "a.bin", np.unique(good))
    (tmp_path / "bad.bin").write_bytes(b"\x05\x00")
    report = tmp_path / "report.txt"
    r = runner.invoke(
        cli, ["tools", "validate_bins", str(tmp_path), "-o", str(report)]
    )
    assert r.exit_code == 1  # one invalid bin
    text = report.read_text()
    assert "a.bin\tVALID_BIN" in text
    assert "bad.bin\tINVALID_BIN" in text


def test_normalize(tmp_path, runner, rng):
    seq = "".join(rng.choice(list("ACGT"), size=600))
    uniq = "".join(rng.choice(list("ACGT"), size=100))
    fq = tmp_path / "r.fq"
    fq.write_text(
        f"@a\n{seq}\n+\n{'I' * len(seq)}\n"
        f"@b\n{seq}\n+\n{'I' * len(seq)}\n"
        f"@c\n{uniq}\n+\n{'I' * len(uniq)}\n"
    )
    out = tmp_path / "n.bin"
    r = runner.invoke(
        cli,
        ["tools", "normalize", "--r1", str(fq), "-k", "21", "-o", str(out),
         "--percentile", "20"],
    )
    assert r.exit_code == 0, r.output
    kept = phmap_io.read_hash_set(out)
    assert len(kept) > 0
    from kspider_tpu.core import hashing

    uniq_hashes = hashing.kmer_hashes_sourmash(uniq, 21)
    # the singly-occurring kmers fall in the lowest percentile bucket
    assert len(np.intersect1d(kept, uniq_hashes)) == 0


def test_dump_kmer_count(tmp_path, runner):
    fa = tmp_path / "g.fa"
    fa.write_text(">a\nACGTACGTACGTACGTACGTACGT\n")
    r = runner.invoke(cli, ["tools", "dump_kmer_count", str(fa), "21"])
    assert r.exit_code == 0, r.output
    lines = [ln for ln in r.output.splitlines() if ln]
    assert all("\t" in ln for ln in lines)


def test_repr_sketches(tmp_path, runner):
    tsv = tmp_path / "pw.tsv"
    tsv.write_text(
        "h\n1\t2\t10\t0.1\t0.5\t0.9\n1\t3\t10\t0.1\t0.1\t0.1\n2\t3\t10\t0.2\t0.4\t0.6\n"
    )
    r = runner.invoke(cli, ["tools", "repr_sketches", str(tsv)])
    assert r.exit_code == 0
    # edges with avg containment > 0.2: (1,2) and (2,3) -> degrees 2:2, 1:1, 3:1
    assert r.output.splitlines()[0] == "2: 2"


def test_jaxcache_enable_idempotent_and_off(monkeypatch, tmp_path):
    """enable_persistent_cache: sets the dir once, never overrides an
    explicit config, and KSPIDER_JAX_CACHE=off disables."""
    from kspider_tpu.utils import jaxcache

    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setattr(jaxcache, "_done", False)
        monkeypatch.setenv("KSPIDER_JAX_CACHE", str(tmp_path / "cc"))
        jax.config.update("jax_compilation_cache_dir", None)
        jaxcache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()
        # second call is a no-op even with a different env
        monkeypatch.setenv("KSPIDER_JAX_CACHE", str(tmp_path / "other"))
        jaxcache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")

        # explicit config wins over the env default
        monkeypatch.setattr(jaxcache, "_done", False)
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "mine"))
        jaxcache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "mine")

        # off disables
        monkeypatch.setattr(jaxcache, "_done", False)
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("KSPIDER_JAX_CACHE", "off")
        jaxcache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
