"""On-TPU validation sweep for the Mosaic-compiled Pallas kernels.

All unit tests force CPU interpret mode (tests/conftest.py), so a Mosaic
layout/lowering regression at a shape the bench doesn't hit would ship
silently.  This sweep compiles and runs the sym / tri / plain-square /
rect kernels on the REAL backend across several (n_pad, block, limbs,
tile) shape families and compares every result exactly against the numpy
reference model.  Run it on the chip each round (wired into
.claude/skills/verify/SKILL.md):

    timeout 1200 python benchmarks/validate_tpu.py          # TPU
    python benchmarks/validate_tpu.py --cpu                 # interpret-mode smoke

Exit code 0 = every configuration exact.  Each case prints its wall time
so gross kernel-performance regressions are visible too (first run per
shape includes compilation; the persistent cache makes reruns fast).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_csr(rng, n: int, n_colors: int, max_degree: int, max_weight: int):
    """Random color CSR with heavy-tailed degrees and the given weight
    magnitude (weight magnitude controls the limb count)."""
    degrees = np.minimum(
        2 + rng.geometric(0.3, size=n_colors), min(max_degree, n)
    )
    offsets = np.zeros(n_colors + 1, dtype=np.int64)
    np.cumsum(degrees, out=offsets[1:])
    members = np.concatenate(
        [rng.choice(n, size=d, replace=False) for d in degrees]
    ).astype(np.int32)
    weights = rng.integers(1, max_weight, size=n_colors).astype(np.int64)
    return offsets, members, weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode smoke run (no TPU needed)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from kspider_tpu.ops import pairwise as pw
    from kspider_tpu.ops import pallas_pairwise as pp

    interpret = jax.default_backend() == "cpu"
    print(f"backend: {jax.default_backend()} "
          f"({'interpret' if interpret else 'Mosaic-compiled'})", flush=True)

    rng = np.random.default_rng(42)
    failures = []

    # ---- high-level dispatch sweep: sym / tri / plain square --------------
    # (n, block, max_weight, tile): tile=None lets the sym/auto dispatch
    # pick; explicit tile forces the tri (nt>1) or plain (nt==1) kernel.
    cases = [
        ("sym-1limb", 500, 512, 100, None),
        ("sym-2limb", 1000, 1024, 10_000, None),
        ("sym-3limb", 700, 256, 3_000_000, None),
        ("tri-2limb", 1500, 1024, 10_000, 512),
        ("tri-3limb", 1100, 512, 3_000_000, 256),
        ("tri-tile128", 640, 256, 10_000, 128),
        ("square-1tile", 400, 512, 10_000, 512),
    ]
    for name, n, block, max_weight, tile in cases:
        offsets, members, weights = make_csr(rng, n, 6 * block, 40, max_weight)
        ref = pw.shared_kmer_matrix_numpy(offsets, members, weights, n)
        t0 = time.perf_counter()
        got = pp.shared_kmer_matrix_pallas(
            offsets, members, weights, n, block=block, tile=tile,
            interpret=interpret,
        )
        wall = time.perf_counter() - t0
        ok = np.array_equal(got, ref)
        print(f"{name:14s} n={n:5d} block={block:5d} tile={tile or 'auto':>5} "
              f"{wall:7.2f}s  {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(name)

    # ---- rect kernel (panel-streamed engine's off-diagonal tiles) ---------
    for name, ni, nj, block, max_weight, tile in [
        ("rect-2limb", 512, 768, 512, 10_000, 256),
        ("rect-3limb", 384, 512, 1024, 3_000_000, 128),
    ]:
        n = ni + nj
        offsets, members, weights = make_csr(rng, n, 4 * block, 30, max_weight)
        ref_full = pw.shared_kmer_matrix_numpy(offsets, members, weights, n)
        ref = ref_full[:ni, ni:]

        w_limbs = pw.weight_limbs(weights)
        n_limbs = w_limbs.shape[1]
        degrees = np.diff(offsets)
        cidx = np.repeat(np.arange(len(degrees)), degrees)

        def side(lo, hi):
            mask = (members >= lo) & (members < hi)
            cnt = np.bincount(cidx[mask], minlength=len(degrees))
            off = np.zeros(len(degrees) + 1, dtype=np.int64)
            np.cumsum(cnt, out=off[1:])
            return off, (members[mask] - lo).astype(np.int32)

        off_i, mem_i = side(0, ni)
        off_j, mem_j = side(ni, n)
        npad_i = -(-ni // tile) * tile
        npad_j = -(-nj // tile) * tile
        bits_i_t, wl_t = pp.pack_inputs(off_i, mem_i, w_limbs, npad_i, block)
        bits_j_t, _ = pp.pack_inputs(off_j, mem_j, w_limbs, npad_j, block)
        t0 = time.perf_counter()
        acc = np.asarray(
            pp.cooccurrence_pallas_rect(
                bits_i_t, bits_j_t, wl_t, block, npad_i, npad_j, n_limbs,
                tile=tile, interpret=interpret,
            )
        ).astype(np.int64)
        wall = time.perf_counter() - t0
        got = np.zeros((npad_i, npad_j), dtype=np.int64)
        scale = 1
        for l in range(n_limbs):
            got += acc[l] * scale
            scale *= 128
        ok = np.array_equal(got[:ni, :nj], ref)
        print(f"{name:14s} panels={ni}x{nj} block={block:5d} tile={tile:5d} "
              f"{wall:7.2f}s  {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(name)

    # ---- device-side packing (streamed engine's posting-key H2D path) ----
    import os as _os

    from kspider_tpu.ops import tiled_pairwise as tp

    for name, n, panel, block, tile, max_weight in [
        ("devpack-2limb", 1400, 512, 256, 256, 10_000),
        ("devpack-3limb", 900, 256, 128, 128, 3_000_000),
    ]:
        offsets, members, weights = make_csr(rng, n, 5 * block, 30,
                                             max_weight)
        ref = pw.shared_kmer_matrix_numpy(offsets, members, weights, n)
        plan = tp.build_panel_plan(offsets, members, weights, n, panel=panel)
        _os.environ["KSPIDER_DEVICE_PACK"] = "force"
        try:
            stats = {}
            t0 = time.perf_counter()
            got = np.zeros((n, n), dtype=np.int64)
            for _, _, gi, gj, vals in tp.iter_panel_pairs(
                plan, engine="xla" if interpret else "pallas", block=block,
                tile=tile, interpret=interpret, stats=stats,
            ):
                got[gi, gj] += vals
                got[gj, gi] += vals
            wall = time.perf_counter() - t0
        finally:
            del _os.environ["KSPIDER_DEVICE_PACK"]
        ok = np.array_equal(got, ref) and stats["keys_sides"] > 0
        print(f"{name:14s} n={n:5d} block={block:5d} tile={tile:5d} "
              f"{wall:7.2f}s  {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(name)

    # dense full-matrix path with device-packed chunks
    offsets, members, weights = make_csr(rng, 900, 5 * 256, 30, 10_000)
    for c in range(5 * 256):
        members[offsets[c]: offsets[c + 1]] = np.sort(
            members[offsets[c]: offsets[c + 1]]
        )
    ref = pw.shared_kmer_matrix_numpy(offsets, members, weights, 900)
    _os.environ["KSPIDER_DEVICE_PACK"] = "force"
    try:
        t0 = time.perf_counter()
        got = pp.shared_kmer_matrix_pallas(
            offsets, members, weights, 900, block=256, interpret=interpret
        )
        wall = time.perf_counter() - t0
    finally:
        del _os.environ["KSPIDER_DEVICE_PACK"]
    ok = np.array_equal(got, ref)
    print(f"{'devpack-dense':14s} n=  900 block=  256            "
          f"{wall:7.2f}s  {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        failures.append("devpack-dense")

    # ---- XLA bitmask + scatter engines on the real backend ----------------
    for name, engine, n, block in [
        ("xla-bitmask", "bitmask", 900, 512),
        ("xla-scatter", "scatter", 900, 512),
    ]:
        offsets, members, weights = make_csr(rng, n, 4 * block, 30, 10_000)
        ref = pw.shared_kmer_matrix_numpy(offsets, members, weights, n)
        t0 = time.perf_counter()
        got = pw.shared_kmer_matrix(
            offsets, members, weights, n, block=block, engine=engine
        )
        wall = time.perf_counter() - t0
        ok = np.array_equal(got, ref)
        print(f"{name:14s} n={n:5d} block={block:5d}            "
              f"{wall:7.2f}s  {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(name)

    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL KERNEL CONFIGURATIONS EXACT")


if __name__ == "__main__":
    main()
