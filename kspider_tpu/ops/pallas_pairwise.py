"""Pallas TPU kernel for the pairwise co-occurrence Gram matrix.

The XLA path (ops/bitmask.py) round-trips the int32 accumulators and every
unpacked/scaled intermediate through HBM on each scan step.  This kernel
fuses the whole per-block pipeline in VMEM:

  grid = (n_i, n_j, num_blocks)   # output tile (i, j); color block b last
  per step:
    bits_i u8[tile/8, block], bits_j u8[tile/8, block]   <- only HBM reads
    aT_i = unpack(bits_i) [tile, block];  aT_j likewise   (VPU shifts)
    for each weight limb l: acc_l += aT_i @ (w_l * aT_j)^T   (MXU)

Layout: bitmasks are stored **transposed** — [num_blocks, n_pad/8, block]
with colors on the 128-lane minor dimension — which satisfies the TPU
block-shape rules for the sliced byte dimension and yields the unpacked
tiles directly in the (samples, colors) orientation the matmul contracts
over.  Because the output index_map is constant in the trailing grid
dimension, the int32 accumulator tile stays resident in VMEM across the
entire color sweep and is written to HBM exactly once; HBM traffic is just
the packed bitmasks.

The N-tiling makes this kernel the building block for 100K-sample runs: S
is produced tile-by-tile without materializing an NxN presence matrix.

Replaces the scalar hot loop at /root/reference/src/pairwise.cpp:199-237.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_T(bits, tile: int, block: int):
    """u8[tile/8, block] -> i32[tile, block] 0/1, MSB-first rows.

    Row 8*i + k of the result is bit k (MSB first) of byte row i.  All bit
    arithmetic stays in int32 — Mosaic does not legalize 8-bit vector
    sub/shift/mul ops; callers cast to the matmul operand dtype last.
    """
    shifts = jnp.int32(7) - jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    expanded = (bits[:, None, :].astype(jnp.int32) >> shifts) & jnp.int32(1)
    return expanded.reshape(tile, block)


def _kernel(bits_i_ref, bits_j_ref, wl_ref, out_ref, *, tile, block, n_limbs,
            compute_dtype):
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc_dtype = (
        jnp.float32 if compute_dtype == jnp.bfloat16 else jnp.int32
    )
    a_i32 = _unpack_T(bits_i_ref[0], tile, block)
    a_j32 = _unpack_T(bits_j_ref[0], tile, block)
    a_i = a_i32.astype(compute_dtype)
    for l in range(n_limbs):  # static unroll; l indexes out_ref statically
        w = wl_ref[0, l, :].astype(jnp.int32)  # [block]
        wa_j = (a_j32 * w[None, :]).astype(compute_dtype)
        s = jax.lax.dot_general(
            a_i,
            wa_j,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        out_ref[l, :, :] = out_ref[l, :, :] + s.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("block", "n_pad", "n_limbs", "tile", "compute_dtype", "interpret"),
)
def cooccurrence_pallas(
    bits_t,
    w_limbs_t,
    block: int,
    n_pad: int,
    n_limbs: int,
    tile: int = 512,
    compute_dtype=jnp.int8,
    interpret: bool = False,
):
    """bits_t u8[NB, n_pad/8, block], w_limbs_t i8[NB, n_limbs, block]
    -> i32[n_limbs, n_pad, n_pad]."""
    num_blocks = bits_t.shape[0]
    nt = n_pad // tile
    t8 = tile // 8

    grid = (nt, nt, num_blocks)
    return pl.pallas_call(
        functools.partial(
            _kernel, tile=tile, block=block, n_limbs=n_limbs,
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, t8, block), lambda i, j, b: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t8, block), lambda i, j, b: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_limbs, block), lambda i, j, b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_limbs, tile, tile), lambda i, j, b: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_limbs, n_pad, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_limbs * num_blocks * block * n_pad * n_pad,
            bytes_accessed=num_blocks * block * (n_pad // 8) * max(1, nt)
            + n_limbs * n_pad * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits_t, bits_t, w_limbs_t)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block", "npad_i", "npad_j", "n_limbs", "tile", "compute_dtype", "interpret",
    ),
)
def cooccurrence_pallas_rect(
    bits_i_t,
    bits_j_t,
    w_limbs_t,
    block: int,
    npad_i: int,
    npad_j: int,
    n_limbs: int,
    tile: int = 512,
    compute_dtype=jnp.int8,
    interpret: bool = False,
):
    """Rectangular variant for panel-streamed large-N runs: the row samples
    (``bits_i_t`` u8[NB, npad_i/8, block]) and column samples (``bits_j_t``
    u8[NB, npad_j/8, block]) come from two different sample panels.
    Returns i32[n_limbs, npad_i, npad_j]."""
    num_blocks = bits_i_t.shape[0]
    nti = npad_i // tile
    ntj = npad_j // tile
    t8 = tile // 8

    grid = (nti, ntj, num_blocks)
    return pl.pallas_call(
        functools.partial(
            _kernel, tile=tile, block=block, n_limbs=n_limbs,
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, t8, block), lambda i, j, b: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t8, block), lambda i, j, b: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_limbs, block), lambda i, j, b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_limbs, tile, tile), lambda i, j, b: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_limbs, npad_i, npad_j), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_limbs * num_blocks * block * npad_i * npad_j,
            bytes_accessed=num_blocks
            * block
            * (npad_i // 8 + npad_j // 8)
            + n_limbs * npad_i * npad_j * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits_i_t, bits_j_t, w_limbs_t)


def _kernel_sym(bits_ref, wl_ref, out_ref, *, n_pad, block, n_limbs, strip,
                compute_dtype):
    """Symmetric row-strip kernel: the Gram matrix S = A^T W A is symmetric,
    so each 128-row strip i is contracted only against columns >= its own
    start — nt strips cover the upper triangle with (nt+1)/(2*nt) of the
    full-square MXU work while every dot keeps a wide N dimension (n_pad -
    r0), which measured ~1.3x faster than the full-square kernel on v5e.
    The packed block is unpacked ONCE per grid step and all strips slice
    the same VMEM-resident operands."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc_dtype = jnp.float32 if compute_dtype == jnp.bfloat16 else jnp.int32
    a32 = _unpack_T(bits_ref[0], n_pad, block)
    a = a32.astype(compute_dtype)
    was = [
        (a32 * wl_ref[0, l, :].astype(jnp.int32)[None, :]).astype(compute_dtype)
        for l in range(n_limbs)
    ]
    for r0 in range(0, n_pad, strip):
        ai = a[r0 : r0 + strip, :]
        for l in range(n_limbs):
            s = jax.lax.dot_general(
                ai,
                was[l][r0:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            out_ref[l, r0 : r0 + strip, r0:] += s.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("block", "n_pad", "n_limbs", "strip", "compute_dtype",
                     "interpret"),
)
def cooccurrence_pallas_sym(
    bits_t,
    w_limbs_t,
    block: int,
    n_pad: int,
    n_limbs: int,
    strip: int = 128,
    compute_dtype=jnp.int8,
    interpret: bool = False,
):
    """Upper-triangle co-occurrence for a single symmetric sample panel.

    bits_t u8[NB, n_pad/8, block], w_limbs_t i8[NB, n_limbs, block]
    -> i32[n_limbs, n_pad, n_pad] where only entries with column-strip >=
    row-strip are computed (diagonal strip blocks are complete squares);
    mirror with ``mirror_upper_tiles(s, strip)``.  Requires the whole
    accumulator plus unpacked operands to fit VMEM — see ``sym_fits``.
    """
    num_blocks = bits_t.shape[0]
    return pl.pallas_call(
        functools.partial(
            _kernel_sym, n_pad=n_pad, block=block, n_limbs=n_limbs,
            strip=strip, compute_dtype=compute_dtype,
        ),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad // 8, block), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_limbs, block), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_limbs, n_pad, n_pad), lambda b: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_limbs, n_pad, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n_limbs * num_blocks * block * n_pad * (n_pad + strip),
            bytes_accessed=num_blocks * block * (n_pad // 8)
            + n_limbs * n_pad * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits_t, w_limbs_t)


def best_strip(n_pad: int) -> int:
    """Row-strip height for ``cooccurrence_pallas_sym``.

    Measured on v5e (n_pad=1024, block=1024, 2 limbs): strip=512 runs the
    75%-of-square upper-triangle work at full-square MXU rate (2.49 ms vs
    3.40 ms full square), while strip=256/128 lose per-dot efficiency
    faster than they save MACs (2.67/3.35 ms).  Pick the largest
    measured-good strip that tiles n_pad exactly."""
    for strip in (512, 256, 128):
        if n_pad % strip == 0:
            return strip
    return n_pad


def mirror_upper_device(s, strip: int = 128):
    """Device-side mirror for ``cooccurrence_pallas_sym`` output.

    ``s`` is [..., n_pad, n_pad] with only column-strip >= row-strip
    entries computed (diagonal strip blocks complete).  Returns the full
    symmetric matrix: strictly-upper strip blocks are transposed into the
    strictly-lower ones.  Pure VPU, stays on device (used inside
    shard_map before/after psum)."""
    n = s.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // strip
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // strip
    up = jnp.where(c > r, s, 0)
    return s + jnp.swapaxes(up, -1, -2)


def sym_fits(n_pad: int, block: int, n_limbs: int, compute_dtype=jnp.int8,
             budget: int = 12 * 1024 * 1024) -> bool:
    """True when the symmetric kernel's VMEM working set (int32 accumulator
    + unpacked/weighted operands + packed input buffers) fits on-chip."""
    op_bytes = 2 if compute_dtype == jnp.bfloat16 else 1
    acc = 4 * n_limbs * n_pad * n_pad
    operands = (n_limbs + 1) * n_pad * block * op_bytes
    inputs = 2 * (n_pad // 8) * block  # double-buffered packed bits
    return acc + operands + inputs <= budget


def _kernel_tri(ti_ref, tj_ref, bits_i_ref, bits_j_ref, wl_ref, out_ref, *,
                tile, block, n_limbs, compute_dtype):
    # identical math to _kernel; the (i, j) tile pair comes from the
    # scalar-prefetched upper-triangle enumeration
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc_dtype = jnp.float32 if compute_dtype == jnp.bfloat16 else jnp.int32
    a_i32 = _unpack_T(bits_i_ref[0], tile, block)
    a_j32 = _unpack_T(bits_j_ref[0], tile, block)
    a_i = a_i32.astype(compute_dtype)
    for l in range(n_limbs):
        w = wl_ref[0, l, :].astype(jnp.int32)
        wa_j = (a_j32 * w[None, :]).astype(compute_dtype)
        s = jax.lax.dot_general(
            a_i, wa_j,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        out_ref[l, :, :] = out_ref[l, :, :] + s.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("block", "n_pad", "n_limbs", "tile", "compute_dtype", "interpret"),
)
def cooccurrence_pallas_tri(
    bits_t,
    w_limbs_t,
    tile_i,
    tile_j,
    block: int,
    n_pad: int,
    n_limbs: int,
    tile: int = 512,
    compute_dtype=jnp.int8,
    interpret: bool = False,
):
    """Upper-triangle-only variant: the grid enumerates the nt*(nt+1)/2
    tile pairs given by the scalar-prefetched ``tile_i``/``tile_j`` index
    arrays; lower-triangle output tiles are never computed (the caller
    mirrors them on host).  ~2x fewer MXU passes for multi-tile N.
    """
    num_blocks = bits_t.shape[0]
    num_pairs = tile_i.shape[0]
    t8 = tile // 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pairs, num_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, t8, block),
                lambda p, b, ti, tj: (b, ti[p], 0),
            ),
            pl.BlockSpec(
                (1, t8, block),
                lambda p, b, ti, tj: (b, tj[p], 0),
            ),
            pl.BlockSpec(
                (1, n_limbs, block),
                lambda p, b, ti, tj: (b, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_limbs, tile, tile),
            lambda p, b, ti, tj: (0, ti[p], tj[p]),
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_tri, tile=tile, block=block, n_limbs=n_limbs,
            compute_dtype=compute_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_limbs, n_pad, n_pad), jnp.int32),
        interpret=interpret,
    )(tile_i, tile_j, bits_t, bits_t, w_limbs_t)


def upper_triangle_tiles(nt: int):
    """(tile_i, tile_j) int32 arrays enumerating i <= j tile pairs,
    ordered so consecutive pairs share the output tile's row when
    possible (plain row-major upper triangle)."""
    pairs = [(i, j) for i in range(nt) for j in range(i, nt)]
    ti = np.array([p[0] for p in pairs], dtype=np.int32)
    tj = np.array([p[1] for p in pairs], dtype=np.int32)
    return ti, tj


def mirror_upper_tiles(s: np.ndarray, tile: int) -> np.ndarray:
    """Fill the lower-triangle tiles from the transposed upper tiles.

    The diagonal tiles are computed in full by the kernel; strictly-lower
    tiles are uninitialized and replaced here."""
    n_pad = s.shape[0]
    nt = n_pad // tile
    for i in range(1, nt):
        for j in range(i):
            s[i * tile : (i + 1) * tile, j * tile : (j + 1) * tile] = s[
                j * tile : (j + 1) * tile, i * tile : (i + 1) * tile
            ].T
    return s


def pack_inputs(
    offsets: np.ndarray,
    members: np.ndarray,
    w_limbs: np.ndarray,
    n_pad: int,
    block: int,
    device_pack: bool = False,
):
    """CSR colors -> transposed device inputs (bits_t, w_limbs_t).

    With ``device_pack``, the first element may instead be the marker
    tuple ``("keys", keys, nb)``: sorted posting keys for on-device
    packing (``bm.scatter_pack_device(keys, nb, block, n_pad, True)``),
    shipping 4 bytes per posting across H2D instead of n_pad/8 bytes per
    color.  Falls back to host packing when the keys don't qualify
    (int32 bit-space overflow or members unsorted within a color)."""
    from kspider_tpu.ops import bitmask as bm

    nb = max(1, -(-(len(offsets) - 1) // block))
    n_limbs = w_limbs.shape[1]
    wl = np.zeros((nb * block, n_limbs), dtype=np.int8)
    wl[: len(w_limbs)] = w_limbs
    wl_t = np.ascontiguousarray(
        wl.reshape(nb, block, n_limbs).transpose(0, 2, 1)
    )
    if device_pack:
        keys = bm.build_scatter_keys(offsets, members, n_pad, nb, block)
        if keys is not None:
            return ("keys", keys, nb), wl_t
    bits = bm.pack_bitmask_blocks(offsets, members, n_pad, block)
    bits_t = np.ascontiguousarray(bits.transpose(0, 2, 1))
    return bits_t, wl_t


def auto_tile(n_limbs: int, block: int = 1024, budget: int = 8 * 1024 * 1024) -> int:
    """Largest 128-multiple tile whose VMEM working set fits.

    Empirical budget on v5e (16MB VMEM): the int32 accumulator tile
    (4*L*tile^2) must stay within ~8MB alongside the unpack/scale
    intermediates (~tile*block int32s); the triangular variant's scalar
    prefetch buffers shave another ~1MB, so multi-tile runs pass a
    tighter budget.
    """
    tile = 128
    while tile < 1024:
        nxt = tile + 128
        if 4 * n_limbs * nxt * nxt > budget:
            break
        tile = nxt
    return tile


def shared_kmer_matrix_pallas(
    offsets: np.ndarray,
    members: np.ndarray,
    weights: np.ndarray,
    n: int,
    block: int = 1024,
    tile: int = None,
    drop_singletons: bool = True,
    compute_dtype=jnp.int8,
    interpret: bool = None,
) -> np.ndarray:
    """Exact shared-k-mer matrix via the fused Pallas kernel (int64, NxN)."""
    from kspider_tpu.ops import pairwise as pw

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    offsets = np.asarray(offsets, dtype=np.int64)
    members = np.asarray(members, dtype=np.int32)
    weights = np.asarray(weights, dtype=np.int64)
    degrees = np.diff(offsets)
    keep = (
        np.flatnonzero(degrees >= 2) if drop_singletons else np.arange(len(degrees))
    )
    if len(keep) == 0 or n == 0:
        return np.zeros((n, n), dtype=np.int64)

    kept_deg = degrees[keep]
    new_offsets = np.zeros(len(keep) + 1, dtype=np.int64)
    np.cumsum(kept_deg, out=new_offsets[1:])
    gather = np.repeat(offsets[keep], kept_deg) + (
        np.arange(int(kept_deg.sum())) - np.repeat(new_offsets[:-1], kept_deg)
    )
    new_members = members[gather]
    new_weights = weights[keep]

    w_limbs = pw.weight_limbs(new_weights)
    n_limbs = w_limbs.shape[1]
    num_colors = len(new_weights)
    # symmetric row-strip kernel whenever the whole accumulator fits VMEM
    # (~1.4x the full-square kernel: upper-triangle-only MXU work)
    n_pad_sym = max(128, -(-n // 128) * 128)
    strip = best_strip(n_pad_sym)
    use_sym = tile is None and sym_fits(
        n_pad_sym, block, n_limbs, compute_dtype
    )
    if use_sym:
        tile = strip
        n_pad = n_pad_sym
    else:
        if tile is None:
            tile = auto_tile(n_limbs, block)
            if n > tile:
                # multi-tile => triangular kernel: scalar-prefetch buffers
                # and the int32 unpack intermediates (~9 bytes per
                # tile*block element) leave less room for the accumulator
                tile = min(
                    768, auto_tile(n_limbs, block, budget=5 * 1024 * 1024)
                )
        n_pad = max(tile, -(-n // tile) * tile)

    add = jax.jit(lambda x, y: x + y)

    from kspider_tpu.ops import bitmask as bm

    dp_policy, dp_ratio = bm.device_pack_policy()

    total = np.zeros((n_pad, n_pad), dtype=np.int64)
    super_size = pw._MAX_COLORS_PER_CALL - (pw._MAX_COLORS_PER_CALL % block)
    # within a superblock (int32-exact bound), stream pipeline chunks:
    # host packing and H2D of chunk k+1 overlap the kernel on chunk k via
    # async dispatch; the accumulator stays on device, one D2H at the end
    chunk_colors = 64 * block
    for start in range(0, num_colors, super_size):
        stop = min(start + super_size, num_colors)
        acc_dev = None
        for cs in range(start, stop, chunk_colors):
            ce = min(cs + chunk_colors, stop)
            sl_off = new_offsets[cs : ce + 1] - new_offsets[cs]
            sl_mem = new_members[new_offsets[cs] : new_offsets[ce]]
            nb_chunk = max(1, -(-(ce - cs) // block))
            devpack = dp_policy == "force" or (
                dp_policy == "auto"
                and 4 * bm.key_bucket(len(sl_mem)) * dp_ratio
                <= nb_chunk * block * n_pad // 8
            )
            bits_t, wl_t = pack_inputs(
                sl_off, sl_mem, w_limbs[cs:ce], n_pad, block,
                device_pack=devpack,
            )
            if isinstance(bits_t, tuple):
                bits_t = bm.scatter_pack_device(
                    bits_t[1], bits_t[2], block, n_pad, True
                )
            nt = n_pad // tile
            if use_sym:
                acc = cooccurrence_pallas_sym(
                    bits_t, wl_t, block, n_pad, n_limbs, strip=strip,
                    compute_dtype=compute_dtype, interpret=interpret,
                )
            elif nt > 1:
                ti, tj = upper_triangle_tiles(nt)
                acc = cooccurrence_pallas_tri(
                    bits_t, wl_t, ti, tj, block, n_pad, n_limbs, tile=tile,
                    compute_dtype=compute_dtype, interpret=interpret,
                )
            else:
                acc = cooccurrence_pallas(
                    bits_t, wl_t, block, n_pad, n_limbs, tile=tile,
                    compute_dtype=compute_dtype, interpret=interpret,
                )
            acc_dev = acc if acc_dev is None else add(acc_dev, acc)
        acc_h = np.asarray(acc_dev).astype(np.int64)
        scale = 1
        for l in range(n_limbs):
            total += acc_h[l] * scale
            scale *= 128
    if n_pad // tile > 1:
        total = mirror_upper_tiles(total, tile)
    s = total[:n, :n]
    np.fill_diagonal(s, 0)
    return s
