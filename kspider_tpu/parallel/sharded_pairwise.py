"""Multi-chip pairwise: color blocks sharded over the mesh, psum over ICI.

TPU-native replacement for the reference's OpenMP range-split + shared
hash map (/root/reference/src/pairwise.cpp:199-237): each device owns a
contiguous slice of color blocks in the packed-bitmask layout
(ops/bitmask.py), unpacks and accumulates its partial Gram matrix with
int8 MXU matmuls, and the partials are merged with a single
``jax.lax.psum`` over the ``shards`` axis — the collective rides ICI,
there is no shared mutable state and no contention.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from kspider_tpu.ops import bitmask as bm
from kspider_tpu.ops import pairwise as pairwise_ops
from kspider_tpu.parallel.mesh import SHARD_AXIS, make_mesh


def _device_body_pallas(bits, w_limbs, block: int, n_pad: int, n_limbs: int,
                        interpret: bool = False):
    """Per-device Pallas path: transpose the local blocks into the kernel
    layout, run the symmetric row-strip kernel, mirror on device.  Used on
    TPU backends when the accumulator fits VMEM (pallas_pairwise.sym_fits);
    ~1.3x the XLA scan body per chip."""
    from kspider_tpu.ops import pallas_pairwise as pp

    bits_t = jnp.swapaxes(bits, 1, 2)  # [NB, n_pad/8, block]
    wl_t = jnp.swapaxes(w_limbs, 1, 2)  # [NB, L, block]
    strip = pp.best_strip(n_pad)
    acc = pp.cooccurrence_pallas_sym.__wrapped__(
        bits_t, wl_t, block, n_pad, n_limbs, strip=strip, interpret=interpret
    )
    return pp.mirror_upper_device(acc, strip)


def _device_body(bits, w_limbs, block: int, n_pad: int, n_limbs: int, axis=None):
    """Per-device scan over its local color blocks (same math as
    ops.bitmask.cooccurrence_bitmask_blocks)."""

    def body(acc, xs):
        b, wl = xs
        a = bm.unpack_bits_to_int8(b)  # [block, n_pad] i8

        def limb(l, acc):
            wa = a * wl[:, l][:, None]
            s = jax.lax.dot_general(
                wa,
                a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.at[l].add(s)

        return jax.lax.fori_loop(0, n_limbs, limb, acc), None

    acc0 = jnp.zeros((n_limbs, n_pad, n_pad), dtype=jnp.int32)
    if axis is not None:
        # inside shard_map the carry must be marked varying over the mesh
        # axis to match the body output's vma type
        if hasattr(jax.lax, "pcast"):
            acc0 = jax.lax.pcast(acc0, axis, to="varying")
        else:  # older jax
            acc0 = jax.lax.pvary(acc0, (axis,))
    acc, _ = jax.lax.scan(body, acc0, (bits, w_limbs))
    return acc


def sharded_cooccurrence(
    bits: np.ndarray,
    w_limbs: np.ndarray,
    block: int,
    n_pad: int,
    n_limbs: int,
    mesh: Mesh,
    engine: str = "auto",
):
    """bits u8[NB, block, n_pad/8], w_limbs i8[NB, block, L] with NB
    divisible by the mesh size; returns replicated i32[L, n_pad, n_pad].

    ``engine``: "auto" picks the per-device Pallas symmetric kernel on
    accelerator backends when the accumulator fits VMEM, else the XLA
    scan body; "pallas"/"pallas-interpret"/"xla" force a path."""
    if engine == "auto":
        from kspider_tpu.ops import pallas_pairwise as pp

        on_tpu = jax.default_backend() != "cpu"
        engine = (
            "pallas" if on_tpu and pp.sym_fits(n_pad, block, n_limbs) else "xla"
        )

    use_pallas = engine in ("pallas", "pallas-interpret")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None, None)),
        out_specs=P(),
        # pallas_call out_shapes carry no vma annotation; disable the
        # varying-mesh-axes checker on that path
        check_vma=not use_pallas,
    )
    def run(b, wl):
        if use_pallas:
            acc = _device_body_pallas(
                b, wl, block, n_pad, n_limbs,
                interpret=(engine == "pallas-interpret"),
            )
        else:
            acc = _device_body(b, wl, block, n_pad, n_limbs, axis=SHARD_AXIS)
        return jax.lax.psum(acc, SHARD_AXIS)

    return jax.jit(run)(bits, w_limbs)


def _compact_multi_colors(offsets, members, weights):
    degrees = np.diff(offsets)
    keep = np.flatnonzero(degrees >= 2)
    if len(keep) == 0:
        return None
    kept_deg = degrees[keep]
    new_offsets = np.zeros(len(keep) + 1, dtype=np.int64)
    np.cumsum(kept_deg, out=new_offsets[1:])
    gather = np.repeat(offsets[keep], kept_deg) + (
        np.arange(int(kept_deg.sum())) - np.repeat(new_offsets[:-1], kept_deg)
    )
    return new_offsets, members[gather], weights[keep]


def shared_kmer_matrix_sharded(
    offsets: np.ndarray,
    members: np.ndarray,
    weights: np.ndarray,
    n: int,
    mesh: Optional[Mesh] = None,
    block: int = 1024,
    engine: str = "auto",
) -> np.ndarray:
    """Mesh-parallel version of :func:`kspider_tpu.ops.pairwise.shared_kmer_matrix`.

    Exactness bound: per-device color count must stay under
    127 * C_local < 2**31 (~16.9M colors per device per call).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    offsets = np.asarray(offsets, dtype=np.int64)
    members = np.asarray(members, dtype=np.int32)
    weights = np.asarray(weights, dtype=np.int64)
    compacted = _compact_multi_colors(offsets, members, weights)
    if compacted is None or n == 0:
        return np.zeros((n, n), dtype=np.int64)
    new_offsets, new_members, new_weights = compacted

    n_pad = max(128, -(-n // 128) * 128)
    w_limbs = pairwise_ops.weight_limbs(new_weights)
    n_limbs = w_limbs.shape[1]

    bits = bm.pack_bitmask_blocks(new_offsets, new_members, n, block)
    nb = bits.shape[0]
    wl = np.zeros((nb * block, n_limbs), dtype=np.int8)
    wl[: len(new_weights)] = w_limbs
    wl = wl.reshape(nb, block, n_limbs)

    # pad block count to a multiple of the mesh size with empty blocks
    nb_pad = -(-nb // n_dev) * n_dev
    if nb_pad != nb:
        pad = nb_pad - nb
        bits = np.concatenate(
            [bits, np.zeros((pad,) + bits.shape[1:], dtype=np.uint8)]
        )
        wl = np.concatenate([wl, np.zeros((pad, block, n_limbs), dtype=np.int8)])

    acc = np.asarray(
        sharded_cooccurrence(bits, wl, block, n_pad, n_limbs, mesh, engine)
    ).astype(np.int64)
    total = np.zeros((n_pad, n_pad), dtype=np.int64)
    scale = 1
    for l in range(n_limbs):
        total += acc[l] * scale
        scale *= 128
    s = total[:n, :n]
    np.fill_diagonal(s, 0)
    return s
