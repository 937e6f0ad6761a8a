"""MXU rate probe: what int8 dot rate is actually achievable on this chip?

Closes the MFU accounting for the pairwise kernel (docs/architecture.md,
BASELINE.md): the v5e datasheet lists ~394 int8 TOPS vs ~197 bf16 TFLOPS,
but the co-occurrence kernel measures ~166 effective int8 TOPS and a plain
XLA int8 matmul ~158.  This probe times square matmuls in bf16->f32,
int8->i32, and f32->f32 at several sizes with the chained-execution +
scalar-sync protocol (tunnel-safe, see bench.py), so the "MXU-rate-bound"
claim rests on a measured ceiling rather than a datasheet number.

The reference has no analogous measurement (no benchmarks exist there);
this quantifies the replacement for /root/reference/src/pairwise.cpp's
hot loop against physical limits.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_matmul(n, in_dtype, acc_dtype, chain=8, reps=3):
    key = jax.random.PRNGKey(0)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (n, n), -127, 127, dtype=jnp.int8)
        b = jax.random.randint(key, (n, n), -127, 127, dtype=jnp.int8)
    else:
        a = jax.random.normal(key, (n, n), dtype=in_dtype)
        b = jax.random.normal(key, (n, n), dtype=in_dtype)

    @jax.jit
    def chained(a, b):
        # chain executions serially so one dispatch covers `chain` matmuls;
        # ending in a scalar defeats the tunnel's async completion report
        out = jnp.zeros((), dtype=jnp.float32)
        x = a
        for _ in range(chain):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            # fold a data dependency back into the next matmul operand
            x = (y & 127).astype(jnp.int8) if in_dtype == jnp.int8 else (
                y.astype(in_dtype) * jnp.array(1e-3, in_dtype)
            )
            out = out + y[0, 0].astype(jnp.float32)
        return out

    chained(a, b).block_until_ready()  # compile
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        chained(a, b).block_until_ready()
        dt = (time.perf_counter() - t0) / chain
        best = dt if best is None else min(best, dt)
    tops = 2 * n**3 / best / 1e12
    return best, tops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="2048,4096,8192")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    sizes = [int(s) for s in args.sizes.split(",")]
    combos = [
        ("int8->int32", jnp.int8, jnp.int32),
        ("bf16->f32  ", jnp.bfloat16, jnp.float32),
        ("f32->f32   ", jnp.float32, jnp.float32),
    ]
    for n in sizes:
        for name, ind, accd in combos:
            dt, tops = time_matmul(n, ind, accd)
            print(f"n={n:5d}  {name}  {dt * 1e3:8.3f} ms  "
                  f"{tops:7.1f} T{'OPS' if ind == jnp.int8 else 'FLOPS'}",
                  flush=True)


if __name__ == "__main__":
    main()
