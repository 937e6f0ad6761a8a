"""MXU rate probe: what int8 dot rate is actually achievable on this chip?

Closes the MFU accounting for the pairwise kernel (docs/architecture.md,
BASELINE.md): the v5e datasheet lists ~394 int8 TOPS vs ~197 bf16 TFLOPS,
but the co-occurrence kernel measures ~166 effective int8 TOPS.  This
probe times chained square matmuls with a data dependency between steps
(the full result feeds the next operand, so XLA can neither CSE the dots
nor collapse them via the slice-of-dot rewrite), ending in a scalar
forced through float() (the tunnel reports async completion early —
CLAUDE.md).  Two chain lengths difference away the fixed dispatch/RPC
floor, and an elementwise-only chain measures the inter-matmul cast cost
to subtract:

    t_step(chain_b) - t_step(chain_a) cancels dispatch overhead;
    subtracting the cast-chain step isolates the pure dot time.

The reference has no analogous measurement (no benchmarks exist there);
this quantifies the replacement for /root/reference/src/pairwise.cpp's
hot loop against physical limits.
"""

import argparse
import time

import jax
import jax.numpy as jnp


def _feedback(y, in_dtype):
    """Cheap full-array data dependency: next operand from this result."""
    if in_dtype == jnp.int8:
        return (y & 127).astype(jnp.int8)
    return (y * jnp.array(1e-3, y.dtype)).astype(in_dtype)


def _mk_chain(in_dtype, acc_dtype, chain, matmul):
    @jax.jit
    def chained(a, b):
        out = jnp.zeros((), dtype=jnp.float32)
        x = a
        for _ in range(chain):
            if matmul:
                y = jax.lax.dot_general(
                    x, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
            else:  # elementwise-only: same feedback traffic, no dot
                y = x.astype(acc_dtype) + jnp.array(1, acc_dtype)
            x = _feedback(y, in_dtype)
            out = out + y[0, 0].astype(jnp.float32)
        return out

    return chained


def _time_call(fn, a, b, reps):
    float(fn(a, b))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(a, b))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def probe(n, in_dtype, acc_dtype, chains=(8, 24), reps=3):
    key = jax.random.PRNGKey(0)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (n, n), -127, 127, dtype=jnp.int8)
        b = jax.random.randint(key, (n, n), -127, 127, dtype=jnp.int8)
    else:
        a = jax.random.normal(key, (n, n), dtype=in_dtype)
        b = jax.random.normal(key, (n, n), dtype=in_dtype)

    ca, cb = chains
    t_mm_a = _time_call(_mk_chain(in_dtype, acc_dtype, ca, True), a, b, reps)
    t_mm_b = _time_call(_mk_chain(in_dtype, acc_dtype, cb, True), a, b, reps)
    t_ew_a = _time_call(_mk_chain(in_dtype, acc_dtype, ca, False), a, b, reps)
    t_ew_b = _time_call(_mk_chain(in_dtype, acc_dtype, cb, False), a, b, reps)
    step_mm = (t_mm_b - t_mm_a) / (cb - ca)  # dispatch floor cancelled
    step_ew = (t_ew_b - t_ew_a) / (cb - ca)
    dot = max(step_mm - step_ew, 1e-9)
    return step_mm, step_ew, dot, 2 * n**3 / dot / 1e12


def _mk_chain_mkn(m, k, n, in_dtype, acc_dtype, chain, matmul):
    """Rectangular chained dots: models the pairwise kernel's operand
    shapes (K=block contraction, N<=panel_pad output width) instead of a
    square matmul.  Feedback slices y[:, :k] so the data dependency holds
    for n >= k."""

    @jax.jit
    def chained(a, b):
        out = jnp.zeros((), dtype=jnp.float32)
        x = a
        for _ in range(chain):
            if matmul:
                y = jax.lax.dot_general(
                    x, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
            else:
                y = x.astype(acc_dtype) + jnp.array(1, acc_dtype)
                y = jnp.concatenate([y] * (n // k), axis=1)
            x = _feedback(y[:, :k], in_dtype)
            out = out + y[0, 0].astype(jnp.float32)
        return out

    return chained


def probe_mkn(m, k, n, in_dtype, acc_dtype, chains=(16, 48), reps=3):
    key = jax.random.PRNGKey(0)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (m, k), -127, 127, dtype=jnp.int8)
        b = jax.random.randint(key, (k, n), -127, 127, dtype=jnp.int8)
    else:
        a = jax.random.normal(key, (m, k), dtype=in_dtype)
        b = jax.random.normal(key, (k, n), dtype=in_dtype)
    ca, cb = chains
    t_a = _time_call(_mk_chain_mkn(m, k, n, in_dtype, acc_dtype, ca, True), a, b, reps)
    t_b = _time_call(_mk_chain_mkn(m, k, n, in_dtype, acc_dtype, cb, True), a, b, reps)
    e_a = _time_call(_mk_chain_mkn(m, k, n, in_dtype, acc_dtype, ca, False), a, b, reps)
    e_b = _time_call(_mk_chain_mkn(m, k, n, in_dtype, acc_dtype, cb, False), a, b, reps)
    step = (t_b - t_a) / (cb - ca)
    ew = (e_b - e_a) / (cb - ca)
    dot = max(step - ew, 1e-9)
    return step, ew, dot, 2 * m * k * n / dot / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="8192")
    ap.add_argument("--mkn", type=str, default="",
                    help="comma-separated MxKxN triples, e.g. "
                         "8192x1024x1024,4096x2048x2048 — the kernel-shaped "
                         "rate probe")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    combos = [
        ("int8->int32", jnp.int8, jnp.int32),
        ("bf16->f32  ", jnp.bfloat16, jnp.float32),
    ]
    if args.sizes:
        for n in (int(s) for s in args.sizes.split(",")):
            for name, ind, accd in combos:
                step_mm, step_ew, dot, tops = probe(n, ind, accd)
                unit = "TOPS" if ind == jnp.int8 else "TFLOPS"
                print(f"n={n:5d}  {name}  step={step_mm * 1e3:7.3f} ms "
                      f"(elementwise {step_ew * 1e3:6.3f} ms)  "
                      f"pure-dot={dot * 1e3:7.3f} ms  {tops:6.1f} {unit}",
                      flush=True)
    for triple in (t for t in args.mkn.split(",") if t):
        m, k, n = (int(v) for v in triple.split("x"))
        for name, ind, accd in combos:
            step_mm, step_ew, dot, tops = probe_mkn(m, k, n, ind, accd)
            unit = "TOPS" if ind == jnp.int8 else "TFLOPS"
            print(f"{m}x{k}x{n}  {name}  step={step_mm * 1e3:7.3f} ms "
                  f"(elementwise {step_ew * 1e3:6.3f} ms)  "
                  f"pure-dot={dot * 1e3:7.3f} ms  {tops:6.1f} {unit}",
                  flush=True)


if __name__ == "__main__":
    main()
