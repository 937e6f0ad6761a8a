"""H2D bandwidth probe: does payload entropy change the transfer rate?

The development tunnel's effective H2D rate may depend on payload
compressibility (a compressing transport makes sparse bitmask blocks
nearly free while high-entropy posting keys pay full fare), which
would invert the device-pack byte-ratio logic on this host only.
Sends equal-sized buffers of different entropy through the same jit
identity and times the round to a scalar sync.

CAVEAT: the tunnel misreports async completion (CLAUDE.md), so
block_until_ready can return before bytes actually moved — treat these
rates as upper bounds and trust only end-to-end walls of runs that
land real bytes back on host (the interleaved A/B in BASELINE.md).
Measured 2026-08: ~1GB/s reported for every entropy class, i.e. no
compression signal was observable and the device-pack byte-ratio
stands.

    python benchmarks/h2d_probe.py [--mb 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n = args.mb * (1 << 20)
    rng = np.random.default_rng(0)

    payloads = {
        "zeros-u8": np.zeros(n, np.uint8),
        "sparse-bits-u8 (1/32 set)": np.where(
            rng.random(n) < 1 / 32, np.uint8(0x80), np.uint8(0)
        ),
        "random-u8": rng.integers(0, 256, n, dtype=np.uint8),
        "sorted-keys-i32": np.sort(
            rng.choice(n * 2, size=n // 4, replace=False)
        ).astype(np.int32),
        "delta-keys-i32 (small gaps)": np.cumsum(
            rng.integers(1, 9, n // 4, dtype=np.int32), dtype=np.int32
        ),
    }

    sink = jax.jit(lambda x: (x[:: max(1, len(x) // 64)].astype(jnp.int32)).sum())
    warm = np.zeros(n, np.uint8)
    sink(warm).block_until_ready()
    sink(payloads["sorted-keys-i32"]).block_until_ready()

    for name, arr in payloads.items():
        t0 = time.perf_counter()
        sink(arr).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{name:28s} {arr.nbytes / 1e6:6.0f}MB  {dt:7.2f}s  "
              f"{arr.nbytes / dt / 1e6:8.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
