"""Micro-bench: row-gather / scatter cost at the bench shape, sustained.

Uses the scan-dispatch methodology (many iterations in ONE jit) because the
remote-device tunnel pipelines per-dispatch wall times (bench_baseline.json).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 100  # scan length


def sustained(fn, *args):
    """us per application of fn, measured as one K-step lax.scan dispatch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(c, _):
            # make the FIRST arg carry-dependent so XLA cannot hoist the op
            # out of the loop (adds one cheap elementwise add per iter)
            a0 = args[0] + c.astype(args[0].dtype)
            out = fn(a0, *args[1:])
            return c * 0 + jnp.real(jnp.sum(out[..., 0, 0])) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    c = run(args)
    jax.block_until_ready(c)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = run(args)
        jax.block_until_ready(c)
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e6


def main():
    import jax
    import jax.numpy as jnp

    B, N, E, F = 32, 512, 4096, 28
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    dst = jnp.asarray(np.sort(rng.integers(0, N, (B, E)).astype(np.int32), axis=1))
    src = jnp.asarray(rng.integers(0, N, (B, E)).astype(np.int32))
    both = jnp.concatenate([src, dst], axis=1)
    mask = jnp.ones((B, E), bool)

    from caster_dta_tpu.ops.segment import _gather_rows
    from caster_dta_tpu.ops import pallas_segment

    for dt, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        tb = table.astype(dt)
        print(f"gather 2E rows {name} F={F}: "
              f"{sustained(_gather_rows, tb, both):8.1f} us")
        print(f"gather  E rows {name} F={F}: "
              f"{sustained(_gather_rows, tb, src):8.1f} us")
        print(f"gather  E sorted {name} F={F}: "
              f"{sustained(_gather_rows, tb, dst):8.1f} us")

    msgs = jnp.asarray(rng.normal(size=(B, E, F)).astype(np.float32))
    msgs2 = jnp.asarray(rng.normal(size=(B, 2 * E, F)).astype(np.float32))

    print(f"windowed segsum E rows f32: "
          f"{sustained(lambda m: pallas_segment.pallas_segment_sum(m, dst, mask, N), msgs):8.1f} us")
    print(f"dense-scan unsorted E rows f32: "
          f"{sustained(lambda m: pallas_segment.unsorted_segment_sum_rows(m.reshape(B, E, -1), src, N), msgs):8.1f} us")
    print(f"dense-scan unsorted 2E rows f32: "
          f"{sustained(lambda m: pallas_segment.unsorted_segment_sum_rows(m.reshape(B, 2*E, -1), both, N), msgs2):8.1f} us")


if __name__ == "__main__":
    main()
