"""Micro-bench: row-gather / scatter cost at the bench shape, sustained.

Uses the scan-dispatch methodology (many iterations in ONE jit) because the
remote-device tunnel pipelines per-dispatch wall times (bench_baseline.json).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 20  # dispatches per trace


def sustained(fn, *args):
    """us per application of fn from TPU profiler-trace op durations (wall
    clocks through the remote tunnel are unreliable; device durations in the
    trace are exact)."""
    import glob
    import gzip
    import json
    import tempfile

    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="micro")
    with jax.profiler.trace(d):
        for _ in range(K):
            out = jfn(*args)
        jax.block_until_ready(out)
    f = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    names = {e["pid"]: e["args"]["name"] for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    # top-level envelope events are named by run id (digits) or jit_<fn>;
    # child op events carry real names. Sum children only.
    tot = sum(e["dur"] for e in tr["traceEvents"]
              if e.get("ph") == "X" and "TPU" in names.get(e["pid"], "")
              and not e["name"].isdigit() and not e["name"].startswith("jit"))
    return tot / K


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
