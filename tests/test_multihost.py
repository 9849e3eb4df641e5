"""Multi-process ("multi-host") data parallelism: two local processes, each
owning 4 virtual CPU devices, joined by ``jax.distributed.initialize`` into
one 8-device global mesh — the SURVEY §4/§5 prescription for validating the
multi-host comm path (DCN across hosts in production) without a TPU pod.

Asserts that one dp train step over the 2-process global mesh produces the
SAME loss and updated parameters as a single-process single-device step —
i.e. gradient all-reduce over the distributed mesh is exact.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    # single-process single-device reference (this test process runs the
    # 8-device CPU conftest config; run unmeshed = one device)
    from flax import serialization

    from tests.multihost_worker import run_step

    ref_loss, ref_params = run_step(mesh=None)

    with open(tmp_path / "loss.txt") as f:
        dist_loss = float(f.read())
    with open(tmp_path / "params.msgpack", "rb") as f:
        dist_state = serialization.msgpack_restore(f.read())
    ref_state = serialization.to_state_dict(ref_params)

    np.testing.assert_allclose(dist_loss, ref_loss, rtol=1e-5)
    flat_ref = {k: v for k, v in _flatten(ref_state)}
    flat_dist = {k: v for k, v in _flatten(dist_state)}
    assert flat_ref.keys() == flat_dist.keys()
    for k in flat_ref:
        np.testing.assert_allclose(flat_dist[k], flat_ref[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def _flatten(d, prefix=""):
    for k, v in d.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, np.asarray(v)
