"""Fusion-boundary HBM traffic parser (utils/hlo_traffic.py) against real
compiled HLO — the accounting bench.py's roofline is built on."""
import jax
import jax.numpy as jnp

from caster_dta_tpu.utils import hlo_traffic as ht


def test_shape_bytes():
    assert ht.shape_bytes("f32[32,512]{1,0}") == 32 * 512 * 4
    assert ht.shape_bytes("bf16[8]") == 16
    assert ht.shape_bytes("pred[]") == 1
    assert ht.shape_bytes("(f32[4]{0}, s32[2,2]{1,0})") == 16 + 16
    assert ht.shape_bytes("token[]") == 0


def test_entry_traffic_on_compiled_matmul():
    f = jax.jit(lambda x, y: (x @ y) + 1.0)
    c = f.lower(jnp.zeros((128, 256), jnp.float32),
                jnp.zeros((256, 64), jnp.float32)).compile()
    tab = ht.entry_traffic(c.as_text())
    ops = {v["op"] for v in tab.values()}
    assert "parameter" in ops
    # parameters carry no traffic themselves; consumers count reading them
    for v in tab.values():
        if v["op"] == "parameter":
            assert v["bytes"] == 0
    total = ht.total_traffic_bytes(c.as_text())
    # at least every input read once and the output written once
    lower = 128 * 256 * 4 + 256 * 64 * 4 + 128 * 64 * 4
    assert lower <= total <= 3 * lower


def test_fusion_keeps_intermediates_out_of_traffic():
    # a chain of elementwise ops fuses to ONE kernel: traffic must be
    # in+out of the chain, not per-op (the round-3 cost-model failure mode)
    f = jax.jit(lambda x: jnp.tanh(x * 2.0 + 1.0) ** 2)
    x = jnp.zeros((1024, 1024), jnp.float32)
    c = f.lower(x).compile()
    total = ht.total_traffic_bytes(c.as_text())
    nb = 1024 * 1024 * 4
    assert total <= 2 * nb + nb // 4   # read + write (+ slack for consts)


def test_compiled_traffic_none_on_garbage():
    class Bad:
        def as_text(self):
            raise RuntimeError("no text")

    assert ht.compiled_traffic(Bad()) is None
