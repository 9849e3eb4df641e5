"""Numerical parity against real torch modules (pure torch, no PyG needed):
the transplant mapping conventions in interop/torch_import.py must make our
flax modules reproduce torch outputs bit-for-bit-ish (f32 tolerance).

This is the strongest evidence the reference checkpoint transplant is
numerically faithful (SURVEY §7 'bit-matched accuracy' hard part) that can
run in this image (torch_geometric/torch_scatter are not installed, so the
full reference forward cannot run here).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from caster_dta_tpu.nn.attention import MultiheadAttention
from caster_dta_tpu.nn.conv import GRUCell


def test_multihead_attention_matches_torch(rng):
    b, lq, lk, e, h = 2, 9, 7, 32, 4
    q = rng.normal(size=(b, lq, e)).astype(np.float32)
    kv = rng.normal(size=(b, lk, e)).astype(np.float32)
    pad = rng.random((b, lk)) < 0.3
    pad[:, 0] = False  # keep at least one real key per row

    tm = torch.nn.MultiheadAttention(e, h, batch_first=True)
    tm.eval()
    with torch.no_grad():
        t_out, t_w = tm(torch.tensor(q), torch.tensor(kv), torch.tensor(kv),
                        key_padding_mask=torch.tensor(pad))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    wq, wk, wv = np.split(sd["in_proj_weight"], 3, axis=0)
    bq, bk, bv = np.split(sd["in_proj_bias"], 3, axis=0)
    params = {"params": {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": {"kernel": sd["out_proj.weight"].T,
                     "bias": sd["out_proj.bias"]},
    }}
    jm = MultiheadAttention(e, h)
    j_out, j_w = jm.apply(jax.tree_util.tree_map(jnp.asarray, params),
                          jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
                          key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_kdim_vdim_attention_matches_torch(rng):
    """kdim/vdim != embed_dim — the cross-attention configuration the
    reference uses (joint_gnn.py:354-367)."""
    b, lq, lk, e, kd, h = 2, 6, 11, 32, 24, 4
    q = rng.normal(size=(b, lq, e)).astype(np.float32)
    kv = rng.normal(size=(b, lk, kd)).astype(np.float32)

    tm = torch.nn.MultiheadAttention(e, h, kdim=kd, vdim=kd, batch_first=True)
    tm.eval()
    with torch.no_grad():
        t_out, t_w = tm(torch.tensor(q), torch.tensor(kv), torch.tensor(kv))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    bq, bk, bv = np.split(sd["in_proj_bias"], 3, axis=0)
    params = {"params": {
        "q_proj": {"kernel": sd["q_proj_weight"].T, "bias": bq},
        "k_proj": {"kernel": sd["k_proj_weight"].T, "bias": bk},
        "v_proj": {"kernel": sd["v_proj_weight"].T, "bias": bv},
        "out_proj": {"kernel": sd["out_proj.weight"].T,
                     "bias": sd["out_proj.bias"]},
    }}
    jm = MultiheadAttention(e, h)
    j_out, j_w = jm.apply(jax.tree_util.tree_map(jnp.asarray, params),
                          jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_gru_cell_matches_torch(rng):
    b, d, hdim = 5, 12, 12
    x = rng.normal(size=(b, d)).astype(np.float32)
    h0 = rng.normal(size=(b, hdim)).astype(np.float32)

    tc = torch.nn.GRUCell(d, hdim)
    tc.eval()
    with torch.no_grad():
        t_out = tc(torch.tensor(x), torch.tensor(h0))

    sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}
    params = {"params": {
        "weight_ih": {"kernel": sd["weight_ih"].T, "bias": sd["bias_ih"]},
        "weight_hh": {"kernel": sd["weight_hh"].T, "bias": sd["bias_hh"]},
    }}
    jc = GRUCell(hdim)
    j_out = jc.apply(jax.tree_util.tree_map(jnp.asarray, params),
                     jnp.asarray(x), jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_layernorm_matches_torch(rng):
    import flax.linen as fnn

    x = rng.normal(size=(3, 17)).astype(np.float32) * 3
    tl = torch.nn.LayerNorm(17)
    tl.eval()
    with torch.no_grad():
        t_out = tl(torch.tensor(x))
    params = {"params": {"scale": tl.weight.detach().numpy(),
                         "bias": tl.bias.detach().numpy()}}
    j_out = fnn.LayerNorm(epsilon=1e-5).apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-5, atol=1e-5)
