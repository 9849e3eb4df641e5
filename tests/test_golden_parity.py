"""Prediction-level golden parity: the pretrained reference checkpoint,
transplanted into the JAX model, must reproduce the reference forward pass
(re-executed in pure torch, tests/ref_torch_exec.py) on a probe batch —
final predictions AND per-tower embeddings (VERDICT round-1 missing item #2b).

Any wrong transpose/ordering in interop/torch_import.py fails these tests:
the torch side loads the checkpoint with strict load_state_dict onto
identically-named params, so the two sides share no transplant code path.
"""
import json
import os

import numpy as np
import jax
import pytest

from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
from caster_dta_tpu.interop import torch_import
from caster_dta_tpu.models.joint import make_joint_gnn

REF = "/root/reference/pretrained_model_downstream"
CKPT = os.path.join(REF, "bestvalmodel_bindingdb_val0.6889_epoch01011.pt")

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not available")


@pytest.fixture(scope="module")
def model_kwargs():
    with open(os.path.join(REF, "model_kwargs.json")) as f:
        return json.load(f)


def _random_pair_graphs(rng, b=3):
    """Raw per-pair protein/molecule graphs with the trained feature dims."""
    pairs = []
    for _ in range(b):
        n_p = int(rng.integers(8, 15))
        e_p = int(rng.integers(16, 40))
        n_m = int(rng.integers(5, 10))
        e_m = int(rng.integers(8, 20))
        pairs.append(dict(
            p_node_s=rng.normal(size=(n_p, 17)).astype(np.float32),
            p_node_v=rng.normal(size=(n_p, 3, 3)).astype(np.float32),
            p_edge_index=np.stack([rng.integers(0, n_p, e_p),
                                   rng.integers(0, n_p, e_p)]),
            p_edge_s=rng.normal(size=(e_p, 32)).astype(np.float32),
            p_edge_v=rng.normal(size=(e_p, 1, 3)).astype(np.float32),
            p_ntype=rng.integers(0, 20, n_p),
            p_etype=np.zeros(e_p, np.int64),
            m_node_s=rng.normal(size=(n_m, 41)).astype(np.float32),
            m_edge_index=np.stack([rng.integers(0, n_m, e_m),
                                   rng.integers(0, n_m, e_m)]),
            m_edge_s=rng.normal(size=(e_m, 9)).astype(np.float32),
            m_ntype=rng.integers(0, 11, n_m),
            m_etype=rng.integers(0, 5, e_m),
        ))
    return pairs


def _jax_batches(pairs, n_pad=16, e_pad=48, nm_pad=12, em_pad=24):
    pg = stack_graphs([pad_graph(
        node_s=p["p_node_s"], node_v=p["p_node_v"],
        edge_index=p["p_edge_index"], edge_s=p["p_edge_s"],
        edge_v=p["p_edge_v"], node_type=p["p_ntype"],
        edge_type=p["p_etype"], n_pad=n_pad, e_pad=e_pad) for p in pairs])
    mg = stack_graphs([pad_graph(
        node_s=p["m_node_s"], node_v=None, edge_index=p["m_edge_index"],
        edge_s=p["m_edge_s"], edge_v=None, node_type=p["m_ntype"],
        edge_type=p["m_etype"], n_pad=nm_pad, e_pad=em_pad) for p in pairs])
    return pg, mg


def _torch_batch(pairs):
    """The reference's collated format: concatenated COO + batch vectors."""
    import torch

    def collate(prefix, vec=False):
        xs, eidx, es, nt, et, batch, off = [], [], [], [], [], [], 0
        vs, evs = [], []
        for g, p in enumerate(pairs):
            n = len(p[f"{prefix}_node_s"])
            xs.append(p[f"{prefix}_node_s"])
            if vec:
                vs.append(p[f"{prefix}_node_v"])
                evs.append(p[f"{prefix}_edge_v"])
            eidx.append(p[f"{prefix}_edge_index"] + off)
            es.append(p[f"{prefix}_edge_s"])
            nt.append(p[f"{prefix}_ntype"])
            et.append(p[f"{prefix}_etype"])
            batch.append(np.full(n, g))
            off += n
        d = {
            "x": torch.tensor(np.concatenate(xs)),
            "edge_index": torch.tensor(np.concatenate(eidx, 1)),
            "eattr": torch.tensor(np.concatenate(es)),
            "ntypes": torch.tensor(np.concatenate(nt)),
            "etypes": torch.tensor(np.concatenate(et)),
            "batch": torch.tensor(np.concatenate(batch)),
        }
        if vec:
            d["x"] = (d["x"], torch.tensor(np.concatenate(vs)))
            d["eattr"] = (d["eattr"], torch.tensor(np.concatenate(evs)))
        return d

    return collate("p", vec=True), collate("m", vec=False)


@pytest.fixture(scope="module")
def outputs(model_kwargs):
    import torch

    from tests.ref_torch_exec import load_reference_into_mirror

    rng = np.random.default_rng(7)
    pairs = _random_pair_graphs(rng)

    # --- reference re-execution (torch, strict state-dict load) ---
    mirror = load_reference_into_mirror(CKPT, model_kwargs)
    pdata, mdata = _torch_batch(pairs)
    with torch.no_grad():
        ref_score, ref_inter = mirror(pdata, mdata, b=len(pairs))

    # --- transplanted JAX model ---
    variables = torch_import.load_reference_checkpoint(CKPT, model_kwargs)
    model = make_joint_gnn(model_kwargs["protein_gnn_kwargs"],
                           model_kwargs["molecule_gnn_kwargs"],
                           **model_kwargs["joint_gnn_kwargs"])
    pg, mg = _jax_batches(pairs)
    (score, _), state = model.apply(variables, pg, mg,
                                    capture_intermediates=True,
                                    mutable=["intermediates"])
    inter = state["intermediates"]
    return pairs, ref_score.numpy(), ref_inter, np.asarray(score), inter, pg, mg


def test_final_predictions_match(outputs):
    _, ref_score, _, score, _, _, _ = outputs
    np.testing.assert_allclose(score, ref_score, rtol=1e-4, atol=1e-4)


def test_protein_tower_embeddings_match(outputs):
    pairs, _, ref_inter, _, inter, pg, _ = outputs
    jax_res = np.asarray(inter["protein_gnn"]["__call__"][0])  # [B, N, 64]
    ref_res = ref_inter["residue_embed"].numpy()               # [Ntot, 64]
    off = 0
    for g, p in enumerate(pairs):
        n = len(p["p_node_s"])
        np.testing.assert_allclose(jax_res[g, :n], ref_res[off:off + n],
                                   rtol=1e-4, atol=1e-4)
        off += n


def test_molecule_tower_embeddings_match(outputs):
    pairs, _, ref_inter, _, inter, _, mg = outputs
    jax_atom = np.asarray(inter["molecule_gnn"]["__call__"][0])
    ref_atom = ref_inter["atom_embed"].numpy()
    off = 0
    for g, p in enumerate(pairs):
        n = len(p["m_node_s"])
        np.testing.assert_allclose(jax_atom[g, :n], ref_atom[off:off + n],
                                   rtol=1e-4, atol=1e-4)
        off += n
