"""Checkpoint reload: rebuild model + dataset from run artifacts.

Behavioral spec: reference inference/inference_utils.py:40-90. Reads the same
four JSON artifacts; loads either this framework's .msgpack checkpoints or the
reference's torch .pt state dicts (via interop.torch_import — the
'_orig_mod.' compile-prefix handling of inference_utils.py:52-66 lives there).
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train import checkpoints


def _dims(x):
    return tuple(x) if isinstance(x, (list, tuple)) else (int(x), 0)


def template_batch(model_kwargs: dict):
    """Tiny correctly-shaped (protein, molecule) batch for param templating."""
    pk, mk = model_kwargs["protein_gnn_kwargs"], model_kwargs["molecule_gnn_kwargs"]
    p_ns, p_nv = _dims(pk["in_channels"])
    p_es, p_ev = _dims(pk["edge_dim"])
    m_ns = mk["in_channels"] if isinstance(mk["in_channels"], int) else mk["in_channels"][0]
    m_es = mk["edge_dim"] if isinstance(mk["edge_dim"], int) else mk["edge_dim"][0]
    rng = np.random.default_rng(0)
    pg = stack_graphs([pad_graph(
        node_s=rng.normal(size=(4, p_ns)), node_v=rng.normal(size=(4, p_nv, 3)),
        edge_index=np.array([[0, 1, 2, 3], [1, 2, 3, 0]]),
        edge_s=rng.normal(size=(4, p_es)), edge_v=rng.normal(size=(4, p_ev, 3)),
        node_type=np.zeros(4), edge_type=np.zeros(4), n_pad=4, e_pad=4)])
    mg = stack_graphs([pad_graph(
        node_s=rng.normal(size=(3, m_ns)), node_v=None,
        edge_index=np.array([[0, 1, 2], [1, 2, 0]]),
        edge_s=rng.normal(size=(3, m_es)), edge_v=None,
        node_type=np.zeros(3), edge_type=np.zeros(3), n_pad=3, e_pad=3)])
    return pg, mg


def load_model_from_checkpoint(check_path: str, best_model_type: str = "val",
                               param_file: str | None = None):
    """-> (model, variables, model_kwargs).

    ``param_file`` pins an exact checkpoint file (the reference torch.loads
    whatever path it is given, inference_utils.py:40-70); when None the best
    ``best_model_type`` file in ``check_path`` is selected."""
    with open(os.path.join(check_path, "model_kwargs.json")) as f:
        model_kwargs = json.load(f)
    model = make_joint_gnn(model_kwargs["protein_gnn_kwargs"],
                           model_kwargs["molecule_gnn_kwargs"],
                           **model_kwargs["joint_gnn_kwargs"])
    if param_file is None:
        param_file = checkpoints.get_best_model(check_path, best_model_type)
    if param_file.endswith(".pt"):
        from caster_dta_tpu.interop.torch_import import load_reference_checkpoint
        variables = load_reference_checkpoint(param_file, model_kwargs)
    else:
        pg, mg = template_batch(model_kwargs)
        template = model.init(jax.random.PRNGKey(0), pg, mg)
        params = checkpoints.load_params(template["params"], param_file)
        variables = {**template, "params": params}
    return model, variables, model_kwargs


def create_dataset_with_checkpoint_params(dataset_df, check_path: str,
                                          cache_dir: str | None = None,
                                          n_workers=None):
    """Rebuild the dataset from dataset_kwargs.json + rescale params
    (inference_utils.py:73-90), with optional pickle caching by df hash."""
    import hashlib
    import pickle

    import pandas as pd

    from caster_dta_tpu.data.pairs import ProteinMoleculeDataset

    dataset = None
    ds_file = None
    if cache_dir:
        df_hash = hashlib.sha256(
            pd.util.hash_pandas_object(dataset_df, index=True).values).hexdigest()
        ds_file = os.path.join(cache_dir, f"dataset_{df_hash}.pkl")
        if os.path.exists(ds_file):
            with open(ds_file, "rb") as f:
                dataset = pickle.load(f)
    if dataset is None:
        with open(os.path.join(check_path, "dataset_kwargs.json")) as f:
            dataset_kwargs = json.load(f)
        dataset_kwargs.setdefault("n_workers", n_workers)
        dataset = ProteinMoleculeDataset(dataset_df, **dataset_kwargs)
        if ds_file:
            with open(ds_file, "wb") as f:
                pickle.dump(dataset, f)
    with open(os.path.join(check_path, "dataset_rescale_params.json")) as f:
        dataset._load_scale_data_from_dict(json.load(f))
    return dataset
