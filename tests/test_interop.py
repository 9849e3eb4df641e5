"""Weight-transplant parity: the pretrained reference checkpoint must map
exactly onto the JAX model's param tree (every torch tensor consumed, every
JAX param filled with matching shape) and run (SURVEY.md §7 'hard parts')."""
import json
import os

import numpy as np
import jax
import pytest

from caster_dta_tpu.interop import torch_import
from caster_dta_tpu.models.joint import make_joint_gnn
from tests.test_joint import _protein_batch, _molecule_batch

REF = "/root/reference/pretrained_model_downstream"
CKPT = os.path.join(REF, "bestvalmodel_bindingdb_val0.6889_epoch01011.pt")

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not available")


@pytest.fixture(scope="module")
def model_kwargs():
    with open(os.path.join(REF, "model_kwargs.json")) as f:
        return json.load(f)


def test_transplant_matches_init_tree(model_kwargs):
    variables = torch_import.load_reference_checkpoint(CKPT, model_kwargs)

    model = make_joint_gnn(model_kwargs["protein_gnn_kwargs"],
                           model_kwargs["molecule_gnn_kwargs"],
                           **model_kwargs["joint_gnn_kwargs"])
    rng = np.random.default_rng(0)
    pg = _protein_batch(rng)
    mg = _molecule_batch(rng)
    init_vars = model.init(jax.random.PRNGKey(0), pg, mg)

    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_flatten_with_path(init_vars)[0]}
    got_paths = {jax.tree_util.keystr(p): np.asarray(l).shape
                 for p, l in jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert init_paths == got_paths

    # and the transplanted model runs with finite output
    score, attn = model.apply(variables, pg, mg)
    assert np.all(np.isfinite(np.asarray(score)))


def test_transplant_deterministic_prediction(model_kwargs):
    """Transplanted weights -> repeatable predictions on a fixed input."""
    variables = torch_import.load_reference_checkpoint(CKPT, model_kwargs)
    model = make_joint_gnn(model_kwargs["protein_gnn_kwargs"],
                           model_kwargs["molecule_gnn_kwargs"],
                           **model_kwargs["joint_gnn_kwargs"])
    rng = np.random.default_rng(1)
    pg = _protein_batch(rng, b=1)
    mg = _molecule_batch(rng, b=1)
    s1, _ = model.apply(variables, pg, mg)
    s2, _ = model.apply(variables, pg, mg)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
