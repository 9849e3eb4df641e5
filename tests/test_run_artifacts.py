"""The committed Davis convergence run (runs/davis_seed9, RESULTS.md) must
reload through the inference checkpoint contract — the reference's
"four JSON artifacts" reload path (reference inference/inference_utils.py:40-90).
"""
import json
import os

import numpy as np
import pytest

RUN_DIR = os.path.join(os.path.dirname(__file__), "..", "runs", "davis_seed9")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RUN_DIR), reason="committed run dir missing")


def test_best_model_pick_is_lowest_val():
    from caster_dta_tpu.train.checkpoints import get_best_model

    best = get_best_model(RUN_DIR, "val")
    assert os.path.basename(best) == "bestvalmodel_davis_val0.2364_epoch01390.msgpack"
    final = get_best_model(RUN_DIR, "final")
    assert os.path.basename(final).startswith("finalmodel_davis_")


def test_model_reloads_and_predicts():
    import jax

    from caster_dta_tpu.inference.checkpoint import (
        load_model_from_checkpoint, template_batch)

    model, variables, model_kwargs = load_model_from_checkpoint(RUN_DIR, "val")
    # trained-config contract: CASTER-DTA(2,2), reference's 764,396 params
    # on Davis vocab sizes (21 residue types here vs BindingDB's 20)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert model_kwargs["protein_gnn_kwargs"]["num_convs"] == 2
    assert n_params > 700_000

    pg, mg = template_batch(model_kwargs)
    score1, _ = model.apply(variables, pg, mg, deterministic=True)
    score2, _ = model.apply(variables, pg, mg, deterministic=True)
    assert np.all(np.isfinite(np.asarray(score1)))
    np.testing.assert_array_equal(np.asarray(score1), np.asarray(score2))


def test_rescale_params_round_trip():
    """dataset_rescale_params.json must drive unscale_target identically to
    the training run (scaled val 0.2364 -> unscaled MSE x std^2)."""
    with open(os.path.join(RUN_DIR, "dataset_rescale_params.json")) as f:
        rescale = json.load(f)
    assert rescale["scale_output"] == ["standardize"]
    mean = rescale["standardize"]["scale_mean_factor"]
    std = rescale["standardize"]["scale_std_factor"]

    from caster_dta_tpu.data.pairs import ProteinMoleculeDataset

    ds = ProteinMoleculeDataset.__new__(ProteinMoleculeDataset)
    ds.scale_output = []
    ds._scale_params = {}
    ds._load_scale_data_from_dict(rescale)
    scaled = np.array([0.0, 1.0, -1.0], np.float64)
    np.testing.assert_allclose(ds.unscale_target(scaled),
                               scaled * std + mean, rtol=1e-6)


def test_log_records_reference_class_test_metrics():
    """RESULTS.md's headline numbers come from the committed log."""
    with open(os.path.join(RUN_DIR, "log.txt")) as f:
        tail = f.read()[-2000:]
    assert "Test metrics" in tail
    metrics = json.loads(tail[tail.index("{", tail.index("Test metrics")):])
    assert metrics["mse"] < 0.30
    assert metrics["concordance_index"] > 0.85
    assert metrics["pearson"] > 0.80
