"""End-to-end CLI driver test: the Metz deeper-config path (--protein-convs 3
--molecule-convs 3, BASELINE config #3) must train and write the full artifact
set. The reference has no conv-depth flags (its config block is
edit-the-source, train_model.py:276-331); this is the typed-config equivalent.
"""
import json
import os

import pytest


@pytest.mark.slow
def test_driver_deeper_convs(tmp_path):
    from caster_dta_tpu.train import driver

    out = tmp_path / "run"
    data_root = tmp_path / "data"
    result = driver.main([
        "--dataset", "synthetic", "--seed", "3",
        "--out-folder", str(out), "--data-root", str(data_root),
        "--n-epochs", "2", "--n-workers", "0",
        "--protein-convs", "3", "--molecule-convs", "3",
    ])
    with open(out / "model_kwargs.json") as f:
        mk = json.load(f)
    assert mk["protein_gnn_kwargs"]["num_convs"] == 3
    assert mk["molecule_gnn_kwargs"]["num_convs"] == 3
    assert result["history"][-1]["train"] > 0
    names = os.listdir(out)
    assert any(n.startswith("bestvalmodel_") for n in names)
    assert any(n.startswith("finalmodel_") for n in names)

    # the deeper run reloads through the inference contract
    from caster_dta_tpu.inference.checkpoint import (
        load_model_from_checkpoint, template_batch)
    model, variables, kwargs = load_model_from_checkpoint(str(out))
    pg, mg = template_batch(kwargs)
    score, _ = model.apply(variables, pg, mg, deterministic=True)
    assert score.shape[0] == 1

    # --resume WITHOUT re-passing the conv flags must rebuild the saved
    # (3,3) config from the run's own model_kwargs.json, not the CLI
    # defaults, and must not clobber the artifacts (ADVICE round-2 item 1)
    before = open(out / "model_kwargs.json").read()
    result2 = driver.main([
        "--dataset", "synthetic", "--seed", "3",
        "--out-folder", str(out), "--data-root", str(data_root),
        "--n-epochs", "4", "--n-workers", "0", "--resume",
    ])
    assert open(out / "model_kwargs.json").read() == before
    # real continuation (state written at run end): epochs 2..3 only
    assert [h["epoch"] for h in result2["history"][-2:]] == [2, 3]
    assert result2["history"][0]["epoch"] == 0   # history carried over


@pytest.mark.slow
def test_driver_checkpoint_finetune(tmp_path):
    """--checkpoint <run dir> fine-tunes: the model is rebuilt from the
    CHECKPOINT's kwargs and training starts from its params, so the first
    fine-tune epoch must beat a scratch first epoch (reference
    train_model.py:23-32,520-525 workflow)."""
    from caster_dta_tpu.train import driver

    data_root = tmp_path / "data"
    base = tmp_path / "base"
    scratch = driver.main([
        "--dataset", "synthetic", "--seed", "3",
        "--out-folder", str(base), "--data-root", str(data_root),
        "--n-epochs", "4", "--n-workers", "0",
        "--protein-convs", "3", "--molecule-convs", "3",
    ])

    ft_out = tmp_path / "finetune"
    ft = driver.main([
        "--dataset", "synthetic", "--seed", "3",
        "--out-folder", str(ft_out), "--data-root", str(data_root),
        "--n-epochs", "1", "--n-workers", "0",
        "--checkpoint", str(base), "--use-best", "val",
    ])
    # model rebuilt from the checkpoint's kwargs (3,3), not the CLI default
    with open(ft_out / "model_kwargs.json") as f:
        mk = json.load(f)
    assert mk["protein_gnn_kwargs"]["num_convs"] == 3
    assert mk["molecule_gnn_kwargs"]["num_convs"] == 3
    # warm start: epoch-0 fine-tune loss well below epoch-0 scratch loss
    assert ft["history"][0]["train"] < scratch["history"][0]["train"]
    assert ft["history"][0]["train"] < scratch["history"][-1]["train"] * 1.5


def test_driver_gp_fail_fast(tmp_path):
    """--gp with a non-lbamodel protein tower (from a resume folder's
    model_kwargs.json) must be rejected BEFORE the dataset build, with the
    message from parallel/partition.py (VERDICT r04 item 7)."""
    import json as _json

    from caster_dta_tpu.train import driver

    out = tmp_path / "run"
    out.mkdir()
    with open(out / "model_kwargs.json", "w") as f:
        _json.dump({"protein_gnn_kwargs": {"base_conv": "gatv2"},
                    "molecule_gnn_kwargs": {}, "joint_gnn_kwargs": {}}, f)
    with pytest.raises(SystemExit, match="lbamodel"):
        driver.main(["--gp", "2", "--resume", "--out-folder", str(out),
                     "--data-root", str(tmp_path / "nonexistent")])


def test_fit_gp_fail_fast():
    """Programmatic guard: fit() with gp>1 and a non-lbamodel tower raises
    at config validation, before touching the dataset."""
    from caster_dta_tpu.train.loop import TrainConfig, fit

    class FakeModel:
        protein_gnn_kwargs = {"base_conv": "gatv2"}

    with pytest.raises(ValueError, match="lbamodel"):
        fit(FakeModel(), None, "x", "/tmp/_gp_guard", TrainConfig(gp=2), 1, 1)


def test_checkpoint_file_pinning(tmp_path):
    """--checkpoint naming a FILE loads that exact file's params, not the
    best-val reselection (reference torch.loads the given path; ADVICE r04)."""
    import numpy as np

    from caster_dta_tpu.data import synthetic
    from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
    from caster_dta_tpu.inference.checkpoint import load_model_from_checkpoint
    from caster_dta_tpu.train import checkpoints
    from caster_dta_tpu.train.loop import TrainConfig, fit
    from caster_dta_tpu.models.joint import make_joint_gnn
    from caster_dta_tpu.train.driver import default_model_kwargs

    df = synthetic.make_synthetic_dataframe(str(tmp_path / "synth"),
                                            n_proteins=3, n_molecules=4,
                                            n_pairs=12, seed=0)
    ds = ProteinMoleculeDataset(
        df, protein_dist_units="angstroms", protein_edge_thresh=4,
        protein_thresh_type="dist", protein_keep_selfloops=True,
        protein_vector_features=True, molecule_include_selfloops=True,
        scale_output=["standardize"], n_workers=0)
    pk, mk, jk = default_model_kwargs(ds.metadata_dict)
    model = make_joint_gnn(pk, mk, **jk)
    out = tmp_path / "run"
    res = fit(model, ds, "synthetic", str(out),
              TrainConfig(n_epochs=2, seed=0, save_state_every=0,
                          device_data_budget=None),
              max_num=4000, max_batch_size=8)
    checkpoints.save_run_artifacts(str(out), {}, None, pk, mk, jk)
    # write a DISTINCT param file; pinning it must return those params
    params0 = res["params"]
    pinned = str(out / "pinned_params.msgpack")
    import jax
    marked = jax.tree_util.tree_map(lambda a: a * 0 + 7.0, params0)
    checkpoints.save_params(marked, pinned)
    _, variables, _ = load_model_from_checkpoint(str(out), "val",
                                                 param_file=pinned)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(np.allclose(np.asarray(l), 7.0) for l in leaves)
    # and without param_file the best-val file is still selected
    _, variables2, _ = load_model_from_checkpoint(str(out), "val")
    leaves2 = jax.tree_util.tree_leaves(variables2["params"])
    assert not all(np.allclose(np.asarray(l), 7.0) for l in leaves2)
