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
