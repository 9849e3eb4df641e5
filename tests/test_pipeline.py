"""End-to-end pipeline tests: synthetic PDBs + SMILES -> pair dataset ->
bucketed loader -> a short training run whose loss decreases."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caster_dta_tpu.data import synthetic
from caster_dta_tpu.data.batching import BucketedLoader
from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train.loop import TrainConfig, fit, split_dataset

DATASET_KWARGS = dict(
    protein_dist_units="angstroms", protein_edge_thresh=4,
    protein_thresh_type="dist", protein_keep_selfloops=True,
    protein_vector_features=True, molecule_include_selfloops=True,
    scale_output=["standardize"], n_workers=0)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    df = synthetic.make_synthetic_dataframe(str(out), n_proteins=4,
                                            n_molecules=6, n_pairs=40, seed=0)
    return ProteinMoleculeDataset(df, **DATASET_KWARGS)


def test_dataset_basics(dataset):
    assert len(dataset) > 10
    md = dataset.metadata_dict
    assert md["protein_node_features"] == (17, 3)
    assert md["protein_edge_features"] == (32, 1)
    assert md["molecule_node_features"][0] == 41 if isinstance(
        md["molecule_node_features"], tuple) else md["molecule_node_features"] == 41
    # standardized targets: ~zero mean, ~unit std
    assert abs(float(dataset.affinity_data.mean())) < 1e-5
    assert abs(float(dataset.affinity_data.std(ddof=1)) - 1) < 1e-5
    # unscale round-trips
    orig = dataset.unscale_target(dataset.affinity_data)
    assert orig.min() > 4.0  # synthetic affinities start near 5


def test_scaling_roundtrip_composable(tmp_path):
    df = synthetic.make_synthetic_dataframe(str(tmp_path), n_proteins=2,
                                            n_molecules=3, n_pairs=10, seed=1)
    ds = ProteinMoleculeDataset(df, **{**DATASET_KWARGS,
                                       "scale_output": ["log", "standardize"]})
    vals = ds.unscale_target(ds.affinity_data)
    np.testing.assert_allclose(vals, df["affinity_score"].values, rtol=1e-5)
    # JSON artifact schema round-trip
    rep = ds._report_scale_data()
    assert rep["scale_output"] == ["log", "standardize"]
    ds2 = ProteinMoleculeDataset(df, **{**DATASET_KWARGS, "scale_output": ["standardize"]})
    ds2._load_scale_data_from_dict(rep)
    np.testing.assert_allclose(ds2.scale_mean_factor, ds.scale_mean_factor)


def test_bucketed_loader_covers_all_pairs(dataset):
    loader = BucketedLoader(dataset, max_num=200_000, max_batch_size=8,
                            shuffle=True, seed=0)
    seen = []
    for batch in loader:
        assert batch.protein.node_s.shape[0] == batch.target.shape[0]
        seen.extend(batch.pair_idx[batch.weight > 0].tolist())
    assert sorted(seen) == list(range(len(dataset)))
    # static shapes: every batch from the same bucket has the same shape
    shapes = {}
    for batch in loader:
        shapes.setdefault(batch.bucket, set()).add(
            (batch.protein.node_s.shape, batch.molecule.node_s.shape))
    for b, ss in shapes.items():
        assert len(ss) == 1


def test_split_deterministic(dataset):
    tr1, va1, te1 = split_dataset(dataset, seed=9)
    tr2, va2, te2 = split_dataset(dataset, seed=9)
    assert tr1 == tr2 and va1 == va2 and te1 == te2
    assert len(set(tr1) & set(va1)) == 0
    assert len(tr1) + len(va1) + len(te1) == len(dataset)


def test_training_loss_decreases(dataset, tmp_path):
    model = make_joint_gnn(
        dict(base_conv="lbamodel",
             in_channels=dataset.metadata_dict["protein_node_features"],
             edge_dim=dataset.metadata_dict["protein_edge_features"],
             num_ntypes=dataset.metadata_dict["protein_node_types"],
             num_etypes=dataset.metadata_dict["protein_edge_types"],
             ntype_emb_dim=None, etype_emb_dim=None, num_convs=1,
             hidden_channels=(8, 2), edge_hidden_channels=(16, 1),
             out_channels=16, dropout_rate=0.0, activation="leaky_relu",
             aggr="sum"),
        dict(base_conv="gine",
             in_channels=dataset.metadata_dict["molecule_node_features"],
             edge_dim=dataset.metadata_dict["molecule_edge_features"],
             num_ntypes=dataset.metadata_dict["molecule_node_types"],
             num_etypes=dataset.metadata_dict["molecule_edge_types"],
             ntype_emb_dim=None, etype_emb_dim=None, num_convs=1,
             hidden_channels=8, out_channels=16, dropout_rate=0.0,
             activation="leaky_relu", aggr="sum"),
        residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=4,
        attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
        pairwise_embedding_dim=64, out_lin_depth=1, activation="leaky_relu",
        dropout=0.0, num_cross_attn_layers=1)

    cfg = TrainConfig(n_epochs=40, lr=1e-2, seed=0, early_stop_epochs=60,
                      scheduler=None, print_unscaled_loss=False)
    res = fit(model, dataset, "synthetic", str(tmp_path / "out"), cfg,
              max_num=200_000, max_batch_size=8, verbose=False)
    first = res["history"][0]["train"]
    last = min(h["train"] for h in res["history"])
    assert last < first * 0.7, f"loss did not decrease: {first} -> {last}"
    assert np.isfinite(res["test_metrics"]["mse"])
    assert 0.0 <= res["test_metrics"]["concordance_index"] <= 1.0
    # checkpoints + artifacts exist
    files = os.listdir(tmp_path / "out")
    assert any(f.startswith("bestvalmodel_") for f in files)
    assert any(f.startswith("finalmodel_") for f in files)
    assert "model_summary.txt" in files
    # retention: superseded best checkpoints are deleted as training improves
    # (40 epochs of falling loss would otherwise pile up dozens of files)
    assert sum(f.startswith("bestvalmodel_") for f in files) == 1
    assert sum(f.startswith("besttrainmodel_") for f in files) == 1
    # leakage report (reference train_model.py:807-824): split sizes add up
    # and the dedup'd entity counts are consistent
    leak = res["leakage"]
    assert (leak["train"]["n_pairs"] + leak["val"]["n_pairs"]
            + leak["test"]["n_pairs"]) == len(dataset)
    for split in ("train", "val", "test"):
        assert leak[split]["n_proteins"] <= leak[split]["n_pairs"]
    assert leak["overlap"]["train_val_proteins"] <= leak["train"]["n_proteins"]


def test_device_resident_loader_parity(dataset):
    """Device-side gather assembly must produce the same batches as host
    assembly (same epoch order, same graph tensors, same coverage)."""
    from caster_dta_tpu.data.device_cache import DeviceResidentLoader

    mk = lambda: BucketedLoader(dataset, None, max_num=200_000,
                                max_batch_size=8, shuffle=True, seed=3)
    host_dl = mk()
    dev_dl = DeviceResidentLoader(mk())
    seen = []
    for hb, db in zip(host_dl, dev_dl):
        np.testing.assert_array_equal(hb.pair_idx, db.pair_idx)
        np.testing.assert_array_equal(hb.weight, db.weight)
        np.testing.assert_allclose(hb.target, db.target, rtol=1e-6)
        for field in ("node_s", "node_v", "edge_src", "edge_dst", "edge_s",
                      "edge_v", "node_type", "edge_type", "node_mask",
                      "edge_mask"):
            np.testing.assert_array_equal(
                np.asarray(getattr(db.protein, field)),
                np.asarray(getattr(hb.protein, field)), err_msg=f"p.{field}")
            np.testing.assert_array_equal(
                np.asarray(getattr(db.molecule, field)),
                np.asarray(getattr(hb.molecule, field)), err_msg=f"m.{field}")
        assert dev_dl.last_batch_edges == host_dl.last_batch_edges
        seen.extend(db.pair_idx[db.weight > 0].tolist())
    assert sorted(seen) == list(range(len(dataset)))
    assert DeviceResidentLoader.estimate_store_bytes(mk()) > 0
    # budget fallback returns the raw loader
    assert isinstance(DeviceResidentLoader.maybe(mk(), 10), BucketedLoader)


def test_scan_steps_matches_per_batch(dataset):
    """scan-over-steps (one lax.scan dispatch per bucket per epoch) must
    reproduce the per-batch path exactly when there is a single bucket: the
    rng threading, lr injection, and optimizer updates are step-identical."""
    from caster_dta_tpu.data.device_cache import DeviceResidentLoader
    from caster_dta_tpu.train.loop import Trainer

    model = _mk_small_model(dataset)
    mk = lambda: DeviceResidentLoader(BucketedLoader(
        dataset, None, max_num=16_000_000, max_batch_size=8,
        shuffle=True, seed=3))
    dl_a, dl_b = mk(), mk()
    assert len(dl_a.loader.buckets()) == 1, "fixture must stay single-bucket"
    example = next(iter(mk()))
    tr_a = Trainer(model, TrainConfig(seed=5, scan_steps=True), example)
    tr_b = Trainer(model, TrainConfig(seed=5, scan_steps=False), example)
    for _ in range(2):
        loss_a, _ = tr_a.train_epoch(dl_a, 1e-3)
        loss_b, _ = tr_b.train_epoch(dl_b, 1e-3)
        assert loss_a == loss_b
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        tr_a.params, tr_b.params)
    ev_a = tr_a.eval_epoch(dl_a)
    ev_b = tr_b.eval_epoch(dl_b)
    assert ev_a[0] == ev_b[0]
    np.testing.assert_allclose(ev_a[1], ev_b[1], rtol=1e-6)
    np.testing.assert_array_equal(ev_a[3], ev_b[3])


def test_scan_steps_multibucket_covers_all_pairs(dataset):
    """With several buckets the megabatch path must still cover every pair
    exactly once per epoch and train without error."""
    from caster_dta_tpu.data.device_cache import DeviceResidentLoader
    from caster_dta_tpu.train.loop import Trainer

    dl = DeviceResidentLoader(BucketedLoader(
        dataset, None, max_num=200_000, max_batch_size=4,
        shuffle=True, seed=7, coalesce=False))
    seen = []
    for mega, edges in dl.iter_megabatches():
        assert mega.n_steps == len(edges)
        for j in range(mega.n_steps):
            seen.extend(mega.pair_idx[j][mega.weight[j] > 0].tolist())
    assert sorted(seen) == list(range(len(dataset)))

    model = _mk_small_model(dataset)
    example = next(iter(dl))
    tr = Trainer(model, TrainConfig(seed=5, scan_steps=True), example)
    loss, _ = tr.train_epoch(dl, 1e-3)
    assert np.isfinite(loss)


def _mk_small_model(dataset):
    from caster_dta_tpu.models.joint import make_joint_gnn

    md = dataset.metadata_dict
    return make_joint_gnn(
            dict(base_conv="lbamodel", in_channels=md["protein_node_features"],
                 edge_dim=md["protein_edge_features"],
                 num_ntypes=md["protein_node_types"],
                 num_etypes=md["protein_edge_types"], ntype_emb_dim=None,
                 etype_emb_dim=None, num_convs=1, hidden_channels=(8, 2),
                 edge_hidden_channels=(16, 1), out_channels=16,
                 dropout_rate=0.1, activation="leaky_relu", aggr="sum"),
            dict(base_conv="gine", in_channels=md["molecule_node_features"],
                 edge_dim=md["molecule_edge_features"],
                 num_ntypes=md["molecule_node_types"],
                 num_etypes=md["molecule_edge_types"], ntype_emb_dim=None,
                 etype_emb_dim=None, num_convs=1, hidden_channels=8,
                 out_channels=16, dropout_rate=0.1, activation="leaky_relu",
                 aggr="sum"),
            residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=4,
            attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
            pairwise_embedding_dim=64, out_lin_depth=1, out_lin_factor=0.5,
            out_lin_norm_type=None, activation="leaky_relu", dropout=0.1,
            element_pooling="mean", include_residual_stream=False,
            residual_dim_ff_scale=2, num_cross_attn_layers=1,
            include_post_pool_layernorm=False)


def test_training_reproducible(dataset, tmp_path):
    """Same seed -> identical loss history (seeding story, SURVEY §7)."""
    cfg = TrainConfig(seed=5, scheduler=None, n_epochs=2,
                      print_unscaled_loss=False)
    h1 = fit(_mk_small_model(dataset), dataset, "synthetic",
             str(tmp_path / "a"), cfg,
             max_num=200_000, max_batch_size=8, verbose=False)["history"]
    h2 = fit(_mk_small_model(dataset), dataset, "synthetic",
             str(tmp_path / "b"), cfg,
             max_num=200_000, max_batch_size=8, verbose=False)["history"]
    assert [e["train"] for e in h1] == [e["train"] for e in h2]
    assert [e["val"] for e in h1] == [e["val"] for e in h2]


def test_bf16_mixed_precision(dataset, tmp_path):
    """compute_dtype='bfloat16' (the AMP equivalent, reference
    train_model.py:478): trains to a loss close to pure f32, params stay
    f32, and the policy resets for subsequent f32 trainers."""
    from caster_dta_tpu.nn import common as nn_common
    from caster_dta_tpu.train.loop import Trainer, split_dataset
    from caster_dta_tpu.data.batching import BucketedLoader

    idx, *_ = split_dataset(dataset, 0)
    dl = BucketedLoader(dataset, idx, max_num=200_000, max_batch_size=8,
                        shuffle=False, seed=0)
    batch = next(iter(dl))

    model = _mk_small_model(dataset)
    losses, evals = {}, {}

    def eval_mse(tr, p):
        pred = tr._eval_step(p, batch)
        m = np.asarray(batch.weight) > 0
        return float(np.mean((np.asarray(pred)[m] - batch.target[m]) ** 2))

    for dt in (None, "bfloat16"):
        # threefry pinned: the 10-step decrease thresholds below were
        # calibrated on that init stream (the test is about compute-dtype
        # semantics, not the PRNG; rbg is covered by the suite's defaults)
        tr = Trainer(model, TrainConfig(seed=0, lr=1e-2, scheduler=None,
                                        prng_impl="threefry2x32",
                                        compute_dtype=dt), batch)
        p, o = tr.params, tr.opt_state
        ev0 = eval_mse(tr, p)
        rng = jax.random.PRNGKey(0)
        ls = []
        for _ in range(10):
            p, o, loss, pred, rng = tr._train_step(p, o, batch, rng,
                                                   np.float32(1e-2))
            ls.append(float(loss))
        losses[dt] = ls
        evals[dt] = (ev0, eval_mse(tr, p))
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(p))
        assert pred.dtype == jnp.float32
    assert nn_common.get_compute_dtype() == jnp.bfloat16
    nn_common.set_compute_dtype(None)
    # deterministic eval loss decreases materially after 10 steps (per-step
    # train losses are dropout-noisy now that the RNG advances inside the step)
    assert evals["bfloat16"][1] < 0.96 * evals["bfloat16"][0], evals
    assert evals[None][1] < 0.96 * evals[None][0], evals
    dev = max(abs(a - b) for a, b in zip(losses[None], losses["bfloat16"]))
    assert dev < 0.06, (losses, dev)


def test_resume_bit_identical(dataset, tmp_path):
    """Full train-state resume: an interrupted run continued with resume=True
    reproduces the straight run's loss history exactly (params+optimizer+
    scheduler+rng+shuffle-order state all restored)."""
    import shutil

    common = dict(scheduler="plateau", print_unscaled_loss=False, seed=7)
    kw = dict(max_num=200_000, max_batch_size=8, verbose=False)

    straight = fit(_mk_small_model(dataset), dataset, "synthetic",
                   str(tmp_path / "straight"),
                   TrainConfig(n_epochs=4, save_state_every=0, **common), **kw)

    out = str(tmp_path / "resumed")
    fit(_mk_small_model(dataset), dataset, "synthetic", out,
        TrainConfig(n_epochs=2, save_state_every=1, **common), **kw)
    # wipe best checkpoints so the resumed run's test eval can't silently
    # reuse a pre-interrupt best; keep only the train state
    for f in list(os.listdir(out)):
        if f.startswith(("bestval", "besttrain", "final")):
            os.remove(os.path.join(out, f))
    resumed = fit(_mk_small_model(dataset), dataset, "synthetic", out,
                  TrainConfig(n_epochs=4, save_state_every=1, resume=True,
                              **common), **kw)

    h_straight = [(e["epoch"], e["train"], e["val"])
                  for e in straight["history"]]
    h_resumed = [(e["epoch"], e["train"], e["val"])
                 for e in resumed["history"]]
    assert h_resumed == h_straight
    # compare the FINAL-epoch params (finalmodel checkpoints), not the
    # returned best-val-loaded params: the resumed dir's pre-interrupt best
    # files were wiped above, so when the overall best val falls in the
    # pre-interrupt epochs the two runs legitimately reload different best
    # checkpoints — the resume guarantee is about the training trajectory
    from caster_dta_tpu.train import checkpoints as _ck
    straight["params"] = _ck.load_params(
        straight["params"], _ck.get_best_model(str(tmp_path / "straight"),
                                               "final"))
    resumed["params"] = _ck.load_params(
        resumed["params"], _ck.get_best_model(out, "final"))
    for a, b in zip(jax.tree_util.tree_leaves(straight["params"]),
                    jax.tree_util.tree_leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # "finish" workflow: resuming with n_epochs == reached epoch runs ZERO
    # training epochs and goes straight to final checkpoint + test eval
    # (how a timed-out bounded run gets its test metrics recorded)
    finished = fit(_mk_small_model(dataset), dataset, "synthetic", out,
                   TrainConfig(n_epochs=4, save_state_every=1, resume=True,
                               **common), **kw)
    assert [e["epoch"] for e in finished["history"]] == [0, 1, 2, 3]
    assert np.isfinite(finished["test_metrics"]["mse"])
    np.testing.assert_allclose(finished["test_metrics"]["mse"],
                               resumed["test_metrics"]["mse"], rtol=1e-6)


def test_pad_cache_lru_bounded(dataset):
    """The host pad-cache must stay under its byte budget by evicting LRU
    entries (VERDICT round-1 weak #7: unbounded growth at BindingDB scale)."""
    loader = BucketedLoader(dataset, None, max_num=200_000, max_batch_size=4,
                            shuffle=False, pad_cache_bytes=300_000)
    for _ in loader:
        assert loader._pad_cache.nbytes <= 300_000
    assert len(loader._pad_cache) > 0
    # an effectively-unbounded budget keeps every entry
    big = BucketedLoader(dataset, None, max_num=200_000, max_batch_size=4,
                         shuffle=False)
    for _ in big:
        pass
    assert len(big._pad_cache) >= len(loader._pad_cache)
