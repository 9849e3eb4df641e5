"""Training CLI driver.

Behavioral spec: reference train_model.py (the 829-line script): same flags
(--dataset --seed --out-folder --checkpoint --use-best --skip-training), same
artifact outputs, same defaults (CASTER-DTA(2,2): lbamodel+gine, Adam 1e-4,
plateau 0.8/50, early stop 200, standardize targets, 4A dist edges with
self-loops), same dataset caching keyed by dataframe+kwargs hashes.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle

import numpy as np
import pandas as pd

from caster_dta_tpu.data.batching import dataset_budgets
from caster_dta_tpu.data.datasets import load_dataset
from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train import checkpoints
from caster_dta_tpu.train.loop import TrainConfig, fit

DEFAULT_DATASET_KWARGS = dict(
    sparse_edges=False,
    protein_dist_units="angstroms",
    protein_edge_thresh=4,
    protein_thresh_type="dist",
    protein_keep_selfloops=True,
    protein_vector_features=True,
    protein_include_esm2=False,
    protein_include_residue_posenc=False,
    protein_include_aa_props=True,
    molecule_full_atomtype=False,
    molecule_onehot_ordinal_feats=False,
    molecule_include_selfloops=True,
    scale_output=["standardize"],
)


def default_model_kwargs(metadata: dict):
    """The trained CASTER-DTA(2,2) config (reference train_model.py:276-331)."""
    protein_gnn_kwargs = dict(
        base_conv="lbamodel",
        in_channels=metadata["protein_node_features"],
        edge_dim=metadata["protein_edge_features"],
        num_ntypes=metadata["protein_node_types"],
        num_etypes=metadata["protein_edge_types"],
        ntype_emb_dim=None, etype_emb_dim=None,
        num_convs=2, hidden_channels=(16, 4), edge_hidden_channels=(32, 1),
        out_channels=64, dropout_rate=0.2, activation="leaky_relu", aggr="sum")
    molecule_gnn_kwargs = dict(
        base_conv="gine",
        in_channels=metadata["molecule_node_features"],
        edge_dim=metadata["molecule_edge_features"],
        num_ntypes=metadata["molecule_node_types"],
        num_etypes=metadata["molecule_edge_types"],
        ntype_emb_dim=None, etype_emb_dim=None,
        num_convs=2, hidden_channels=16, out_channels=64, dropout_rate=0.2,
        activation="leaky_relu", aggr="sum", gin_trainable_eps=True)
    joint_gnn_kwargs = dict(
        residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=8,
        attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
        pairwise_embedding_dim=512, out_lin_depth=1, out_lin_factor=0.5,
        out_lin_norm_type=None, activation="leaky_relu", dropout=0.1,
        element_pooling="mean", include_residual_stream=True,
        residual_dim_ff_scale=2, num_cross_attn_layers=1,
        include_post_pool_layernorm=False)
    return protein_gnn_kwargs, molecule_gnn_kwargs, joint_gnn_kwargs


def generate_missing_structures(data_df: pd.DataFrame,
                                structures_dir: str) -> pd.DataFrame:
    """Write placeholder helix-backbone PDBs for proteins lacking a structure
    file and point protein_file at them.

    Offline stand-in for the acquisition layer (data/acquire.py): geometry is
    synthetic, but sequences/ligands/affinities are the real dataset, so the
    full pipeline (featurize -> bucket -> train) runs end-to-end.
    """
    from caster_dta_tpu.data.synthetic import helix_backbone, write_pdb

    os.makedirs(structures_dir, exist_ok=True)
    df = data_df.copy()
    rng = np.random.default_rng(0)
    for pid, seq in df[["protein_id", "protein_sequence"]].drop_duplicates().values:
        path = os.path.join(structures_dir, f"{pid}.pdb")
        if not os.path.exists(path):
            write_pdb(path, helix_backbone(len(seq), rng), seq)
        df.loc[df["protein_id"] == pid, "protein_file"] = path
    return df


def build_or_load_dataset(data_df: pd.DataFrame, cache_dir: str,
                          dataset_kwargs: dict, n_workers=None):
    """Dataset build with hash-keyed caching (train_model.py:132-149)."""
    df_hash = hashlib.sha256(
        pd.util.hash_pandas_object(data_df, index=True).values).hexdigest()
    kwargs_hash = hashlib.sha256(
        json.dumps(dataset_kwargs, default=str).encode()).hexdigest()
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"00_datasetobj__{df_hash}_{kwargs_hash}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    ds = ProteinMoleculeDataset(data_df, n_workers=n_workers, **dataset_kwargs)
    with open(path, "wb") as f:
        pickle.dump(ds, f)
    return ds


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train the joint GNN model on a dataset (TPU-native)")
    p.add_argument("--dataset", type=str, default="davis")
    p.add_argument("--out-folder", type=str, default="output")
    p.add_argument("--seed", type=int, default=9)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--use-best", type=str, default="val",
                   choices=["val", "train", "final"])
    p.add_argument("--skip-training", action="store_true")
    p.add_argument("--data-root", type=str, default="./data")
    p.add_argument("--structures-dir", type=str, default=None,
                   help="directory of pre-downloaded {protein_id}.pdb files")
    p.add_argument("--n-epochs", type=int, default=2000)
    p.add_argument("--protein-convs", type=int, default=2,
                   help="GVPConvLayer count in the protein tower (BASELINE "
                        "config #3 uses 3 for the deeper Metz variant)")
    p.add_argument("--molecule-convs", type=int, default=2,
                   help="conv count in the molecule tower")
    p.add_argument("--n-workers", type=int, default=None)
    p.add_argument("--n-dp", type=int, default=None,
                   help="data-parallel mesh size: shard batches over this "
                        "many devices (params replicated, gradient "
                        "all-reduce over ICI). Default: single device.")
    p.add_argument("--gp", type=int, default=None,
                   help="graph-partition mesh size: proteins larger than "
                        "the bucket ladder train edge-partitioned over this "
                        "many devices with per-layer halo exchange "
                        "(parallel/partition.py) instead of raising. "
                        "Total devices = n_dp * gp.")
    p.add_argument("--resume", action="store_true",
                   help="resume an interrupted run from the out-folder's "
                        "train_state.msgpack (full params+optimizer+"
                        "scheduler+rng state; bit-identical continuation)")
    p.add_argument("--synthetic-structures", action="store_true",
                   help="generate placeholder helix-backbone PDBs for "
                        "proteins without a structure file (offline/e2e "
                        "testing without the acquisition layer)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host bootstrap: coordinator address "
                        "(host:port) for jax.distributed.initialize. On TPU "
                        "pods all three multi-host flags auto-detect from "
                        "the environment; pass them explicitly elsewhere. "
                        "After initialization jax.devices() spans every "
                        "host, so --n-dp/--gp meshes scale across the pod "
                        "(dp gradient all-reduce rides ICI within a slice "
                        "and DCN across slices).")
    p.add_argument("--n-processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's index")
    args = p.parse_args(argv)

    if args.gp is not None and args.gp > 1:
        # fail fast, before the expensive dataset build: the edge-partitioned
        # protein tower supports only base_conv='lbamodel'
        # (parallel/partition.py PartitionedJointGNN). The CLI default model
        # is lbamodel; a non-lbamodel tower can only arrive via a
        # resume/checkpoint folder's model_kwargs.json — check it here.
        kwargs_src = None
        if args.resume:
            kwargs_src = os.path.join(args.out_folder, "model_kwargs.json")
        elif args.checkpoint is not None:
            d = (args.checkpoint if os.path.isdir(args.checkpoint)
                 else os.path.dirname(args.checkpoint))
            kwargs_src = os.path.join(d, "model_kwargs.json")
        if kwargs_src is not None and os.path.exists(kwargs_src):
            with open(kwargs_src) as f:
                bc = json.load(f)["protein_gnn_kwargs"].get(
                    "base_conv", "lbamodel")
            if bc != "lbamodel":
                raise SystemExit(
                    f"--gp: the partitioned protein tower supports "
                    f"base_conv='lbamodel' only (this run's model_kwargs.json "
                    f"has base_conv={bc!r}). Train without --gp, or switch "
                    f"the protein tower.")

    if (args.coordinator is not None or args.n_processes is not None
            or args.process_id is not None
            or os.environ.get("CASTER_DTA_MULTIHOST")):
        from caster_dta_tpu.parallel.mesh import init_distributed
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.n_processes,
                         process_id=args.process_id)

    # persistent XLA compilation cache: per-bucket executables survive across
    # runs (first Davis run compiles ~10 bucket shapes; reruns start hot)
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "caster_dta_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    os.makedirs(args.out_folder, exist_ok=True)
    print(f"Using dataset: {args.dataset}\nUsing seed: {args.seed}\n"
          f"Output folder: {args.out_folder}", flush=True)

    if args.synthetic_structures:
        if not args.structures_dir:
            raise SystemExit("--synthetic-structures requires --structures-dir")
        # load without the missing-structure drop, then synthesize backbones
        data_df = load_dataset(args.dataset, data_root=args.data_root,
                               structures_dir=None)
        data_df = generate_missing_structures(data_df, args.structures_dir)
    else:
        data_df = load_dataset(args.dataset, data_root=args.data_root,
                               structures_dir=args.structures_dir)
    dataset_kwargs = dict(DEFAULT_DATASET_KWARGS)
    cache_dir = args.structures_dir or os.path.join(args.data_root, "cache")
    dataset = build_or_load_dataset(data_df, cache_dir, dataset_kwargs,
                                    n_workers=args.n_workers)
    print(dataset, flush=True)

    saved_kwargs_path = os.path.join(args.out_folder, "model_kwargs.json")
    initial_params = None
    if args.resume and os.path.exists(saved_kwargs_path):
        # resume rebuilds the model from the run's own saved kwargs, not the
        # CLI flags: resuming a --protein-convs 3 run without re-passing the
        # flag must not silently reconfigure (or clobber) the run
        with open(saved_kwargs_path) as f:
            saved = json.load(f)
        pk, mk, jk = (saved["protein_gnn_kwargs"],
                      saved["molecule_gnn_kwargs"], saved["joint_gnn_kwargs"])
    elif args.checkpoint is not None and not args.skip_training:
        # the reference's --checkpoint workflow (train_model.py:23-32,
        # 520-525 + inference_utils.py:40-70): rebuild the model from the
        # CHECKPOINT's kwargs and fine-tune from its params. Works for both
        # this framework's run folders and reference .pt folders (the
        # transplant path in interop/torch_import.py). num_ntypes etc. come
        # from the checkpoint, so its one-hot widths are preserved even when
        # the new dataset's vocabulary differs.
        from caster_dta_tpu.inference.checkpoint import load_model_from_checkpoint
        if os.path.isdir(args.checkpoint):
            ckpt_dir, param_file = args.checkpoint, None
        else:
            # a FILE path pins that exact checkpoint (the reference
            # torch.loads the path it is given); only the folder's
            # model_kwargs.json is read alongside it
            ckpt_dir, param_file = os.path.dirname(args.checkpoint), args.checkpoint
        _, variables, ck = load_model_from_checkpoint(ckpt_dir, args.use_best,
                                                      param_file=param_file)
        initial_params = variables["params"]
        pk, mk, jk = (ck["protein_gnn_kwargs"], ck["molecule_gnn_kwargs"],
                      ck["joint_gnn_kwargs"])
        checkpoints.save_run_artifacts(
            args.out_folder, dataset_kwargs, dataset._report_scale_data(),
            pk, mk, jk)
    else:
        pk, mk, jk = default_model_kwargs(dataset.metadata_dict)
        pk["num_convs"] = args.protein_convs
        mk["num_convs"] = args.molecule_convs
        checkpoints.save_run_artifacts(
            args.out_folder, dataset_kwargs, dataset._report_scale_data(),
            pk, mk, jk)
    model = make_joint_gnn(pk, mk, **jk)

    max_num, max_bsize = dataset_budgets(args.dataset)
    # bf16 matmuls = the reference's AMP-on default (train_model.py:478)
    cfg = TrainConfig(n_epochs=args.n_epochs, seed=args.seed,
                      resume=args.resume, compute_dtype="bfloat16",
                      n_dp=args.n_dp, gp=args.gp)

    if args.skip_training:
        from caster_dta_tpu.inference.checkpoint import load_model_from_checkpoint
        from caster_dta_tpu.train.loop import Trainer, split_dataset
        from caster_dta_tpu.data.batching import BucketedLoader
        from caster_dta_tpu.train import metrics as metrics_mod
        model, variables, _ = load_model_from_checkpoint(
            args.checkpoint or args.out_folder, args.use_best)
        _, _, test_idx = split_dataset(dataset, args.seed)
        test_dl = BucketedLoader(dataset, test_idx, max_num=max_num,
                                 max_batch_size=max_bsize, shuffle=False)
        example = next(iter(test_dl))
        trainer = Trainer(model, cfg, example)
        trainer.set_params(variables["params"])
        _, pred, target, _ = trainer.eval_epoch(test_dl,
                                                unscale=dataset.unscale_target)
        report = metrics_mod.regression_report(pred, target)
        print(json.dumps(report, indent=2), flush=True)
        return report

    result = fit(model, dataset, args.dataset, args.out_folder, cfg,
                 max_num=max_num, max_batch_size=max_bsize,
                 initial_params=initial_params)
    print("Test metrics:", json.dumps(result["test_metrics"], indent=2), flush=True)
    return result


if __name__ == "__main__":
    main()
