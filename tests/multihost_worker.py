"""Worker script for the multi-process (multi-host analogue) dp parity test.

Run as: python tests/multihost_worker.py <process_id> <n_processes> <port> <out>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the spawning test);
``jax.distributed.initialize`` joins them into one 8-device global mesh —
exactly the SURVEY §4 prescription for testing the multi-host path without a
pod. The worker executes ONE data-parallel train step of the real Trainer
over the global mesh and process 0 writes the loss + updated params; the
test compares them against a single-process run.

The model/batch builders live here (imported by the test for the reference
computation) so both sides are guaranteed to build identical inputs.
"""
import os
import sys


def build_case():
    """Deterministic (model, config, batch): must not touch jax devices."""
    import numpy as np

    from caster_dta_tpu.data.batching import PairBatch
    from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
    from caster_dta_tpu.models.joint import make_joint_gnn
    from caster_dta_tpu.train.loop import TrainConfig

    rng = np.random.default_rng(11)
    prots, mols = [], []
    b = 8
    for _ in range(b):
        nr, er = 24, 120
        src = np.clip(np.repeat(np.arange(nr), 5)
                      + rng.integers(-4, 5, er), 0, nr - 1)
        dst = np.repeat(np.arange(nr), 5)
        prots.append(pad_graph(
            node_s=rng.normal(size=(nr, 17)).astype(np.float32),
            node_v=rng.normal(size=(nr, 3, 3)).astype(np.float32),
            edge_index=np.stack([src, dst]),
            edge_s=rng.normal(size=(er, 32)).astype(np.float32),
            edge_v=rng.normal(size=(er, 1, 3)).astype(np.float32),
            node_type=rng.integers(0, 20, nr), edge_type=np.zeros(er),
            n_pad=32, e_pad=160))
        nm, em = 10, 30
        mols.append(pad_graph(
            node_s=rng.normal(size=(nm, 41)).astype(np.float32), node_v=None,
            edge_index=rng.integers(0, nm, size=(2, em)),
            edge_s=rng.normal(size=(em, 9)).astype(np.float32), edge_v=None,
            node_type=rng.integers(0, 11, nm),
            edge_type=rng.integers(0, 5, em), n_pad=16, e_pad=48))
    batch = PairBatch(protein=stack_graphs(prots), molecule=stack_graphs(mols),
                      target=rng.normal(size=b).astype(np.float32),
                      weight=np.ones(b, np.float32),
                      pair_idx=np.arange(b, dtype=np.int32))

    model = make_joint_gnn(
        dict(base_conv="lbamodel", in_channels=(17, 3), edge_dim=(32, 1),
             num_ntypes=20, num_etypes=1, ntype_emb_dim=None,
             etype_emb_dim=None, num_convs=1, hidden_channels=(8, 2),
             edge_hidden_channels=(8, 1), out_channels=16, dropout_rate=0.0,
             activation="relu", aggr="sum"),
        dict(base_conv="gine", in_channels=41, edge_dim=9, num_ntypes=11,
             num_etypes=5, ntype_emb_dim=None, etype_emb_dim=None,
             num_convs=1, hidden_channels=8, out_channels=16,
             dropout_rate=0.0, activation="relu", aggr="sum"),
        residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=2,
        attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
        pairwise_embedding_dim=32, out_lin_depth=1, dropout=0.0,
        num_cross_attn_layers=1)
    cfg = TrainConfig(seed=3, scheduler=None, save_state_every=0)
    return model, cfg, batch


def run_step(mesh=None):
    """One train step; with a mesh, batch shards over dp and params
    replicate (the multi-host data-parallel path)."""
    import jax
    import numpy as np

    from caster_dta_tpu.train.loop import Trainer

    model, cfg, batch = build_case()
    trainer = Trainer(model, cfg, batch)
    params = jax.tree_util.tree_map(np.asarray, trainer.params)
    opt_state = jax.tree_util.tree_map(np.asarray, trainer.opt_state)
    rng = np.asarray(jax.random.PRNGKey(7))
    if mesh is not None:
        from caster_dta_tpu.parallel import mesh as pmesh
        params = pmesh.replicate_params(params, mesh)
        opt_state = pmesh.replicate_params(opt_state, mesh)
        rng = pmesh.replicate_params(rng, mesh)
        batch = pmesh.shard_pair_batch(batch, mesh)
    params, opt_state, loss, _, _ = trainer._train_step(
        params, opt_state, batch, rng, np.float32(cfg.lr))
    return float(loss), jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), params)


def main():
    process_id, n_processes, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                                          sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_processes,
                               process_id=process_id)
    assert jax.process_count() == n_processes
    n_global = len(jax.devices())
    assert n_global == n_processes * jax.local_device_count()

    from caster_dta_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(n_global)
    loss, params = run_step(mesh)
    if process_id == 0:
        from flax import serialization

        with open(os.path.join(out, "loss.txt"), "w") as f:
            f.write(repr(loss))
        with open(os.path.join(out, "params.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(
                serialization.to_state_dict(params)))
    # all processes must exit cleanly together
    jax.effects_barrier()


if __name__ == "__main__":
    main()
