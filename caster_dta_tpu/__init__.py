"""caster_dta_tpu — a TPU-native drug-target-affinity GNN framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the CASTER-DTA
reference (stelleg/caster-dta): GVP equivariant protein GNNs, molecule GNNs,
residue-atom cross-attention, the full data pipeline (PDB/SMILES featurization,
bucketed static-shape batching), training/inference/explanation, and
multi-device scaling via jax.sharding meshes.

Layering (mirrors reference SURVEY.md §1, redesigned TPU-first):
  ops/        sparse segment/scatter kernels (XLA reference + Pallas), attention
  nn/         GVP primitives and conv layers (flax.linen)
  models/     protein GNN zoo, molecule GNN zoo, JointGNN + cross-attention
  data/       featurization (PDB parser, chem module), graph containers,
              bucketed batching, dataset registry, pair dataset
  train/      optimizers/schedules (optax), training driver, metrics, artifacts
  parallel/   device meshes, data-parallel sharding, graph edge-partitioning
  inference/  checkpoint reload, batched evaluation, explanation
  interop/    PyTorch reference checkpoint transplant
  analysis/   downstream scientific tasks (BioLIP, variant, binder screen)
"""

__version__ = "0.1.0"
