"""Checkpointing + run artifacts.

Behavioral spec: reference train_model.py:666-708 (filename-convention best
checkpoints) and inference/inference_utils.py:12-67 (prefix-sorted best-model
discovery, rebuild-from-artifacts contract). The four JSON artifacts keep the
reference's exact schemas: dataset_kwargs.json, dataset_rescale_params.json,
model_kwargs.json, plus train_command.txt and a model summary.

Weights are stored as msgpack via flax.serialization with a .msgpack suffix
(the torch ``.pt`` state dicts of the reference can also be loaded through
interop.torch_import).
"""
from __future__ import annotations

import json
import os
import sys
from typing import Optional

import jax
import numpy as np
from flax import serialization


def save_params(params, path: str) -> None:
    # one batched D2H (jax.device_get) instead of per-leaf transfers inside
    # msgpack serialization — leaf-at-a-time round trips are slow on
    # remote-device backends
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(template, path: str):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


TRAIN_STATE_FILE = "train_state.msgpack"


def save_train_state(output_folder: str, *, params, opt_state, rng,
                     epoch: int, best_train: float, best_val: float,
                     n_since_best_val: int, lr: float, history: list,
                     scheduler=None) -> None:
    """Full resumable training state — params AND optimizer moments, RNG,
    scheduler counters, best losses, history. The reference checkpoints only
    the model state dict (train_model.py:672-682: 'optimizer/scheduler state
    is not checkpointed'); this closes that gap so an interrupted run resumes
    bit-identically. Written atomically (tmp + rename) so a mid-write failure
    never corrupts the resume point."""
    state = {
        # to_state_dict: optax/flax states are NamedTuple pytrees, which
        # msgpack cannot encode directly — flatten to nested dicts of arrays
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": serialization.to_state_dict(jax.device_get(opt_state)),
        # typed keys (jax.random.key) serialize via key_data + impl tag;
        # legacy raw uint32 keys pass through as-is
        "rng": np.asarray(jax.device_get(
            jax.random.key_data(rng)
            if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
            else rng)),
        "rng_impl": (str(jax.random.key_impl(rng))
                     if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
                     else ""),
        "meta": {
            "epoch": epoch, "best_train": float(best_train),
            "best_val": float(best_val),
            "n_since_best_val": int(n_since_best_val), "lr": float(lr),
            "history": json.dumps(history),
            "scheduler": json.dumps(
                {k: v for k, v in vars(scheduler).items()
                 if isinstance(v, (int, float, str, bool))}
                if scheduler is not None else None),
        },
    }
    path = os.path.join(output_folder, TRAIN_STATE_FILE)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    os.replace(tmp, path)


def _restore_rng(raw):
    """Rebuild a typed PRNG key from saved key data.

    New states carry an explicit "rng_impl" tag; states written before the
    typed-key change hold a raw key array whose impl is inferred from its
    word count (2 = threefry2x32, the old default; 4 = rbg) — so pre-change
    runs resume with bit-identical threefry streams."""
    data = jax.numpy.asarray(raw["rng"]).astype(jax.numpy.uint32)
    impl = raw.get("rng_impl") or (
        "threefry2x32" if data.shape[-1] == 2 else "rbg")
    # key_impl() prints like "threefry2x32"/"rbg"; normalize defensively
    impl = str(impl).strip("<>").split()[-1] if " " in str(impl) else impl
    return jax.random.wrap_key_data(data, impl=impl)


def load_train_state(output_folder: str, params_template, opt_state_template):
    """Restore state saved by save_train_state; returns None if absent."""
    path = os.path.join(output_folder, TRAIN_STATE_FILE)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    meta = raw["meta"]
    return {
        "params": serialization.from_state_dict(params_template, raw["params"]),
        "opt_state": serialization.from_state_dict(opt_state_template,
                                                   raw["opt_state"]),
        "rng": _restore_rng(raw),
        "epoch": int(meta["epoch"]),
        "best_train": float(meta["best_train"]),
        "best_val": float(meta["best_val"]),
        "n_since_best_val": int(meta["n_since_best_val"]),
        "lr": float(meta["lr"]),
        "history": json.loads(meta["history"]),
        "scheduler": json.loads(meta["scheduler"]),
    }


def best_checkpoint_name(kind: str, dataset_name: str, loss: float, epoch: int) -> str:
    """bestvalmodel_{ds}_val{loss}_epoch{e:05d}.msgpack etc.
    (reference train_model.py:672,681,707)."""
    if kind == "val":
        return f"bestvalmodel_{dataset_name}_val{loss:.4f}_epoch{epoch:>05d}.msgpack"
    if kind == "train":
        return f"besttrainmodel_{dataset_name}_train{loss:.4f}_epoch{epoch:>05d}.msgpack"
    if kind == "final":
        return f"finalmodel_{dataset_name}_val{loss:.4f}_epoch{epoch:>05d}.msgpack"
    raise ValueError(kind)


def get_best_model(checkpoint_path: str, use_best: str = "val") -> str:
    """Prefix-sorted best-model discovery (inference_utils.py:12-37); accepts
    both .msgpack (ours) and .pt (reference) checkpoints."""
    if os.path.isdir(checkpoint_path):
        names = sorted(os.listdir(checkpoint_path))
        prefixes = {"val": ("bestvalmodel", "bestmodel"),
                    "train": ("besttrainmodel",),
                    "final": ("finalmodel",)}[use_best]
        names = [x for x in names if x.startswith(prefixes)
                 and (x.endswith(".msgpack") or x.endswith(".pt"))]
        if not names:
            raise FileNotFoundError(
                f"no {use_best} checkpoint found in {checkpoint_path}")
        return os.path.join(checkpoint_path, names[0])
    if os.path.isfile(checkpoint_path):
        return checkpoint_path
    raise FileNotFoundError(f"invalid checkpoint path {checkpoint_path}")


def save_run_artifacts(output_folder: str, dataset_kwargs: dict,
                       rescale_params: Optional[dict],
                       protein_gnn_kwargs: dict, molecule_gnn_kwargs: dict,
                       joint_gnn_kwargs: dict,
                       model_summary: Optional[str] = None) -> None:
    """The reference's artifact set (train_model.py:58-65,154-164,344-349)."""
    os.makedirs(output_folder, exist_ok=True)
    with open(os.path.join(output_folder, "train_command.txt"), "w") as f:
        f.write(sys.executable + " " + " ".join(sys.argv))
    with open(os.path.join(output_folder, "dataset_kwargs.json"), "w") as f:
        json.dump(dataset_kwargs, f, indent=4)
    if rescale_params is not None:
        with open(os.path.join(output_folder, "dataset_rescale_params.json"), "w") as f:
            json.dump(rescale_params, f, indent=4)
    with open(os.path.join(output_folder, "model_kwargs.json"), "w") as f:
        json.dump({"protein_gnn_kwargs": protein_gnn_kwargs,
                   "molecule_gnn_kwargs": molecule_gnn_kwargs,
                   "joint_gnn_kwargs": joint_gnn_kwargs}, f, indent=4)
    if model_summary is not None:
        with open(os.path.join(output_folder, "model_summary.txt"), "w") as f:
            f.write(model_summary)


def param_summary(params) -> str:
    """Per-path parameter table (stand-in for pyg_summary, train_model.py:372)."""
    lines = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        lines.append(f"{jax.tree_util.keystr(path):80s} {str(leaf.shape):20s} {n:>10d}")
    lines.append(f"{'TOTAL':80s} {'':20s} {total:>10d}")
    return "\n".join(lines)


# ---------------------------------------------------------------- orbax
# For multi-host / sharded training (parallel/mesh.py) the msgpack path
# would gather everything to host 0; orbax writes each shard from its owner
# process and restores with the target sharding. Optional — the artifact
# contract above stays the reference-compatible default.

def save_params_orbax(params, path: str) -> None:
    """Sharded checkpoint write via orbax (directory target)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(template, path: str):
    """Restore with the template's structure/sharding."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)
