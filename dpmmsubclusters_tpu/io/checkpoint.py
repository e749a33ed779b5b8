"""Checkpoint save/load.

TPU-native equivalent of the reference's JLD2 checkpoints
(``src/dp-parallel-sampling.jl:396-401,450-455``; ``src/ds.jl:60-66,85-92``):
like the reference's ``pts_less_group``, checkpoints store labels,
sub-labels, the full cluster table, the PRNG key and the step -- but NOT the
points; resume re-supplies the data.  Format is a single ``.npz`` (flat
pytree paths as keys) plus a JSON-encoded config -- no Julia-style
re-``include`` of a params file is needed to resume.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any

import numpy as np
import jax

from ..config import DPMMConfig

_SEP = "//"


def _flatten(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(jax.device_get(leaf))
    return out, treedef


def save_checkpoint(path: str, *, table, labels, sublabels, key, step: int,
                    shift, cfg: DPMMConfig, family_name: str, n_points: int):
    """Write the sampler state to ``path`` (.npz)."""
    tdict, _ = _flatten(table)
    payload = {f"table{_SEP}{k}": v for k, v in tdict.items()}
    # labels may arrive lane-blocked [N/128, 128] (device state) or flat
    # (host state); the on-disk format is always flat [n_points]
    payload["labels"] = np.asarray(jax.device_get(labels)).reshape(-1)[:n_points]
    payload["sublabels"] = (
        np.asarray(jax.device_get(sublabels)).reshape(-1)[:n_points]
    )
    payload["key"] = np.asarray(jax.device_get(key))
    payload["step"] = np.asarray(step)
    payload["shift"] = np.asarray(shift)
    payload["n_points"] = np.asarray(n_points)
    payload["meta"] = np.frombuffer(
        json.dumps(
            {"config": dataclasses.asdict(cfg), "family": family_name}
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **payload)


def save_checkpoint_distributed(path: str, *, table, labels, sublabels, key,
                                step: int, shift, cfg: DPMMConfig,
                                family_name: str, n_points_global: int,
                                n_local: int):
    """Multi-process checkpoint: EVERY process calls this.

    Process 0 writes the master file ``path`` (replicated table + key +
    step + config; the label fields hold process 0's shard) and every
    process writes ``path.shard<i>.npz`` with its local label rows.  Resume via
    :func:`load_checkpoint_distributed` on the same process grid with the
    same per-process data rows (the reference's checkpoint-resume likewise
    re-distributes labels across the same worker set,
    src/dp-parallel-sampling.jl:428-447).
    """
    import jax

    proc = jax.process_index()
    lab_local = np.concatenate(
        [np.asarray(s.data) for s in labels.addressable_shards]
    ).reshape(-1)[:n_local]
    sub_local = np.concatenate(
        [np.asarray(s.data) for s in sublabels.addressable_shards]
    ).reshape(-1)[:n_local]
    np.savez(
        f"{path}.shard{proc}.npz",
        labels=lab_local,
        sublabels=sub_local,
        n_local=np.asarray(n_local),
        process=np.asarray(proc),
        num_processes=np.asarray(jax.process_count()),
        step=np.asarray(step),
    )
    if proc == 0:
        save_checkpoint(
            path, table=table, labels=lab_local, sublabels=sub_local,
            key=key, step=step, shift=shift, cfg=cfg,
            family_name=family_name, n_points=n_points_global,
        )


def load_checkpoint_distributed(path: str):
    """Returns (master dict as :func:`load_checkpoint`, local shard dict
    with this process's ``labels``/``sublabels``/``n_local``)."""
    import jax

    proc = jax.process_index()
    master = load_checkpoint(path)
    with np.load(f"{path}.shard{proc}.npz") as z:
        if int(z["num_processes"]) != jax.process_count():
            raise ValueError(
                f"checkpoint was written by {int(z['num_processes'])} "
                f"processes, resuming with {jax.process_count()}"
            )
        shard = {
            "labels": z["labels"],
            "sublabels": z["sublabels"],
            "n_local": int(z["n_local"]),
        }
    return master, shard


def load_checkpoint(path: str):
    """Returns a dict with table (nested), labels, sublabels, key, step,
    shift, n_points, config (DPMMConfig), family (str)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        table: dict = {}
        for k in z.files:
            if not k.startswith(f"table{_SEP}"):
                continue
            parts = k.split(_SEP)[1:]
            node = table
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[k]
        out = {
            "table": table,
            "labels": z["labels"],
            "sublabels": z["sublabels"],
            "key": z["key"],
            "step": int(z["step"]),
            "shift": z["shift"],
            "n_points": int(z["n_points"]),
            "config": DPMMConfig(**meta["config"]),
            "family": meta["family"],
        }
    return out
