"""Pipeline checkpoint / resume.

The reference's only resume mechanism is a start_frame seek that discards
all derived state (SURVEY.md §5.4 — trajectories restart empty). Here the
full pipeline state — frame index, previous-frame device buffer, tracker
table, BA window — serializes to an npz and restores exactly, so a
resumed run is numerically identical to an uninterrupted one
(asserted in tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str, out: dict):
    leaves, treedef = jax.tree.flatten(tree)
    out[f"{prefix}__treedef"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def save_checkpoint(path: str, **states: Any) -> None:
    """Save named pytrees (e.g. tracker=TrackerState, prev_gray=array)."""
    payload: dict = {"__names": np.array(sorted(states.keys()), dtype=object)}
    for name, tree in states.items():
        _flatten(tree, name, payload)
    tmp = path + ".tmp"
    np.savez(tmp, **payload, allow_pickle=True)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str, templates: dict[str, Any]) -> dict[str, Any]:
    """Restore pytrees using same-structure templates (shapes/dtypes from
    the saved leaves; structure from the template)."""
    data = np.load(path, allow_pickle=True)
    out = {}
    for name, template in templates.items():
        leaves, treedef = jax.tree.flatten(template)
        if f"{name}__treedef" not in data and f"{name}__0" not in data:
            # forward compatibility: a template key absent from the saved
            # checkpoint (e.g. 'poses' added in round 5) falls back to
            # the template's own values instead of a KeyError, so old
            # checkpoints stay loadable across upgrades
            out[name] = template
            continue
        saved_def = data.get(f"{name}__treedef")
        if saved_def is not None:
            saved_repr = bytes(saved_def.tobytes()).decode()
            if saved_repr != repr(treedef):
                raise ValueError(
                    f"checkpoint structure mismatch for '{name}': saved "
                    f"{saved_repr[:120]}... vs template {repr(treedef)[:120]}..."
                )
        restored = [
            jnp.asarray(data[f"{name}__{i}"]) for i in range(len(leaves))
        ]
        out[name] = jax.tree.unflatten(treedef, restored)
    return out
