"""Training checkpoint / resume.

The reference rasterizer is stateless (SURVEY.md §5.4) — checkpointing
belongs to the trainer. This provides it: the full TrainState (model,
optimizer state, step) plus densification stats round-trips through Orbax
(the TPU-native checkpointer: async-safe, sharding-aware for multi-host
runs), with a plain-npz fallback for environments without it.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(directory: str, state, step: Optional[int] = None):
    """Save a pytree checkpoint. Returns the checkpoint path."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        path = os.path.join(directory, f"ckpt_{step if step is not None else 0}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        path = os.path.join(directory, f"ckpt_{step or 0}.npz")
        leaves, treedef = jax.tree.flatten(state)
        np.savez(path, *[np.asarray(x) for x in leaves])
        with open(path + ".tree", "w") as f:
            f.write(str(treedef))
        return path


def load_checkpoint(path: str, target: Any):
    """Load into the structure of ``target`` (a template pytree)."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves = [data[k] for k in data.files]
        treedef = jax.tree.structure(target)
        return jax.tree.unflatten(
            treedef, [jax.numpy.asarray(x) for x in leaves]
        )
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)
