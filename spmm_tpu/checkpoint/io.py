"""Native checkpoint IO (Orbax) + unified load entry.

Replaces the reference's PyTorch-Lightning .ckpt files (reference
SPMM_pretrain.py:29-34) with Orbax checkpoints for the JAX state; the
converter in spmm_tpu.checkpoint.convert ingests reference .ckpt files for
migration.  ``load_params`` dispatches on file type so every CLI accepts
either format.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

Params = dict[str, Any]


def save_checkpoint(path: str, state: Params) -> None:
    """Save a pytree state with Orbax (atomic, async-capable)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


class AsyncSaver:
    """Non-blocking checkpoint writes for training loops.

    ``save()`` returns once the state is snapshotted to host; array
    serialization and disk IO run on Orbax's background thread, overlapping
    the next training steps.  Orbax serializes overlapping saves itself (a
    second ``save`` waits for the in-flight one).  Call ``close()`` — or
    use as a context manager — to barrier before process exit, otherwise
    the last checkpoint may be incomplete.

    The reference has nothing comparable: PL ``ModelCheckpoint`` blocks the
    step loop for the full torch.save (reference SPMM_pretrain.py:29-34).
    Output format is identical to ``save_checkpoint`` (same
    StandardCheckpointHandler), so ``restore_checkpoint`` reads both.
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state: Params) -> None:
        self._ckptr.save(os.path.abspath(path),
                         args=self._ocp.args.StandardSave(state), force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()

    def __enter__(self) -> "AsyncSaver":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def restore_checkpoint(path: str, template: Optional[Params] = None) -> Params:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def is_torch_checkpoint(path: str) -> bool:
    return path.endswith((".ckpt", ".pth", ".pt", ".bin"))


def load_spmm_params(path: str, **convert_kwargs) -> Params:
    """Load SPMM params from an Orbax dir or a reference torch checkpoint."""
    from spmm_tpu.models.spmm import convert_spmm_checkpoint

    if is_torch_checkpoint(path):
        from spmm_tpu.checkpoint.convert import load_torch_state_dict

        state = load_torch_state_dict(path)
        params = convert_spmm_checkpoint(state, **convert_kwargs)
        return jax.tree.map(jax.numpy.asarray, params)
    return restore_checkpoint(path)
