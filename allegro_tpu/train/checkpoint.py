"""Orbax checkpointing.

Role of Lightning's ``ModelCheckpoint(save_last=True)`` + nequip packaging
(``configs/tutorial.yaml:37-39``, SURVEY.md §5): save/restore the full train
state (params, EMA params, optimizer state, step). The parameter pytree layout
is invariant to kernel-backend choice, so checkpoints survive backend swaps
(the reference guarantees this via ``load_state_dict`` across Contracter
subclasses, ``_contract.py:277,305-306``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, state, name: str = "last") -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": _to_numpy(state.params),
        "ema_params": _to_numpy(state.ema_params),
        "opt_state": _to_numpy(state.opt_state),
        "step": np.asarray(state.step),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(ckpt_dir: str, name: str = "last", template: Optional[Any] = None):
    import orbax.checkpoint as ocp

    from .loop import TrainState

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        payload = ckptr.restore(
            path,
            target={
                "params": _to_numpy(template.params),
                "ema_params": _to_numpy(template.ema_params),
                "opt_state": _to_numpy(template.opt_state),
                "step": np.asarray(template.step),
            },
        )
    else:
        payload = ckptr.restore(path)
    return TrainState(
        params=payload["params"],
        ema_params=payload["ema_params"],
        opt_state=payload["opt_state"],
        step=int(payload["step"]),
    )
