"""Atom→frame reductions and per-type energy scale/shift.

Roles of nequip's ``AtomwiseReduce`` and ``PerTypeScaleShift`` as consumed by
the reference builder (``allegro/model/allegro_models.py:251-260,290-297``):
the per-atom energies get a per-type affine (scales from e.g. forces_rms,
shifts from isolated-atom/mean energies, optionally trainable), then are
summed per frame into the total energy.

Padded atoms would contribute ``shift[type 0]`` after the affine, so the
affine output is multiplied by ``NODE_MASK`` — keeping total energies exact
under padding.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data import keys


class PerTypeScaleShift(nn.Module):
    num_types: int
    scales: Optional[Union[float, Sequence[float]]] = None
    shifts: Optional[Union[float, Sequence[float]]] = None
    scales_trainable: bool = False
    shifts_trainable: bool = False
    field: str = keys.PER_ATOM_ENERGY
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        x = data[self.field]

        def _vec(v):
            arr = np.asarray(v, dtype=np.float64) * np.ones(self.num_types)
            return arr

        scales = shifts = None
        if self.scales is not None:
            init = _vec(self.scales)
            if self.scales_trainable:
                scales = self.param(
                    "scales", lambda k: jnp.asarray(init, dtype=self.param_dtype)
                )
            else:
                scales = jnp.asarray(init, dtype=self.param_dtype)
        if self.shifts is not None:
            init = _vec(self.shifts)
            if self.shifts_trainable:
                shifts = self.param(
                    "shifts", lambda k: jnp.asarray(init, dtype=self.param_dtype)
                )
            else:
                shifts = jnp.asarray(init, dtype=self.param_dtype)
        types = data[keys.ATOM_TYPES]
        if scales is not None:
            x = x * jnp.take(scales.astype(x.dtype), types)[:, None]
        if shifts is not None:
            x = x + jnp.take(shifts.astype(x.dtype), types)[:, None]
        if keys.NODE_MASK in data:
            x = x * data[keys.NODE_MASK].astype(x.dtype)[:, None]
        out = dict(data)
        out[self.field] = x
        return out


class AtomwiseReduce:
    """Stateless per-frame sum of a per-atom field (masked by NODE_MASK)."""

    def __init__(self, field: str = keys.PER_ATOM_ENERGY, out_field: str = keys.TOTAL_ENERGY):
        self.field = field
        self.out_field = out_field

    def __call__(self, data: Dict) -> Dict:
        x = data[self.field]
        if keys.NODE_MASK in data:
            x = x * data[keys.NODE_MASK].astype(x.dtype)[:, None]
        out = dict(data)
        if keys.BATCH in data:
            n_frames = data[keys.CELL].shape[0] if keys.CELL in data else int(data[keys.NUM_NODES].shape[0])
            out[self.out_field] = jax.ops.segment_sum(
                x, data[keys.BATCH], num_segments=n_frames
            )
        else:
            out[self.out_field] = jnp.sum(x, axis=0, keepdims=True)
        return out
