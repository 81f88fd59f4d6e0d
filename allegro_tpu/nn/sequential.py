"""Ordered composition of graph modules over a data dict.

Role of nequip's ``SequentialGraphNetwork``
(``allegro/model/allegro_models.py:300``): modules are applied in order, each
reading/writing well-known fields of the data dict. Entries may be flax
modules (learned) or plain callables (stateless transforms); the parameter
pytree is keyed by the given stable names, so checkpoints survive
backend/kernel swaps (SURVEY.md §5 checkpoint note).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn


class SequentialGraphNet(nn.Module):
    layers: Sequence[Tuple[str, Any]]

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        for name, layer in self.layers:
            if isinstance(layer, nn.Module):
                # adopted as a named child: stable param-tree key
                data = _Named(inner=layer, name=name)(data)
            else:
                data = layer(data)
        return data


class _Named(nn.Module):
    """Transparent wrapper giving an adopted child module a stable name."""

    inner: nn.Module

    @nn.compact
    def __call__(self, data):
        return self.inner(data)
