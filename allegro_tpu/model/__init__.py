"""Config-facing model builders (reference parity: ``allegro.model``)."""

from .builders import (
    AllegroEnergyModel,
    AllegroModel,
    FullAllegroEnergyModel,
    FullAllegroModel,
    Model,
    model_builder,
    model_modifier,
    modify,
    MODEL_BUILDERS,
    MODEL_MODIFIERS,
)

__all__ = [
    "AllegroEnergyModel",
    "AllegroModel",
    "FullAllegroEnergyModel",
    "FullAllegroModel",
    "Model",
    "model_builder",
    "model_modifier",
    "modify",
    "MODEL_BUILDERS",
    "MODEL_MODIFIERS",
]
