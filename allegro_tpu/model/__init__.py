"""Config-facing model builders (reference parity: ``allegro.model``)."""

from .builders import (
    AllegroEnergyModel,
    AllegroModel,
    FullAllegroEnergyModel,
    FullAllegroModel,
    Model,
    model_builder,
    MODEL_BUILDERS,
)

__all__ = [
    "AllegroEnergyModel",
    "AllegroModel",
    "FullAllegroEnergyModel",
    "FullAllegroModel",
    "Model",
    "model_builder",
    "MODEL_BUILDERS",
]
