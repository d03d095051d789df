"""Model layer: components, static spec, jitted posterior, composite model."""
from .joint import JointModel, JointPosteriorFns, build_joint_specs
from .components import (
    ComponentBase,
    Configuration,
    Moffat,
    EdgeDisk,
    ExpDisk,
    DeVaucouleurs,
    Ferrer,
    Gaussian,
    King,
    Nuker,
    PointSource,
    PSFSelector,
    Sersic,
    Sky,
    Tied,
)
from .posterior import IMAGE_TYPES, PosteriorFns, build_posterior
from .spec import CompSpec, ModelSpec, ParamSlot, build_model_spec

__all__ = [
    "ComponentBase",
    "Configuration",
    "Moffat",
    "EdgeDisk",
    "ExpDisk",
    "DeVaucouleurs",
    "Ferrer",
    "Gaussian",
    "King",
    "Nuker",
    "PointSource",
    "PSFSelector",
    "Sersic",
    "Sky",
    "Tied",
    "JointModel",
    "JointPosteriorFns",
    "build_joint_specs",
    "IMAGE_TYPES",
    "PosteriorFns",
    "build_posterior",
    "CompSpec",
    "ModelSpec",
    "ParamSlot",
    "build_model_spec",
]
