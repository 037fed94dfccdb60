from scene_generation_tpu.models.model import SceneModel, ModelOutput
from scene_generation_tpu.models.graph import GraphTripleConv, GraphTripleConvNet
from scene_generation_tpu.models.generators import (
    MaskNet, AppearanceEncoder, GlobalGenerator)
from scene_generation_tpu.models.discriminators import (
    AcCropDiscriminator, MultiscaleDiscriminator, MultiscaleMaskDiscriminator)

__all__ = [
    "SceneModel", "ModelOutput",
    "GraphTripleConv", "GraphTripleConvNet",
    "MaskNet", "AppearanceEncoder", "GlobalGenerator",
    "AcCropDiscriminator", "MultiscaleDiscriminator",
    "MultiscaleMaskDiscriminator",
]
