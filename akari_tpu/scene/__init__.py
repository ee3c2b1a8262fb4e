from .arrays import SceneArrays, Camera, make_camera
from .nodes import (
    ConstantTexture,
    ImageTexture,
    DiffuseMaterial,
    GlossyMaterial,
    EmissiveMaterial,
    MirrorMaterial,
    MixMaterial,
    Mesh,
    Instance,
    Scene,
)
