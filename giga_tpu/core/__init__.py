from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.core.grasp import Grasp, Label, from_voxel_coordinates, to_voxel_coordinates

__all__ = [
    "Rotation",
    "Transform",
    "Grasp",
    "Label",
    "from_voxel_coordinates",
    "to_voxel_coordinates",
]
