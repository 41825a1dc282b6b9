"""st3d — TPU-native 2D→3D style transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
project ``EmaMule/2D-to-3D-Style-Transfer`` (and of the PyTorch3D / torchvision
machinery it depends on): differentiable mesh rasterization, UV texture
sampling, VGG-19 perceptual losses, mesh regularizers, camera rigs, OBJ I/O,
and the two optimization pipelines ("first approach": 2D style transfer on
rendered views followed by masked-MSE texture optimization; "second approach":
direct perceptual-loss optimization through the renderer).

Everything on the compute path is pure JAX (jit / vmap / grad friendly); the
discrete visibility step of rasterization runs as a Pallas TPU kernel; the
remaining differentiable math (barycentrics, UV interpolation, texture
gather) is XLA, so gradients w.r.t. textures and vertices come from ordinary
autodiff without custom VJPs on the hot path.
"""

__version__ = "0.1.0"

from st3d.core.mesh import Mesh, MeshTopology, build_mesh  # noqa: F401
from st3d.core.cameras import (  # noqa: F401
    FoVPerspectiveCameras,
    look_at_view_transform,
    rotate_axis_angle,
    build_fixed_cameras,
    build_random_cameras,
)
