"""of_dis_tpu — TPU-native Dense Inverse Search optical flow / depth framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lordnn/OF_DIS
(DIS optical flow, Kroeger et al. ECCV 2016 + DeepFlow variational refinement
+ depth-from-stereo), designed TPU-first: patches are a batch dimension, the
grid scatter is a deterministic segment-sum, the SOR solver is a red-black
relaxation, and frame pairs batch/shard across a device mesh.
"""

from of_dis_tpu.params import (
    DISParams,
    LevelSpec,
    auto_first_scale,
    make_level_spec,
    op_point_params,
)

__version__ = "0.1.0"

__all__ = [
    "DISParams",
    "LevelSpec",
    "auto_first_scale",
    "make_level_spec",
    "op_point_params",
]
