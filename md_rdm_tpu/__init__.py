"""md_rdm_tpu: TPU-native monocular relative-depth estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of az16/MD_RDM
("Monocular Depth Estimation Using Relative Depth Maps", Lee & Kim,
CVPR 2019): DenseNet-161-style encoder, WSM/DORN decoder branches, the
relative-depth fusion tail (comparison matrices, Lloyd quantization, ALS
reconstruction, multi-scale decomposition/recombination), multi-dataset
loaders with host- and device-side augmentation, and a mesh-sharded
training loop with checkpointing and plateau LR scheduling.
"""
__version__ = "0.1.0"

from md_rdm_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    SIDConfig,
    TrainConfig,
)
