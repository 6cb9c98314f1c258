"""Typed configuration for the MD-RDM TPU framework.

Replaces the reference's scattered argparse flags (train.py:9-26,
utils.py:17-46), module-level globals (``use_cuda`` RDM_Net.py:8,
``is_cuda`` module.py:13, ``freeze_encoder`` RDM_Net.py:9) and hardcoded
dataset roots (dataloaders/path.py:9-22) with immutable dataclasses that can
be threaded through jit'd code as static configuration.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Decoder output resolution by id (reference RDM_Net.py:29-39):
#   id 1, 6  -> 8x8      id 2, 7  -> 16x16     id 3, 8  -> 32x32
#   id 4, 9  -> 64x64    id 5, 10 -> 128x128
# ids 1-5 are DORN ordinal decoders, 6-10 relative (comparison + ALS).
DECODER_SIZES = {1: 8, 2: 16, 3: 32, 4: 64, 5: 128,
                 6: 8, 7: 16, 8: 32, 9: 64, 10: 128}

# Fine-detail slot sizes (reference computations.py:444-462): slot i holds
# maps of spatial size 2**i, i in [0, 7] i.e. 1x1 ... 128x128.
SLOT_SIZES = tuple(2 ** i for i in range(8))


def _decoder_num_wsm_layers(decoder_id: int) -> int:
    """Number of cascaded WSM layers for a decoder (RDM_Net.py:50-61)."""
    return (decoder_id - 1) % 5


def decomposition_depth(decoder_id: int) -> int:
    """Decomposition recursion depth n for a decoder's output map.

    The live path decomposes d_1 with n=3 (RDM_Net.py:117); the dormant
    relative decoders use n = 3..6 for ids 6..9 (RDM_Net.py:119-122),
    i.e. n = log2(output size).
    """
    return {8: 3, 16: 4, 32: 5, 64: 6, 128: 7}[DECODER_SIZES[decoder_id]]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture configuration for DepthEstimationNet."""

    # Which decoders to instantiate.  The reference live path uses only (1,)
    # (RDM_Net.py:50); the authors state the optimum set is (1, 6, 7, 8, 9)
    # (RDM_Net.py:96-97).
    decoder_ids: Tuple[int, ...] = (1,)
    # Input spatial size (RDM_Net.py:31: 226x226 RGB).
    image_size: int = 226
    # DORN head channels for decoder 1 (RDM_Net.py:147: conv2 -> 180 = 2*90).
    ordinal_channels: int = 180
    # Freeze encoder parameters (RDM_Net.py:9,46-47,65-67).
    freeze_encoder: bool = False
    # Compute dtype for the conv backbone ("bfloat16" or "float32"); the
    # fusion tail always runs float32.  Mirrors AMP O2 (train.py:57-58).
    compute_dtype: str = "float32"
    # Rematerialize dense blocks in the backward pass (jax.checkpoint).
    # Default ON: measured *faster* than saving activations (batch-64 train
    # step 7.6 ms vs 9.6 ms - recompute beats the HBM traffic of the saved
    # concat stacks) in addition to the memory savings.
    remat: bool = True
    # Differentiable DORN decode (sum of probs instead of count(P>0.5)) -
    # the reference's commented alternative (RDM_Net.py:343).  Off by
    # default: the faithful hard count blocks depth-loss gradients into
    # the backbone (only the ordinal loss trains it).
    soft_ordinal_decode: bool = False
    # ALS iteration budget: 30 for the square 8x8 path, 100 for cross-scale
    # (RDM_Net.py:364,378,392; computations.py:38,95).
    als_iters_quadratic: int = 30
    als_iters_rect: int = 100
    # Fused Pallas comparison+quantize kernel on the cross-scale relative
    # paths (kernels/lloyd.py): "auto" = on real TPU only (the interpret
    # fallback is slow on CPU), "on"/"off" force it.
    pallas_lloyd: str = "auto"
    # Fused Pallas dense-layer sandwich (kernels/dense_sandwich.py):
    # conv1x1 -> folded-BN -> relu -> conv3x3 in one VMEM-resident kernel
    # at the encoder's 57/29/15 spatial sizes.  "auto" = on real TPU;
    # "on"/"off" force; "interpret" runs the kernel interpreted (tests).
    fused_dense: str = "auto"
    # Flat-layout S=57 dense block (models/densenet.py DenseBlockFlat):
    # the whole block runs in the Pallas kernel's lead-frame layout, one
    # entry/exit transpose instead of per-layer prep/reshape glue
    # (PERF.md round-4 gap analysis: 6.3 ms/step of glue).  Measured
    # round 5: bf16 train step 67.8 -> 62.5 ms (49.5 -> 53.8% MFU), f32
    # 98.1 -> 81.5 ms.  "auto" = measured flat_routes tables when the
    # fused kernel is on (real TPU); "on"/"interpret" force (table
    # sizes); "on_all" forces every block (bench mode; S=29/15 measured
    # dispatch-bound).
    flat_block: str = "auto"
    # Full-lane matmul formulation of the XLA-routed 3x3 growth convs
    # (kernels/growth_conv.py) at the spatial sizes where it measures
    # faster than lax conv's 48/128-lane lowering.  "auto" = on real TPU;
    # "on"/"off" force; "on_all" forces every size (bench/tests).
    growth_matmul: str = "auto"
    # Fusion-weight initialization (Weights layer, RDM_Net.py:449-456):
    #   "abs_randn"  - |N(0,1)| per candidate, the faithful reference init.
    #   "normalized" - |N(0,1)| rescaled so each slot's weights sum to 1:
    #                  the fused log map starts as a convex combination of
    #                  the candidates instead of an unnormalized sum whose
    #                  scale grows with the candidate count (measured: the
    #                  faithful init opens optimal-set training at
    #                  val_mse ~350, round-4 run_optset_eps_p8).
    #   "primary"    - first candidate 1.0, the rest 0.01: the model starts
    #                  ~equal to its first (DORN) decoder alone and learns
    #                  to blend the relative candidates in.
    # Only "abs_randn" is reference behavior; the others are flag-gated
    # experiments for making the authors' optimal set (1,6,7,8,9) learn.
    fusion_init: str = "abs_randn"
    # Fusion-tail stabilization floor (0.0 = faithful reference semantics).
    # The reference's fine-detail pipeline logs Hadamard ratios that can go
    # <= 0 (ALS fills have no positivity guarantee; bicubic has negative
    # lobes) - training the authors' optimal set (1,6,7,8,9) NaNs within
    # one epoch without this (measured round 3; the reference never trains
    # that set, its find_nans guard is commented out, computations.py:383).
    # Recommended 1e-2 for optimal-set training: pyramid levels floored at
    # eps, ratios clipped to [eps, 1/eps], log inputs floored at eps - on
    # the prediction side only, targets stay faithful.
    fusion_eps: float = 0.0

    def __post_init__(self):
        for d in self.decoder_ids:
            if d not in DECODER_SIZES:
                raise ValueError(f"unknown decoder id {d}")
        if len(set(self.decoder_ids)) != len(self.decoder_ids):
            raise ValueError("duplicate decoder ids")
        if self.fusion_init not in ("abs_randn", "normalized", "primary"):
            raise ValueError(f"unknown fusion_init {self.fusion_init!r}")

    @property
    def dorn_ids(self) -> Tuple[int, ...]:
        return tuple(d for d in self.decoder_ids if d <= 5)

    @property
    def relative_ids(self) -> Tuple[int, ...]:
        return tuple(d for d in self.decoder_ids if d > 5)

    @property
    def has_ordinal(self) -> bool:
        return bool(self.dorn_ids)

    @property
    def vector_sizes(self) -> Tuple[int, ...]:
        """Fusion weight-vector length per slot (Weights ctor RDM_Net.py:63).

        Each decoder contributes one candidate per fine-detail slot its
        decomposition produces.  DORN decoder id k (absolute map, size 2**n)
        yields slots 0..n (D0 + F1..Fn); relative decoder id k yields slots
        1..n (no D0, computations.py:368-392 relative_map=True).
        The live config (1,) gives [1,1,1,1,0,0,0,0] (RDM_Net.py:63).
        """
        sizes = [0] * 8
        for d in self.decoder_ids:
            n = decomposition_depth(d)
            lo = 0 if d <= 5 else 1
            for slot in range(lo, n + 1):
                sizes[slot] += 1
        return tuple(sizes)

    @property
    def active_slots(self) -> Tuple[int, ...]:
        """Slots with at least one candidate, ascending (matrix row order)."""
        return tuple(i for i, s in enumerate(self.vector_sizes) if s > 0)

    def num_wsm_layers(self, decoder_id: int) -> int:
        return _decoder_num_wsm_layers(decoder_id)


@dataclasses.dataclass(frozen=True)
class SIDConfig:
    """Spacing-increasing discretization constants (computations.py:559-631,
    utils.py:120-211).  Note the reference uses K=68 for NYU inside
    computations.py but K=90 in utils.py / depth2label_sid; the training
    path goes through utils.depth2label_sid with K=90 (module.py:126,142)."""

    alpha: float = 0.02
    beta: float = 10.0
    K: float = 90.0

    @staticmethod
    def for_dataset(name: str, training_path: bool = True) -> "SIDConfig":
        table = {
            "kitti": SIDConfig(0.001, 80.0, 71.0),
            "nyu": SIDConfig(0.02, 10.0, 90.0 if training_path else 68.0),
            "floorplan3d": SIDConfig(0.0552, 10.0, 68.0),
            "structured3d": SIDConfig(0.02, 10.0, 68.0),
        }
        key = name.lower()
        if key not in table:
            raise ValueError(f"no dataset named {name}")
        return table[key]


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "nyu"
    # 'sparse_2_dense' h5 backend or 'labeled' mat backend etc.
    # (nyu_dataloader.py:16 DATASET_TYPES).
    dataset_type: str = "sparse_2_dense"
    path: Optional[str] = None
    output_size: Tuple[int, int] = (226, 226)
    resize: int = 250
    batch_size: int = 4          # train.py:23
    eval_batch_size: int = 1     # module.py:24-28 (val batch 1)
    num_workers: int = 6         # train.py:18
    # 'host' = PIL/numpy reference-parity augmentation; 'device' = jax ops.
    augment_backend: str = "host"
    n_images: int = -1
    download: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4   # train.py:22
    weight_decay: float = 0.01    # torch AdamW default (module.py:41)
    min_epochs: int = 1
    max_epochs: int = 1
    seed: Optional[int] = None
    # Per-param-group learning rates: top-level parameter-tree keys listed
    # here train at ``fast_lr_multiplier`` x the base LR - the legacy
    # loop's 1x/10x param-group recipe (main.py:156-162).  The natural
    # target is ("weight_layer",): the O(1) fusion weights need O(1)
    # moves that AdamW at lr=1e-4 cannot deliver in a realistic run
    # (measured round 4: |delta w| <= 0.017 over 400 steps).
    fast_modules: Tuple[str, ...] = ()
    fast_lr_multiplier: float = 10.0
    # ReduceLROnPlateau on max val_delta1, patience 2 (module.py:42-46).
    plateau_patience: int = 2
    plateau_factor: float = 0.1
    monitor: str = "delta1"
    metrics: Tuple[str, ...] = (
        "delta1", "delta2", "delta3", "mse", "mae", "log10", "rmse")
    # Metric evaluation space.  "faithful" (default) scores the log-space
    # recombined map directly against the gm-normalized linear target - the
    # reference's own pairing (module.py:94-97,117), under which ratio
    # metrics like delta1 are pinned ~0 by construction.  "linear"
    # exponentiates the recombined map first (recombination returns log
    # depth - computations.py:394-421), giving meaningful delta/rel
    # metrics; a documented "fixed" mode like soft_ordinal_decode.
    metrics_space: str = "faithful"
    overfit: bool = False
    dev: bool = False
    debug_nans: bool = False      # analogue of --detect_anomaly train.py:20
    log_every: int = 10
    checkpoint_dir: str = "result"
    run_name: str = "rd"
    # result/<run_name>/run_N per-run directories (utils.py:49-59): a fresh
    # run_N is allocated per training run so successive runs never clobber
    # each other's config.json/metrics; resume reuses the resumed run's dir.
    run_dirs: bool = True
    save_top_k: int = 1           # train.py:43
    resume: Optional[str] = None
    # Mesh: data-parallel size (-1 = all local devices).
    data_parallel: int = -1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    sid: SIDConfig = dataclasses.field(default_factory=SIDConfig)
