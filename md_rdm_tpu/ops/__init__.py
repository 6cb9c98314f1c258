"""TPU-native fusion-tail numerics (reference network/computations.py)."""
from md_rdm_tpu.ops.als import alternating_least_squares, als_factorize, quadratic_als
from md_rdm_tpu.ops.comparison import comparison_cross_scale, comparison_v1
from md_rdm_tpu.ops.decompose import (
    decompose_depth_map,
    fine_detail_matrices,
    make_pred,
    optimize_components,
    recombination,
    slot_index,
    squared_err,
)
from md_rdm_tpu.ops.eigen import dominant_eigenvalue, principal_eigen
from md_rdm_tpu.ops.geometry import (
    find_nans,
    geometric_mean_flat,
    geometric_resize,
    min_eps,
    normalize_gm,
    quick_gm,
)
from md_rdm_tpu.ops.paging import merge_pages, split_into_tiles, split_matrix
from md_rdm_tpu.ops.quantize import lloyd_quantize, quant_tables
from md_rdm_tpu.ops.resize import (
    multi_upsample,
    resize_bicubic,
    upsample_nearest2,
)
from md_rdm_tpu.ops.sid import depth_to_label, label_to_depth
