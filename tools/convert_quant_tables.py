"""Convert the reference Lloyd-Max depth-ratio quantizer tables to a single npz asset.

The reference (az16/MD_RDM) ships per-resolution MATLAB tables
``depth_ratio_{NNN}_{NNN}_quant.mat`` (loaded at RDM_Net.py:397-418), each with
40 quantization thresholds (``*_quant``) and 41 reconstruction levels
(``*_quant_inv``).  The 8x8 table is absent from the reference mount
(.MISSING_LARGE_BLOBS), but the tables obey an exact structural law that lets
us regenerate it:

    For every entry i:  q_{2N}[i] == sqrt(q_N[i])   (verified to <1e-9 on all
    four shipped tables; same for the inverse tables).

This is a consequence of Lloyd-Max quantization of log-depth-ratios whose
variance halves per resolution doubling: thresholds in log space scale by 1/2,
i.e. sqrt in linear space.  Therefore  q_008 = q_016 ** 2  exactly.

Writes md_rdm_tpu/assets/depth_ratio_quant.npz with keys
``q{8,16,32,64,128}`` (40,) and ``inv{8,16,32,64,128}`` (41,), float64.

Usage: python tools/convert_quant_tables.py [reference_dir]
"""
import sys
from pathlib import Path

import numpy as np
import scipy.io


def main(ref_dir: str = "/root/reference") -> None:
    ref = Path(ref_dir)
    out = {}
    for n in (16, 32, 64, 128):
        name = f"depth_ratio_{n:03d}_{n:03d}_quant"
        mat = scipy.io.loadmat(ref / f"{name}.mat")
        out[f"q{n}"] = mat[name].ravel().astype(np.float64)
        out[f"inv{n}"] = mat[name + "_inv"].ravel().astype(np.float64)

    # Verify the sqrt law that justifies regenerating the 8x8 table.
    for n in (16, 32, 64):
        err = np.max(np.abs(np.sqrt(out[f"q{n}"]) - out[f"q{2 * n}"]))
        err_inv = np.max(np.abs(np.sqrt(out[f"inv{n}"]) - out[f"inv{2 * n}"]))
        print(f"sqrt-law residual {n}->{2*n}: q={err:.3e} inv={err_inv:.3e}")
        assert err < 1e-6 and err_inv < 1e-6, "sqrt law violated; regen invalid"

    out["q8"] = out["q16"] ** 2
    out["inv8"] = out["inv16"] ** 2

    dst = Path(__file__).resolve().parent.parent / "md_rdm_tpu" / "assets" / "depth_ratio_quant.npz"
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez(dst, **out)
    print(f"wrote {dst} with keys {sorted(out)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
