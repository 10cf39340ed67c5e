"""Bundle adjustment (absent from the reference — SURVEY.md §2.2).

Schur-complement Levenberg-Marquardt, built TPU-first:

* residuals/Jacobians are one vmapped per-observation linearization (no
  sparse matrices — the observation list IS the sparsity structure);
* camera/landmark Hessian blocks come from `segment_sum` over observations;
* the reduced camera system is never materialized: PCG runs on a
  *matrix-free* Schur matvec (two observation sweeps + a batched 3x3
  landmark-block inverse), which is exactly the form that shards over a
  device mesh — observations are split across devices and each segment
  reduction gains one `psum` (see `sift_tpu.dist`).
"""

from sift_tpu.ba.residuals import reprojection_residuals, linearize
from sift_tpu.ba.schur import SchurSystem, build_system, schur_matvec, pcg
from sift_tpu.ba.solver import BAState, run_ba

__all__ = [
    "reprojection_residuals",
    "linearize",
    "SchurSystem",
    "build_system",
    "schur_matvec",
    "pcg",
    "BAState",
    "run_ba",
]
