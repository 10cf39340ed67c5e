"""Pallas TPU kernels for stages where the XLA formulation leaves
performance on the table.

Current contents:
  windows.py — fused per-keypoint gradient-window gather (the frontend's
               hottest stage): one kernel with double-buffered HBM->VMEM
               row DMAs and an MXU one-hot shift-matmul for the unaligned
               column selection, replacing ~K vmapped `dynamic_slice`
               dispatches. See the module docstring for why this design
               sidesteps the 128-lane alignment wall that sank the naive
               Pallas attempt (BENCH.md "negative results").
  match.py   — streaming masked top-2 nearest-descriptor kernel for
               large-N matching: each transposed MXU distance tile is
               reduced to per-row (best, second, argbest) partials
               before leaving VMEM, so the (Na, Nb) score matrix never
               touches HBM (2.4-2.75x vs XLA at 16k x 16k, and the
               enabling path for beyond-HBM set sizes).

Selection policy: the frontend uses these kernels on TPU backends and the
XLA formulation elsewhere (`SiftConfig.pallas`: "auto" | "on" | "off";
`MatchConfig.impl`: "auto" | "xla" | "pallas"); tests exercise the
kernels on CPU via the Pallas interpreter.
"""

from sift_tpu.kernels.pallas.match import streaming_top2
from sift_tpu.kernels.pallas.windows import gather_windows_pallas

__all__ = ["gather_windows_pallas", "streaming_top2"]
