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

Selection policy: the frontend uses these kernels on TPU backends and the
XLA formulation elsewhere (`SiftConfig.pallas`: "auto" | "on" | "off");
tests exercise the kernels on CPU via the Pallas interpreter.
"""

from sift_tpu.kernels.pallas.windows import gather_windows_pallas

__all__ = ["gather_windows_pallas"]
