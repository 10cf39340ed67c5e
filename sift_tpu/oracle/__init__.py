"""NumPy reference-simulation oracle (refsim).

A small, slow, loop-based NumPy model of the C++ reference's observable
behaviour (snowiow/SIFT), written from the behavioural spec in SURVEY.md §2.
It exists purely to validate the JAX parity pipeline and to generate golden
outputs; it shares no code with either the C++ or the JAX implementation.
"""

from sift_tpu.oracle.refsim import refsim_extract

__all__ = ["refsim_extract"]
