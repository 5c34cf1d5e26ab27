"""emba_tpu — TPU-native event-based mosaicing bundle adjustment.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference EMBA system (Guo & Gallego, ECCV 2024): photometric bundle
adjustment for a rotating event camera, jointly refining a continuous-time
SO(3) B-spline trajectory and a panoramic gradient map via
Levenberg-Marquardt with a Schur-complement solver, plus Poisson brightness
reconstruction — redesigned for TPU hardware (static shapes, batched dense
array ops, MXU GEMM normal equations, mesh-sharded multi-chip scaling).
"""

__version__ = "0.1.0"
