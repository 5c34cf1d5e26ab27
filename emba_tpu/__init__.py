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


def __getattr__(name):
    """Lazy top-level API (keeps `import emba_tpu` fast; jax loads on use)."""
    import importlib

    api = {
        "Trajectory": ("spline", "Trajectory"),
        "PinholeCamera": ("camera", "PinholeCamera"),
        "EquirectangularCamera": ("camera", "EquirectangularCamera"),
        "ModelConfig": ("model", "ModelConfig"),
        "DeviceWindow": ("model", "DeviceWindow"),
        "LMConfig": ("solver", "LMConfig"),
        "solve_window": ("solver", "solve_window"),
        "solve_window_fused": ("solver", "solve_window_fused"),
        "BAConfig": ("config", "BAConfig"),
        "preset": ("config", "preset"),
        "EmbaPipeline": ("pipeline", "EmbaPipeline"),
        "PoseManager": ("poses", "PoseManager"),
        "build_window": ("pairing", "build_window"),
        "reconstruct_from_gradient": ("recon", "reconstruct_from_gradient"),
    }
    if name in api:
        mod, attr = api[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
