"""tpt — a TPU-native path-tracing framework (JAX/XLA/Pallas).

Re-designed TPU-first from the capability set of the reference CUDA
renderer (s64zxu/CUDA-Path-Tracer): megakernel and wavefront integrators,
LBVH build+traversal, PBR/diffuse/dielectric materials with MIS+NEE,
texture atlas, HDR environment sampling, SVGF denoising.
"""

__version__ = "0.1.0"

from .config import DisplayMode, RayCastBackend, RenderConfig, RenderMode  # noqa: F401
