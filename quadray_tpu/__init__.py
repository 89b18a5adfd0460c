"""quadray_tpu — a TPU-native differentiable Whitted ray tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the QuadRay
engine (reference: zouzias/QuadRay-engine, studied in SURVEY.md): plane +
unified-quadric surfaces, hierarchical transforms, custom clipping / boolean
ops, colored point lights (ambient/diffuse/specular/attenuation), hard
shadows, reflections/refractions with exact Fresnel, textures, 2x/4x
supersampled antialiasing with gamma, and a progressive path tracer — built
TPU-first: rays are batched by the million in VMEM-tiled Pallas blocks
instead of 4-16 per SIMD register, the scene is compiled to static-shaped
SoA device arrays instead of pointer lists, recursion is an iterative
branch-stack loop instead of a context stack, and the whole pipeline is
differentiable end to end.
"""

__version__ = "0.1.0"

from quadray_tpu.engine import Platform, Scene  # noqa: F401
