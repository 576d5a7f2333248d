"""mvsdf-tpu: a TPU-native (JAX/XLA/Pallas) framework for neural implicit
surface reconstruction from multi-view stereo, with the capabilities of
MVSDF (ICCV 2021).

Subpackages
-----------
geometry     cameras, rays, projections (pure jnp, vmap-able)
fields       positional encoding, weight-norm MLPs, SDF + radiance fields
tracing      fixed-shape masked sphere tracing / sampling / secant refinement
rendering    differentiable renderer with implicit-function differentiation
supervision  losses: RGB, eikonal, MVS-depth carving, feature consistency
data         scene I/O (PFM/cam/pair/npz), frozen MVS feature extractor
parallel     device mesh + sharded train step (rays sharded, params replicated)
train        training loop, optimizer, checkpointing, CLI
eval         marching cubes mesh extraction, PSNR, chamfer helpers
meshcut      C++ max-flow mesh trimming post-processor
"""

__version__ = "0.1.0"
