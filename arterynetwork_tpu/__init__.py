"""arterynetwork_tpu — a TPU-native cerebrovascular simulation engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``zjx1805/ArteryNetwork``: MRA volume in -> segmented vessel volume ->
centerline/radius arterial graph -> morphological statistics -> steady-state
blood-flow solutions (node pressures, branch flows), including longitudinal
tumor-progression experiments.

Subpackages
-----------
graphs    struct-of-arrays vessel graphs, synthetic generators, traversal
flow      Hazen-Williams / Poiseuille network solvers (Newton + Laplacian CG)
ops       voxel kernels: region growing, EDT, connected components, thinning
morpho    morphology metrics (bifurcation geometry, Murray's law, curvature)
parallel  device-mesh sharding and halo exchange for volumetric kernels
io        nifti + artifact persistence (pure numpy, no external deps)
"""

import jax as _jax

# The solver path needs f64 for the 1e-6 pressure/flow parity target; voxel
# kernels opt into f32/bf16 explicitly at their call sites.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
