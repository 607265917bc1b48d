"""dvmatcher_tpu — TPU-native framework for dense non-rigid point-cloud matching.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of DV-Matcher
("Deformation-based Non-rigid Point Cloud Matching Guided by Pre-trained
Visual Features"): a point-feature backbone producing per-point descriptor
fields, soft-correspondence matching, and embedded-deformation-graph
registration — designed TPU-first (static shapes, batched einsums, fused
kernels, `jax.sharding` data parallelism) rather than as a port.

Subpackages
-----------
ops       core geometry kernels (FPS, kNN, chamfer, pairwise distances, rotations)
models    neural nets (backbone, deformer, frozen 2D feature lifting)
match     soft/hard correspondence search
deform    embedded deformation graphs: build, skinning, ARAP
losses    training objectives
data      OFF IO, geodesic preprocessing, pair datasets
train     train state, loops, checkpointing
parallel  device mesh + sharding helpers
evals     geodesic-error evaluation harness
"""

__version__ = "0.1.0"
