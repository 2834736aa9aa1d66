"""rnb_neus2_tpu — TPU-native multi-view normal/albedo surface reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
RobinBruneau/RNb-NeuS2: ingest per-view normal maps (+ optional reflectance
maps) with masks and cameras, optimize a NeuS2-style neural SDF (multires hash
grid + small MLPs, volume rendering with SDF→alpha), and extract a
marching-cubes mesh in world coordinates.
"""

__version__ = "0.1.0"
