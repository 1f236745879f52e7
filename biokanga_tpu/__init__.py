"""biokanga_tpu — a TPU-native NGS sequence-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
BioKanga NGS toolkit (csiro-crop-informatics/biokanga): genome indexing,
seed-and-extend short-read alignment with Hamming-distance acceptance,
local alignment (blitz), read simulation, QC, filtering, marker discovery,
SNP calling, and long-read error correction — engineered for TPU hardware
(MXU/VPU compute, HBM-bandwidth-bound kernels, `jax.sharding` meshes over
ICI/DCN instead of pthreads/TCP).

This is NOT a port: the reference is studied for *what* it computes
(see SURVEY.md); the implementation here is an independent TPU-first design.
"""

__version__ = "0.1.0"

# Version string reported by the CLI; the reference reports "4.4.2"
# (biokanga/biokanga.cpp:38-45). We keep our own line.
FRAMEWORK_NAME = "biokanga-tpu"
