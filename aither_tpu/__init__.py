"""aither_tpu: a TPU-native multi-block structured compressible CFD framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
noisystreet/aither (C++/MPI): cell-centered finite-volume solution of the
compressible RANS equations on multi-block structured Plot3D grids, with
explicit and implicit time integration, geometric multigrid, finite-rate
chemistry and two-equation turbulence models.
"""

__version__ = "0.1.0"
