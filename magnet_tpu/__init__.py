"""magnet_tpu — a TPU-native framework for mesh-agnostic neural PDE solvers.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of jaggbow/magnet
(MAgNet: Mesh-Agnostic Neural PDE Solver, NeurIPS 2022): graph
message-passing PDE surrogates with INR super-resolution decoders, FNO and
MPNN baselines, autoregressive time-bundled rollout, and multi-chip scaling
via jax.sharding meshes.
"""

__version__ = "0.1.0"
