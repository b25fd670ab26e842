"""TPU-native equivariant visual-inertial odometry (EqVIO capabilities, JAX/Pallas design).

A from-scratch re-design of the reference EqVIO pipeline (pvangoor/eqvio) for
TPU hardware: fixed-capacity masked landmark state, jitted pure-function filter
steps, batched Lie-group math, Pallas feature-tracking kernels and sharded
multi-sequence execution over a device mesh.
"""

__version__ = "0.1.0"
