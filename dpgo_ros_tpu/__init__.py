"""dpgo_ros_tpu — a TPU-native distributed pose-graph-optimization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
mit-acl/dpgo_ros + DPGO stack (see SURVEY.md): rank-relaxed SE(d)
synchronization by Riemannian block-coordinate descent on the Stiefel
manifold, Nesterov acceleration, asynchronous bounded-staleness (ASAPP)
stepping, GNC-TLS robust optimization, and multi-robot coordination — with
pose blocks sharded over a `jax.sharding.Mesh` and separator-pose exchange as
XLA collectives instead of ROS topics.
"""

__version__ = "0.1.0"
