"""FutureDet-TPU: a TPU-native (JAX/XLA/Pallas) end-to-end LiDAR detection +
trajectory forecasting framework.

Re-designed from scratch with the capabilities of neeharperi/FutureDet
("Forecasting from LiDAR via Future Object Detection", arXiv:2203.16297):
a CenterPoint-style BEV detector that detects objects at T future timesteps
directly from the aggregated point cloud, links per-timestep detections into
trajectories (many-to-one backcasting), and evaluates with joint
detection+forecasting AP metrics.

Everything on the device side is functional JAX: static shapes, masked
validity instead of ragged tensors, collectives over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
