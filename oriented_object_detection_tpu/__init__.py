"""oriented_object_detection_tpu — TPU-native oriented-object-detection
framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of
Abolfazlmsl/Oriented-Object-Detection (YOLOv11-OBB geological map symbol
detection) designed TPU-first: batched tiled inference under a single jitted
forward, fixed-shape rotated NMS, Pallas image kernels, and pjit/shard_map
data parallelism over device meshes.
"""

__version__ = "0.1.0"
