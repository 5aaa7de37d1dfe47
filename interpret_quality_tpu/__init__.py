"""interpret_quality_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
interpreting representation quality of DNNs for 3D point-cloud processing.

Re-designed from scratch for TPU with the same capabilities as the reference
PyTorch pipeline (ada-shen/Interpret_quality, NeurIPS 2021):

  * train 6 point-cloud classifiers (PointNet, PointNet++ MSG, PointConv,
    DGCNN, GCNN, adv-GCNN) on ModelNet10 / 10-class ShapeNet-Part,
  * partition clouds into 32 FPS regions,
  * estimate region Shapley values via masked coalitions,
  * enumerate rigid-body / scale / smoothness perturbations,
  * estimate multi-order pairwise interactions,
  * aggregate sensitivity / correlation / smoothness tables and plots.

Design stance (TPU-first, not a port):
  * All attribution hot loops are expressed as tensor algebra (keep-matrix
    gathers + `where`) batched over a coalition axis and run through a single
    jitted forward — no per-order host syncs.
  * Geometry ops (FPS / kNN / ball-query / density) are pure jittable
    functions whose inner products map onto the MXU.
  * Multi-chip scaling shards the coalition axis over a `jax.sharding.Mesh`
    (the reference's `nn.DataParallel` has no analog here: attribution was
    strictly single-GPU upstream; on TPU the coalition axis is the
    parallelism axis).
"""

__version__ = "0.1.0"
