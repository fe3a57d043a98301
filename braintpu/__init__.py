"""braintpu — a TPU-native framework for automated brain-MRI analysis,
report generation, and retrieval-augmented clinical assistance.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline (Automated-Brain-MRI-Analysis-and-Report-Generation-with-
Retrieval-Augmented-Clinical-Assistance): BraTS nnU-Net ensemble
segmentation, feature extraction, hallucination-guarded report generation,
PDF rendering, RAG assistant, REST serving — engineered TPU-first:

- The sliding-window ensemble inference engine is a single jit-compiled
  program: `lax.scan` over the patch grid, vmapped mirror TTA, fold-stacked
  weights, on-chip Gaussian-weighted accumulation (`braintpu.infer`).
- Preprocessing (crop-to-nonzero, masked z-score) and label/region math are
  pure `jnp` transforms (`braintpu.pre`, `braintpu.labels`, `braintpu.metrics`).
- Multi-case / multi-chip scaling goes through `jax.sharding.Mesh` + XLA
  collectives, not subprocess fan-out (`braintpu.parallel`).
- Zero heavyweight dependencies: NIfTI I/O, PDF rendering, vector store and
  HTTP serving are implemented in-repo (`braintpu.io`, `braintpu.report`,
  `braintpu.rag`, `braintpu.serve`).
"""

__version__ = "0.1.0"
