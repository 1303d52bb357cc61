"""GraphEcho-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for unsupervised
domain adaptation of echocardiogram video segmentation.

Re-designed from scratch with the capabilities of xmed-lab/GraphEcho (ICCV 2023,
arXiv:2309.11145) — FPN segmenter, graph-matching UDA head, per-level adversarial
discriminators, temporal graph module on ViG kNN kernels — built TPU-first:
NHWC layouts, static shapes with validity masks, lax.scan recurrences, Pallas
kernels for the memory-bound pairwise ops, and jax.sharding data parallelism.
"""

__version__ = "0.1.0"

from graphecho_tpu import config as config  # noqa: F401
