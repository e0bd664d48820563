"""seqrec_tpu — a TPU-native sequential recommendation framework.

A brand-new JAX/XLA/Pallas/pjit framework covering the role of the reference
repo `efikarra/seq-recommendations` (see SURVEY.md; reference mount was empty,
capabilities reconstructed from driver metadata at BASELINE.json):

- item/user embedding tables, optionally row-sharded across a device mesh with
  collective ID/activation exchange (`seqrec_tpu.parallel`),
- GRU4Rec-style recurrent and SASRec-style causal-self-attention sequence
  towers (`seqrec_tpu.models`) built on fused Pallas TPU kernels with XLA
  fallbacks (`seqrec_tpu.ops`),
- full-softmax / sampled-softmax / BPR training objectives with masked losses
  over variable-length, bucket-padded session batches (`seqrec_tpu.data`),
- a pjit/jit training engine with bucketed compilation, orbax checkpointing
  and profiling hooks (`seqrec_tpu.train`),
- full-catalog and sampled-negative ranking evaluation: recall@k, MRR@k,
  NDCG@k (`seqrec_tpu.eval`).
"""

__version__ = "0.1.0"

from seqrec_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    RunConfig,
    TrainConfig,
)
