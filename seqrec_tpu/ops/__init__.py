"""Compute ops (L1): Pallas TPU kernels + pure-XLA fallbacks.

Every hot op has two implementations (SURVEY.md §2.1):
- `seqrec_tpu.ops.xla`: pure jax/XLA — the correctness oracle, used on CPU
  and whenever ``use_pallas=False``;
- `seqrec_tpu.ops.pallas.*`: fused Pallas (Mosaic) TPU kernels.

`dispatch` picks per-op at call time. The TF-C++ kernels the reference leaned
on (GatherV2, GRUBlockCell, sampled_softmax_loss; SURVEY.md §2.1) map to:
embedding_gather, gru_scan, causal_attention, softmax heads here.
"""

from seqrec_tpu.ops.dispatch import (  # noqa: F401
    causal_attention,
    embedding_gather,
    gru_scan,
    lstm_scan,
    pallas_supported,
    sampled_softmax_loss,
)
