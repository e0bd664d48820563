from seqrec_tpu.eval.metrics import rank_metrics, ranks_from_scores  # noqa: F401
from seqrec_tpu.eval.harness import evaluate  # noqa: F401
