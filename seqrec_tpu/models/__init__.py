from seqrec_tpu.models.model import SeqRecModel, build_model  # noqa: F401
from seqrec_tpu.models.towers import GRUTower, RNNTower, SASRecTower  # noqa: F401
