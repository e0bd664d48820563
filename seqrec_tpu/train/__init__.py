from seqrec_tpu.train.trainer import Trainer  # noqa: F401
from seqrec_tpu.train.state import TrainState, make_optimizer  # noqa: F401
