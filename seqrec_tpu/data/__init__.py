from seqrec_tpu.data.dataset import SequenceDataset, load_dataset  # noqa: F401
from seqrec_tpu.data.batching import (  # noqa: F401
    BucketBatcher,
    make_eval_batches,
    make_train_batches,
)
