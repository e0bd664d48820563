from seqrec_tpu.parallel.embedding import sharded_gather, padded_vocab  # noqa: F401
