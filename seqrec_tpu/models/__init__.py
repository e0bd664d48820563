from seqrec_tpu.models.model import SeqRecModel, build_model  # noqa: F401
