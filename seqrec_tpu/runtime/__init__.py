from seqrec_tpu.runtime.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    local_device_count,
    process_count,
    process_index,
)
from seqrec_tpu.runtime.compile_cache import (  # noqa: F401
    enable_compilation_cache,
)
