import sys

from seqrec_tpu.cli import main

sys.exit(main())
