import sys

from gpsat_tpu.cli import main

sys.exit(main())
