"""Expand a reference OI config into hold-out cross-validation configs
(the reference's examples/create_xval_config.py; logic lives in
gpsat_tpu.xval.XvalConfig — this shim keeps the reference's example
entry point).

Run: python examples/create_xval_config.py <xval_config.json>
     (same config schema as ``python -m gpsat_tpu.cli xval``)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpsat_tpu.xval import main

if __name__ == "__main__":
    main()
