#!/usr/bin/env python
"""Stage 2 CLI — train/evaluate DFNet (feature extractor + pose regressor).

Drop-in surface for the reference's `python run_feature.py --config
config_dfnet.txt` (reference: /root/reference/script/run_feature.py).
Thin shim over dfnet_tpu.cli.feature (also installed as the
`dfnet-feature` console script).
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from dfnet_tpu.cli.feature import (  # noqa: F401
    dump_args,
    main,
    render_features,
    train,
)

if __name__ == "__main__":
    main()
