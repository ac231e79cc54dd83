#!/usr/bin/env python
"""Stage 1 CLI — train/evaluate the Histogram-assisted NeRF.

Drop-in surface for the reference's `python run_nerf.py --config
config_nerfh.txt` (reference: /root/reference/script/run_nerf.py), with
the same config files. Thin shim over dfnet_tpu.cli.nerf (also installed
as the `dfnet-nerf` console script) so a source checkout keeps the
reference's invocation.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from dfnet_tpu.cli.nerf import dump_args, main, train  # noqa: F401

if __name__ == "__main__":
    main()
