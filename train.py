#!/usr/bin/env python
"""Stage 3 CLI — DFNet_dm direct-feature-matching fine-tuning / eval.

Drop-in surface for the reference's `python train.py --config
config_dfnetdm.txt` (reference: /root/reference/script/train.py). Thin
shim over dfnet_tpu.cli.dm (also installed as the `dfnet-dm` console
script).
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from dfnet_tpu.cli.dm import N_EPOCH, evaluate, main, train  # noqa: F401

if __name__ == "__main__":
    main()
