#!/usr/bin/env python
"""Training CLI: `python train.py -opt options/train_wavemamba_uhdll.yml
[--auto_resume] [--debug] [--force_yml a:b=c]` (reference `basicsr/train.py`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wavemamba_tpu.pipelines.train import train_pipeline

if __name__ == "__main__":
    train_pipeline(os.path.dirname(os.path.abspath(__file__)))
