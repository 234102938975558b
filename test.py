#!/usr/bin/env python
"""Testing CLI: `python test.py -opt options/<cfg>.yml`
(reference `basicsr/test.py`, with its build_dataset NameError fixed)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wavemamba_tpu.pipelines.test import test_pipeline

if __name__ == "__main__":
    test_pipeline(os.path.dirname(os.path.abspath(__file__)))
