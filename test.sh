#!/bin/sh
# Reference parity (the reference's test.sh points at a nonexistent script —
# SURVEY.md §2.6; this one works): folder inference + metrics.
# Usage: ./test.sh <low_dir> <gt_dir> <weights> <out_dir>
python inference.py -i "$1" -g "$2" -w "$3" -o "${4:-results/}"
