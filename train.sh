#!/bin/sh
# Reference parity: train.sh launches the UHD-LL config on the local devices.
python train.py -opt options/train_wavemamba_uhdll.yml --auto_resume "$@"
