#!/bin/sh
# Download the released HuMoR checkpoints (~215 MB: HuMoR, HuMoR-Qual,
# initial-state GMM; reference get_ckpt.sh). The .pth files load
# directly through humor_tpu.utils.import_torch (name-mapped into the
# JAX params pytrees — see tests/test_model_parity.py for the
# activation-parity evidence).
set -e
wget http://download.cs.stanford.edu/orion/humor/checkpoints.zip
unzip checkpoints.zip
