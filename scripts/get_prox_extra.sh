#!/bin/sh
# Download the extra PROX annotations (~87 MB: OpenPose keypoints,
# PlaneRCNN floors; reference data/get_prox_extra.sh). Consumed by
# humor_tpu.data.prox next to the qualitative PROX release.
set -e
wget http://download.cs.stanford.edu/orion/humor/prox.zip
unzip prox.zip
