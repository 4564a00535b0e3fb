#!/bin/sh
# Download the i3DB RGB dataset (~4.5 GB; reference data/get_i3db.sh).
# Consumed by humor_tpu.data.imapper (iMapper-RGB fitting + eval).
set -e
wget http://download.cs.stanford.edu/orion/humor/iMapper.zip
unzip iMapper.zip
