#!/bin/bash
# MAgNet[CNN] 1D on KS 256 (reference datamodule/h5_datamodule_implicit.yaml)
exec "$(dirname "$0")/../run_experiment.sh" magnet_cnn_ks_256 \
  model=magnet_cnn datamodule=h5_datamodule_implicit \
  trainer.max_epochs=250
