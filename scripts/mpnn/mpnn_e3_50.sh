#!/bin/bash
# MPNN 1D baseline on E3 (reference scripts/mpnn_* family)
exec "$(dirname "$0")/../run_experiment.sh" mpnn_e3_50 \
  model=mpnn datamodule=h5_datamodule_graph \
  trainer.max_epochs=250
