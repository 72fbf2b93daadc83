#!/bin/bash
# FNO-1D baseline on E3 combined-equation data (reference README.md:108-115)
exec "$(dirname "$0")/../run_experiment.sh" fno_1d_e3_50 \
  model=fno_1d datamodule=h5_datamodule \
  trainer.max_epochs=250
