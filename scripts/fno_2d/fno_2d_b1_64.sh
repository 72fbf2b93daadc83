#!/bin/bash
exec "$(dirname "$0")/../run_experiment.sh" fno_2d_b1_64 \
  model=fno_2d \
  datamodule=h5_datamodule_2d \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  trainer.max_epochs=250
