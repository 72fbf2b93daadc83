#!/bin/bash
# reference: scripts/mpnn_2d/* family
exec "$(dirname "$0")/../run_experiment.sh" mpnn_2d_b1_64_regular \
  model=mpnn_2d \
  datamodule=h5_datamodule_graph_2d \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  datamodule.batch_size=4 \
  trainer.max_epochs=250
