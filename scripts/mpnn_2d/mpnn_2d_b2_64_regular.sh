#!/bin/bash
# reference: scripts/mpnn_2d/mpnn_2d_b2_64_regular.sh
exec "$(dirname "$0")/../run_experiment.sh" mpnn_2d_b2_64_regular \
  model=mpnn_2d \
  datamodule=h5_datamodule_graph_2d \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=data/B2/burgers_test_B2_64.h5 \
  datamodule.test_path=data/B2/burgers_test_B2_64.h5 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  datamodule.batch_size=4 \
  model.params.time_window=10 model.params.neighbors=4 \
  model.params.teacher_forcing=false \
  trainer.max_epochs=250 trainer.devices=2
