#!/bin/bash
# reference: scripts/mpnn_2d/mpnn_2d_b1_128_irregular.sh
exec "$(dirname "$0")/../run_experiment.sh" mpnn_2d_b1_128_irregular \
  model=mpnn_2d \
  datamodule=h5_datamodule_graph_2d \
  datamodule.train_path=data/B1/uniform/burgers_train_irregular_B1_128.h5 \
  datamodule.val_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.test_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.nt_train=50 datamodule.res_train=128 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.train_regular=false \
  model.params.time_window=10 model.params.neighbors=4 \
  model.params.teacher_forcing=false \
  trainer.max_epochs=250
