#!/bin/bash
# reference: scripts/magnet_gnn/magnet_gnn_2d_b1_64_irregular_concentrated.sh
exec "$(dirname "$0")/../run_experiment.sh" magnet_gnn_2d_b1_64_irregular_concentrated \
  model=magnet_gnn \
  datamodule=h5_datamodule_implicit_gnn_2d \
  datamodule.train_path=data/B1/concentrated/burgers_train_irregular_B1_64.h5 \
  datamodule.val_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.test_path=data/B1/burgers_test_B1_32.h5 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=32 \
  datamodule.nt_test=50 datamodule.res_test=32 \
  datamodule.batch_size=32 datamodule.samples=32 \
  model.params.time_slice=10 \
  trainer.max_epochs=250
