#!/bin/bash
# reference: scripts/magnet_gnn/magnet_gnn_2d_b2_64_regular.sh
exec "$(dirname "$0")/../run_experiment.sh" magnet_gnn_2d_b2_64_regular \
  model=magnet_gnn \
  datamodule=h5_datamodule_implicit_gnn_2d \
  datamodule.train_path=data/B2/burgers_train_B2_64.h5 \
  datamodule.val_path=data/B2/burgers_test_B2_64.h5 \
  datamodule.test_path=data/B2/burgers_test_B2_64.h5 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  datamodule.batch_size=8 datamodule.samples=256 \
  datamodule.train_regular=true \
  model.params.time_slice=10 \
  trainer.max_epochs=250 trainer.devices=2
