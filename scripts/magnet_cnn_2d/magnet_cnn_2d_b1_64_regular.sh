#!/bin/bash
# reference: scripts/magnet_cnn_2d/magnet_cnn_2d_b1_64_regular.sh (2-GPU DDP
# there; dp mesh axis here via trainer.devices)
exec "$(dirname "$0")/../run_experiment.sh" magnet_cnn_2d_b1_64_regular \
  model=magnet_cnn_2d \
  datamodule=h5_datamodule_implicit_2d \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  datamodule.samples=64 datamodule.batch_size=16 \
  model.params.time_slice=10 \
  trainer.devices=-1 trainer.max_epochs=250
