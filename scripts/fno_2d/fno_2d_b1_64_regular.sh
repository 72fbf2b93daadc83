#!/bin/bash
# reference: scripts/fno_2d/fno_2d_b1_64_regular.sh
exec "$(dirname "$0")/../run_experiment.sh" fno_2d_b1_64_regular \
  model=fno_2d \
  datamodule=h5_datamodule_2d \
  datamodule.train_path=data/B1/burgers_train_B1_64.h5 \
  datamodule.val_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.test_path=data/B1/burgers_test_B1_64.h5 \
  datamodule.nt_train=50 datamodule.res_train=64 \
  datamodule.nt_val=50 datamodule.res_val=64 \
  datamodule.nt_test=50 datamodule.res_test=64 \
  model.params.time_history=10 model.params.time_future=10 \
  model.params.teacher_forcing=false \
  model.params.modes_1=12 model.params.modes_2=12 \
  trainer.max_epochs=250
