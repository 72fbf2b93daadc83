#!/bin/bash
# MAgNet[GNN] 1D on KS 256 irregular-capable path (reference README.md:34-50:
# train 30/50/70-node meshes, zero-shot test 100/200 — point the datamodule
# at those files/resolutions via overrides)
exec "$(dirname "$0")/../run_experiment.sh" magnet_gnn_ks_256 \
  model=magnet_gnn datamodule=h5_datamodule_implicit_gnn \
  trainer.max_epochs=250
