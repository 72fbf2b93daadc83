#!/bin/bash
# Generate the full synthetic dataset suite (reference HDF5 schemas) used by
# the experiment scripts when the original datasets are unavailable.
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
from magnet_tpu.data.synthetic import (
    generate_1d_file, generate_2d_file, generate_ce_suite,
)
import os
os.makedirs('data/B1/uniform', exist_ok=True)
os.makedirs('data/B1/concentrated', exist_ok=True)
os.makedirs('data/B2', exist_ok=True)
# E3 headline file (combined-equation solver, reference's actual family)
generate_1d_file('data/CE_train_E3.h5', n_train=64, n_valid=16, n_test=16, nt=250, nx=50, seed=0, eq='E3')
# KS train/valid + Heat transfer test: the reference's 1D implicit protocol
# (configs/datamodule/h5_datamodule_implicit.yaml: KS nt=128 nx=256 train,
# Heat nt=256 test).  Real Kuramoto-Sivashinsky and heat-equation solvers.
generate_1d_file('data/KS_train.h5', n_train=256, n_valid=32, n_test=32, nt=128, nx=256, seed=1, eq='KS')
generate_1d_file('data/Heat_test.h5', n_train=8, n_valid=16, n_test=16, nt=256, nx=256, seed=21, eq='Heat')
generate_2d_file('data/B1/burgers_train_B1_64.h5', n_train=32, n_valid=8, n_test=8, nt=50, res=64, seed=2)
# 32^2 train split for the CPU-budget 2D reference bisect (VERDICT r3 item 1)
generate_2d_file('data/B1/burgers_train_B1_32.h5', n_train=32, n_valid=8, n_test=8, nt=50, res=32, seed=9)
generate_2d_file('data/B1/burgers_test_B1_32.h5', n_train=8, n_valid=8, n_test=8, nt=50, res=32, seed=3)
generate_2d_file('data/B1/burgers_test_B1_64.h5', n_train=8, n_valid=8, n_test=8, nt=50, res=64, seed=5)
# B2 = second Burgers dataset (different forcing regime -> higher viscosity here)
generate_2d_file('data/B2/burgers_train_B2_64.h5', n_train=32, n_valid=8, n_test=8, nt=50, res=64, seed=6, nu=0.05)
generate_2d_file('data/B2/burgers_test_B2_64.h5', n_train=8, n_valid=8, n_test=8, nt=50, res=64, seed=7, nu=0.05)
# irregular meshes, uniform and concentrated node sampling, all script sizes
for i, n_nodes in enumerate([64, 128, 256, 512]):
    generate_2d_file(f'data/B1/uniform/burgers_train_irregular_B1_{n_nodes}.h5',
                     n_train=32, n_valid=8, n_test=8, nt=50, res=64,
                     seed=4 + 10 * i, irregular=True, n_nodes=n_nodes)
    generate_2d_file(f'data/B1/concentrated/burgers_train_irregular_B1_{n_nodes}.h5',
                     n_train=32, n_valid=8, n_test=8, nt=50, res=64,
                     seed=5 + 10 * i, irregular=True, n_nodes=n_nodes,
                     concentrated=True)
# the reference's full 1D dataset tree (README.md:34-60), regenerated with
# the actual Brandstetter combined-equation solver: E1 regular+irregular
# (train 30/50/70 nodes, zero-shot test at 40/50/100/200), E2/E3 regular
if os.environ.get('GEN_CE_SUITE', '1') != '0':
    generate_ce_suite('data/1d/E1', eq='E1', seed=10,
                      irregular_nodes=(30, 50, 70))
    generate_ce_suite('data/1d/E2', eq='E2', seed=11)
    generate_ce_suite('data/1d/E3', eq='E3', seed=12)

# each generated file holds train/valid/test groups; mirror the
# reference's separate-file layout by copying
import shutil
shutil.copy('data/CE_train_E3.h5', 'data/CE_valid_E3.h5')
shutil.copy('data/CE_train_E3.h5', 'data/CE_test_E3.h5')
shutil.copy('data/KS_train.h5', 'data/KS_valid.h5')
print('synthetic data suite written to data/')
PY
