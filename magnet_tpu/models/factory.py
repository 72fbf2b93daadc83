"""Model registry (reference models/factory.py:10-19 — same 8 names)."""
from __future__ import annotations

from magnet_tpu.models.fno import FNO1D, FNO2D
from magnet_tpu.models.magnet_cnn_1d import MAgNetCNN1D
from magnet_tpu.models.magnet_cnn_2d import MAgNetCNN2D
from magnet_tpu.models.magnet_cnn_no_interaction import MAgNetCNNNoInteraction
from magnet_tpu.models.magnet_gnn import MAgNetGNN
from magnet_tpu.models.mpnn import MPNN, MPNN2D

FACTORY = {
    "fno_1d": FNO1D,
    "fno_2d": FNO2D,
    "mpnn": MPNN,
    "mpnn_2d": MPNN2D,
    "magnet_cnn_no_interaction": MAgNetCNNNoInteraction,
    "magnet_cnn": MAgNetCNN1D,
    "magnet_cnn_2d": MAgNetCNN2D,
    "magnet_gnn": MAgNetGNN,
}


def create_model(name: str, hparams: dict):
    return FACTORY[name](hparams)
