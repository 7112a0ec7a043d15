"""Training pipeline: on-device data collection and the optax gain-model trainer.

Replaces the reference's offline pipeline (examples/*/training/): the 10-process
MuJoCo sweep becomes vmapped batched MPC rollouts on the mesh, pickle streams
become stacked arrays, and the PyTorch loop becomes optax + jit.
"""

from quattro_tpu.training.collect import (
    collect_gain_dataset,
    CollectStats,
    DeviceGainDataset,
    collect_gain_dataset_host,
    collect_gain_dataset_host_batched,
    GainDataset,
    ShardDataset,
    lhs_initial_states,
    load_gain_dataset,
    perturb_params,
    save_gain_dataset,
)
from quattro_tpu.training.train import TrainConfig, train_gain_predictor

__all__ = [
    "collect_gain_dataset",
    "collect_gain_dataset_host",
    "collect_gain_dataset_host_batched",
    "CollectStats",
    "DeviceGainDataset",
    "GainDataset",
    "ShardDataset",
    "lhs_initial_states",
    "load_gain_dataset",
    "perturb_params",
    "save_gain_dataset",
    "TrainConfig",
    "train_gain_predictor",
]
