"""Learned gain prediction: decoder-only transformer + normalizer + IO.

TPU-native replacement for the reference's PyTorch stack
(quattro_ilqr_tf/transformer_model.py, transformer_ilqr.py): flax modules,
bf16-capable MXU matmuls, optax training, self-describing npz checkpoints, and
a weight-port path from the reference's shipped ``.pt`` checkpoints.
"""

from quattro_tpu.models.normalizer import DataNormalizer
from quattro_tpu.models.transformer import TransformerPredictor, sinusoidal_positional_encoding
from quattro_tpu.models.gain_predictor import GainPredictor

__all__ = [
    "DataNormalizer",
    "TransformerPredictor",
    "sinusoidal_positional_encoding",
    "GainPredictor",
]
