"""GainPredictor: the TPU-native equivalent of the reference's TransformerILQR.

Owns the flax module + params + normalizer and provides:
- ``predict_fn`` — a pure, jittable closure with the exact inference contract
  of ``TransformerILQR.predict`` (transformer_ilqr.py:311-325): normalize the
  state-error trajectory and gain tokens, take the last ``prompt_len`` prompt
  rows, run the model, de-normalize the output. Designed to be inlined into
  ``hybrid_ilqr_solve`` so the transformer runs inside the jitted solver.
- self-describing npz checkpoints (save/load reconstruct everything from one
  file, like the reference's tf_model.pt + tf_model_normalizer.npz pair,
  transformer_ilqr.py:213-304).

Quantization: the reference half-casts to fp16 / dynamic-int8
(transformer_ilqr.py:223-226). On TPU the native fast path is bfloat16 on the
MXU; ``param_dtype`` selects it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from quattro_tpu.models.normalizer import DataNormalizer
from quattro_tpu.models.transformer import TransformerPredictor

_HPARAM_KEYS = (
    "state_dim",
    "control_dim",
    "d_model",
    "nhead",
    "num_decoder_layers",
    "dim_feedforward",
    "dropout",
    "max_seq_len",
    "target_len",
    "prompt_len",
)


def _flatten_params(params, prefix=""):
    flat = {}
    for key, value in params.items():
        path = f"{prefix}{key}" if not prefix else f"{prefix}/{key}"
        if isinstance(value, dict):
            flat.update(_flatten_params(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def _unflatten_params(flat):
    params = {}
    for path, value in flat.items():
        node = params
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return params


@dataclasses.dataclass
class GainPredictor:
    """Trained gain-sequence predictor bound to its params and normalizer.

    ``state_stride``: subsample the state-error context by this stride before
    embedding (token ``0, s, 2s, ...``). The reference always feeds all H+1
    state rows (quattro_ilqr_tf.py:504), which is fine at H<=50 but makes the
    forward latency-bound at long horizons — at H=256 a stride-4 context cuts
    the transformer's token count ~2x with no measurable loss-quality change
    (the state trajectory is smooth at dt=0.01). Stride 1 == reference
    semantics; the value is baked into the checkpoint.
    """

    module: TransformerPredictor
    params: dict
    normalizer: DataNormalizer
    state_stride: int = 1

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def create(
        state_dim: int,
        control_dim: int,
        prompt_len: int,
        target_len: int,
        d_model: int = 64,
        nhead: int = 8,
        num_decoder_layers: int = 3,
        dim_feedforward: int = 128,
        dropout: float = 0.1,
        max_seq_len: int = 100,
        seq_len_states: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        normalizer: Optional[DataNormalizer] = None,
        state_stride: int = 1,
    ) -> "GainPredictor":
        """Fresh random-init predictor (defaults: transformer_ilqr.py:36-38)."""
        module = TransformerPredictor(
            state_dim=state_dim,
            control_dim=control_dim,
            d_model=d_model,
            nhead=nhead,
            num_decoder_layers=num_decoder_layers,
            dim_feedforward=dim_feedforward,
            dropout=dropout,
            max_seq_len=max_seq_len,
            target_len=target_len,
            prompt_len=prompt_len,
        )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        t_states = seq_len_states if seq_len_states is not None else target_len + prompt_len + 1
        t_states = -(-t_states // state_stride)  # context length after striding
        dummy_x = jnp.zeros((1, t_states, state_dim))
        dummy_prompt = jnp.zeros((1, prompt_len, control_dim))
        params = module.init(rng, dummy_x, dummy_prompt)["params"]
        if normalizer is None:
            normalizer = DataNormalizer.identity(state_dim, control_dim)
        return GainPredictor(module, params, normalizer, state_stride=state_stride)

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------
    @property
    def prompt_len(self) -> int:
        return self.module.prompt_len

    @property
    def target_len(self) -> int:
        return self.module.target_len

    def predict_fn(
        self, compute_dtype: Optional[jnp.dtype] = None
    ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        """Pure closure ``(x_err_seq (T, n), kK_seq (>=P, c)) -> (target_len, c)``.

        Jit-safe: params and normalizer are captured as constants/pytree leaves.
        Matches transformer_ilqr.py:311-325 (prompt = last prompt_len rows).

        ``compute_dtype=jnp.bfloat16`` runs the transformer body in bf16 —
        the MXU-native analog of the reference's fp16 half-cast
        (transformer_ilqr.py:223-226) — with inputs/outputs still float32
        (normalization and de-normalization stay full precision).
        """
        module, norm = self.module, self.normalizer
        if compute_dtype is not None:
            params = jax.tree.map(lambda p: p.astype(compute_dtype), self.params)
        else:
            params = self.params

        stride = self.state_stride

        def predict(x_err_seq: jnp.ndarray, kk_seq: jnp.ndarray) -> jnp.ndarray:
            x_norm = norm.transform_x(x_err_seq[::stride])[None]  # (1, ceil(T/s), n)
            prompt = norm.transform_u(kk_seq)[-module.prompt_len :][None]  # (1, P, c)
            if compute_dtype is not None:
                x_norm = x_norm.astype(compute_dtype)
                prompt = prompt.astype(compute_dtype)
            pred = module.apply({"params": params}, x_norm, prompt, deterministic=True)
            return norm.inverse_transform_u(pred[0].astype(jnp.float32))

        return predict

    def predict(self, x_seq: np.ndarray, kk_seq: np.ndarray) -> np.ndarray:
        """Host-convenience mirror of ``TransformerILQR.predict``."""
        return np.asarray(self.predict_fn()(jnp.asarray(x_seq), jnp.asarray(kk_seq)))

    # ------------------------------------------------------------------
    # Checkpoint IO (self-describing single npz)
    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Write one npz holding hyperparams + normalizer + all weights.

        Keeps the reference's self-describing-checkpoint property
        (transformer_ilqr.py:231-253): ``load`` reconstructs the model from
        the file alone.
        """
        payload = {
            "x_mean": np.asarray(self.normalizer.x_mean),
            "x_std": np.asarray(self.normalizer.x_std),
            "u_mean": np.asarray(self.normalizer.u_mean),
            "u_std": np.asarray(self.normalizer.u_std),
        }
        for key in _HPARAM_KEYS:
            payload[f"hp_{key}"] = np.asarray(getattr(self.module, key))
        payload["hp_state_stride"] = np.asarray(self.state_stride)
        for key, value in _flatten_params(self.params).items():
            payload[f"param/{key}"] = value
        np.savez(path, **payload)

    @staticmethod
    def load(path: str) -> "GainPredictor":
        data = np.load(path, allow_pickle=False)
        hparams = {}
        for key in _HPARAM_KEYS:
            raw = data[f"hp_{key}"].item()
            hparams[key] = float(raw) if key == "dropout" else int(raw)
        module = TransformerPredictor(**hparams)
        flat = {
            key[len("param/") :]: data[key] for key in data.files if key.startswith("param/")
        }
        params = _unflatten_params(flat)
        normalizer = DataNormalizer(
            x_mean=jnp.asarray(data["x_mean"]),
            x_std=jnp.asarray(data["x_std"]),
            u_mean=jnp.asarray(data["u_mean"]),
            u_std=jnp.asarray(data["u_std"]),
        )
        # Default 1 keeps checkpoints from before the stride field loadable.
        stride = int(data["hp_state_stride"].item()) if "hp_state_stride" in data.files else 1
        return GainPredictor(module, params, normalizer, state_stride=stride)

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
