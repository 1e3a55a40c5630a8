"""Normalization scaler family (ref: libcity/utils/normalization.py:4-127).

Scalers are frozen dataclasses whose transform/inverse_transform work on both
numpy and jnp arrays (pure elementwise arithmetic, safe inside jit).
"""

from dataclasses import dataclass

import numpy as np


class Scaler:
    def transform(self, data):
        raise NotImplementedError

    def inverse_transform(self, data):
        raise NotImplementedError


@dataclass(frozen=True)
class NoneScaler(Scaler):
    def transform(self, data):
        return data

    def inverse_transform(self, data):
        return data


@dataclass(frozen=True)
class NormalScaler(Scaler):
    max: float

    def transform(self, data):
        return data / self.max

    def inverse_transform(self, data):
        return data * self.max


@dataclass(frozen=True)
class StandardScaler(Scaler):
    mean: float
    std: float

    def transform(self, data):
        return (data - self.mean) / self.std

    def inverse_transform(self, data):
        return data * self.std + self.mean


@dataclass(frozen=True)
class MinMax01Scaler(Scaler):
    min: float
    max: float

    def transform(self, data):
        return (data - self.min) / (self.max - self.min)

    def inverse_transform(self, data):
        return data * (self.max - self.min) + self.min


@dataclass(frozen=True)
class MinMax11Scaler(Scaler):
    min: float
    max: float

    def transform(self, data):
        return ((data - self.min) / (self.max - self.min)) * 2.0 - 1.0

    def inverse_transform(self, data):
        return ((data + 1.0) / 2.0) * (self.max - self.min) + self.min


@dataclass(frozen=True)
class LogScaler(Scaler):
    eps: float = 0.999

    def transform(self, data):
        return np.log(data + self.eps) if isinstance(data, np.ndarray) else _jnp().log(data + self.eps)

    def inverse_transform(self, data):
        return np.exp(data) - self.eps if isinstance(data, np.ndarray) else _jnp().exp(data) - self.eps


def _jnp():
    import jax.numpy as jnp

    return jnp


def fit_scaler(scaler_type: str, x_train, y_train) -> Scaler:
    """Fit a scaler on train-split arrays (ref: traffic_state_datatset.py:895-928).

    Statistics follow the reference exactly: NormalScaler uses max over BOTH x
    and y; StandardScaler uses x-only mean/std; MinMax uses min/max over both.
    """
    if scaler_type == "normal":
        return NormalScaler(max=float(max(x_train.max(), y_train.max())))
    if scaler_type == "standard":
        return StandardScaler(mean=float(x_train.mean()), std=float(x_train.std()))
    if scaler_type == "minmax01":
        return MinMax01Scaler(
            min=float(min(x_train.min(), y_train.min())),
            max=float(max(x_train.max(), y_train.max())),
        )
    if scaler_type == "minmax11":
        return MinMax11Scaler(
            min=float(min(x_train.min(), y_train.min())),
            max=float(max(x_train.max(), y_train.max())),
        )
    if scaler_type == "log":
        return LogScaler()
    if scaler_type == "none":
        return NoneScaler()
    raise ValueError("Scaler type error!")
