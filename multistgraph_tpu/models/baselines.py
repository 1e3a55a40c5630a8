"""Baseline forecasting models: RNN/LSTM/GRU, FNN, Seq2Seq.

The reference's task registry allows these names (task_config.json:95-164) and
its paper uses them as the comparison set, but the trimmed repo ships no code
for them — these are clean-room TPU-native implementations sharing the
framework's model API: input (B, Tin, N, F) -> output (B, Tout, N, output_dim),
time recurrence as lax.scan, parameters shared across nodes (each node is a
batch element of the recurrent core, the standard LibCity baseline setup).

Registered with TrafficStatePointDataset (plain sliding windows, use_3tu=False).
"""

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from multistgraph_tpu.models.initializers import dense_kernel_init


def _dense_params(module, name, dim_in, dim_out):
    kernel = module.param(
        "{}_kernel".format(name), lambda k, s=(dim_in, dim_out): dense_kernel_init(k, s)
    )
    bias = module.param(
        "{}_bias".format(name),
        lambda k, s=(dim_out,): jax.random.uniform(k, s, minval=-0.05, maxval=0.05),
    )
    return kernel, bias


class _BaselineMixin:
    @property
    def start_dim(self) -> int:
        return 0

    @property
    def end_dim(self) -> int:
        return self.output_dim


class RNNModel(nn.Module, _BaselineMixin):
    """Stacked RNN/GRU/LSTM over time, nodes folded into the batch."""

    output_window: int
    output_dim: int
    hidden_dim: int = 64
    num_layers: int = 1
    rnn_type: str = "GRU"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        h = self.hidden_dim
        seq = jnp.transpose(x, (1, 0, 2, 3)).reshape(t, b * n, f)
        kind = self.rnn_type.upper()

        for layer in range(self.num_layers):
            dim_in = seq.shape[-1]
            if kind == "LSTM":
                wk = self.param("l{}_kernel".format(layer),
                                lambda k, s=(dim_in + h, 4 * h): dense_kernel_init(k, s))
                wb = self.param("l{}_bias".format(layer),
                                lambda k, s=(4 * h,): jnp.zeros(s))

                def step(carry, x_t, wk=wk, wb=wb):
                    hidden, cell = carry
                    gates = jnp.concatenate([x_t, hidden], axis=-1) @ wk + wb
                    i, f_, g, o = jnp.split(gates, 4, axis=-1)
                    cell = jax.nn.sigmoid(f_ + 1.0) * cell + jax.nn.sigmoid(i) * jnp.tanh(g)
                    hidden = jax.nn.sigmoid(o) * jnp.tanh(cell)
                    return (hidden, cell), hidden

                init = (jnp.zeros((seq.shape[1], h)), jnp.zeros((seq.shape[1], h)))
            elif kind == "GRU":
                wk = self.param("l{}_kernel".format(layer),
                                lambda k, s=(dim_in + h, 3 * h): dense_kernel_init(k, s))
                wb = self.param("l{}_bias".format(layer),
                                lambda k, s=(3 * h,): jnp.zeros(s))

                def step(hidden, x_t, wk=wk, wb=wb):
                    zr_h = jnp.concatenate([x_t, hidden], axis=-1) @ wk[:, : 2 * h] + wb[: 2 * h]
                    z, r = jnp.split(jax.nn.sigmoid(zr_h), 2, axis=-1)
                    cand = jnp.concatenate([x_t, r * hidden], axis=-1) @ wk[:, 2 * h :] + wb[2 * h :]
                    hidden = (1 - z) * hidden + z * jnp.tanh(cand)
                    return hidden, hidden

                init = jnp.zeros((seq.shape[1], h))
            else:  # plain RNN
                wk = self.param("l{}_kernel".format(layer),
                                lambda k, s=(dim_in + h, h): dense_kernel_init(k, s))
                wb = self.param("l{}_bias".format(layer), lambda k, s=(h,): jnp.zeros(s))

                def step(hidden, x_t, wk=wk, wb=wb):
                    hidden = jnp.tanh(jnp.concatenate([x_t, hidden], axis=-1) @ wk + wb)
                    return hidden, hidden

                init = jnp.zeros((seq.shape[1], h))
            _, seq = jax.lax.scan(step, init, seq)

        last = seq[-1]  # (B*N, H)
        wk, wb = _dense_params(self, "head", h, self.output_window * self.output_dim)
        out = last @ wk + wb
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


class FNN(nn.Module, _BaselineMixin):
    """Per-node MLP over the flattened input window."""

    output_window: int
    output_dim: int
    hidden_dim: int = 64
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        flat = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, t * f)
        h = flat
        dim_in = t * f
        for layer in range(self.num_layers):
            wk, wb = _dense_params(self, "l{}".format(layer), dim_in, self.hidden_dim)
            h = jax.nn.relu(h @ wk + wb)
            dim_in = self.hidden_dim
        wk, wb = _dense_params(self, "head", dim_in, self.output_window * self.output_dim)
        out = h @ wk + wb
        return out.reshape(b, n, self.output_window, self.output_dim).transpose(0, 2, 1, 3)


class Seq2Seq(nn.Module, _BaselineMixin):
    """GRU encoder-decoder; the decoder rolls out Tout steps autoregressively."""

    output_window: int
    output_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, n, f = x.shape
        h = self.hidden_dim
        seq = jnp.transpose(x, (1, 0, 2, 3)).reshape(t, b * n, f)

        def make_gru(name, dim_in):
            wk = self.param("{}_kernel".format(name),
                            lambda k, s=(dim_in + h, 3 * h): dense_kernel_init(k, s))
            wb = self.param("{}_bias".format(name), lambda k, s=(3 * h,): jnp.zeros(s))

            def step(hidden, x_t):
                zr_h = jnp.concatenate([x_t, hidden], axis=-1) @ wk[:, : 2 * h] + wb[: 2 * h]
                z, r = jnp.split(jax.nn.sigmoid(zr_h), 2, axis=-1)
                cand = jnp.concatenate([x_t, r * hidden], axis=-1) @ wk[:, 2 * h :] + wb[2 * h :]
                return (1 - z) * hidden + z * jnp.tanh(cand)

            return step

        enc = make_gru("encoder", f)
        hidden = jnp.zeros((b * n, h))
        hidden, _ = jax.lax.scan(lambda c, xt: (enc(c, xt), None), hidden, seq)

        dec = make_gru("decoder", self.output_dim)
        wk, wb = _dense_params(self, "proj", h, self.output_dim)
        y0 = seq[-1][:, : self.output_dim]

        def rollout(carry, _):
            hidden, y_prev = carry
            hidden = dec(hidden, y_prev)
            y = hidden @ wk + wb
            return (hidden, y), y

        _, ys = jax.lax.scan(rollout, (hidden, y0), None, length=self.output_window)
        return ys.reshape(self.output_window, b, n, self.output_dim).transpose(1, 0, 2, 3)


def _build(cls, extra: Dict[str, Any] = None):
    def builder(config, data_feature):
        kwargs = dict(
            output_window=config.get("output_window", 1),
            output_dim=data_feature.get("output_dim", 1),
            hidden_dim=config.get("rnn_units", 64),
        )
        if extra:
            for key, cfg_key in extra.items():
                kwargs[key] = config.get(cfg_key[0], cfg_key[1])
        return cls(**kwargs)

    return builder


build_rnn = _build(RNNModel, {"num_layers": ("num_layers", 1), "rnn_type": ("rnn_type", "GRU")})
build_fnn = _build(FNN, {"num_layers": ("num_layers", 2)})
build_seq2seq = _build(Seq2Seq)
